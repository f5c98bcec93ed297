"""REST knowledge-service analog (reference
sling/nlp/kb/knowledge-service.cc:383-392 endpoint registry,
:416-1064 item/query/search handlers; round-4 verdict missing #3).

The reference serves its KB from an in-memory frame store behind an
HTTP server with `/kb/query` (name-prefix completion), `/kb/search`
(full-text), `/kb/item` (item JSON with resolved property/value names),
`/kb/frame` (raw frame), `/kb/stubs` (id→name batch) and document
topic views. This module provides the same surface over the ENGINE's
serving layer: every handler delegates to the spark.sql lookups in
:mod:`sling_spark.serving`, so the data under the endpoints is the
materialized pipeline output (kb_items / triples / phrase_table /
name_table / search_index views).

Scale shape: at fixture scale the handlers query Spark directly
(sub-second on local mode). At 10^9-item scale the same endpoints
would front the frame-store sink (kg/materialize.py) loaded into a
keyed store — e.g. the SLINGDB analog (:mod:`sling_spark.db`) bulk-
loaded via ``load_dataframe`` — which is exactly how the reference
splits pipeline (workflow) from serving (knowledge-service + SLINGDB).
The endpoint contract is identical either way, which is what the
parity tests pin.
"""

from __future__ import annotations

import json
from urllib.parse import parse_qs, urlparse

from pyspark.sql import SparkSession
from pyspark.sql import functions as F

from . import serving


class KnowledgeService:
    """Endpoint logic, separable from HTTP plumbing (mirrors the
    reference split: KnowledgeService methods vs HTTPServer)."""

    def __init__(self, spark: SparkSession):
        self.spark = spark

    # -- /kb/query: name-prefix completion (HandleQuery, :661-758) ------

    def query(self, q: str, limit: int = 10) -> dict:
        rows = serving.name_search(self.spark, q, limit=limit).collect()
        return {
            "matches": [
                {"ref": r["entity"], "text": r["name"], "count": r["count"]}
                for r in rows
            ]
        }

    # -- /kb/search: full-text AND search (HandleSearch, :859-961) ------

    def search(self, q: str, limit: int = 10) -> dict:
        rows = serving.term_search(self.spark, q, limit=limit).collect()
        hits = [r["entity"] for r in rows]
        names = self.stubs(hits)["stubs"] if hits else {}
        return {
            "matches": [
                {"ref": e, "text": names.get(e, e)} for e in hits
            ]
        }

    # -- /kb/item: item JSON with resolved names (HandleGetItem, :963+) -

    def item(self, item_id: str) -> dict | None:
        head = serving.get_item(self.spark, item_id).collect()
        if not head:
            return None
        facts = serving.item_facts(self.spark, item_id).collect()
        # resolve property + entity-value display names in ONE batch
        # lookup (the reference resolves handles against the store;
        # :229-260 GetStandardProperties)
        refs = sorted(
            {r["pred"] for r in facts}
            | {r["obj"] for r in facts if r["obj"].startswith(("Q", "P"))}
        )
        names = self._names(refs)
        props: dict[str, dict] = {}
        for r in facts:
            slot = props.setdefault(
                r["pred"],
                {"property": r["pred"],
                 "name": names.get(r["pred"], r["pred"]), "values": []},
            )
            val: dict = {"v": r["obj"]}
            if r["obj"] in names:
                val["text"] = names[r["obj"]]
            if r["qualifiers"]:
                val["qualifiers"] = r["qualifiers"]
            slot["values"].append(val)
        row = head[0].asDict()
        return {
            "ref": item_id,
            "text": row.get("name"),
            "types": list(row.get("types") or []),
            "properties": sorted(props.values(), key=lambda p: p["property"]),
        }

    # -- /kb/frame: raw triples of one subject (HandleGetFrame) ---------

    def frame(self, item_id: str) -> dict:
        facts = serving.item_facts(self.spark, item_id).collect()
        return {
            "ref": item_id,
            "slots": [[r["pred"], r["obj"]] for r in facts],
        }

    # -- /kb/stubs: batch id -> display name (HandleGetStubs) -----------

    def stubs(self, ids: list[str]) -> dict:
        return {"stubs": self._names(ids)}

    def _names(self, ids: list[str]) -> dict[str, str]:
        if not ids:
            return {}
        rows = (
            self.spark.table("kb_items")
            .where(F.col("id").isin(list(ids)))
            .select("id", "name")
            .collect()
        )
        # drop NULL names so callers' names.get(id, id) fallback-to-id
        # actually fires instead of surfacing text: null
        return {r["id"]: r["name"] for r in rows if r["name"] is not None}

    # -- /kb/topic: rendered document view (topic endpoints) ------------

    def topic(self, repo: str, path: str, fmt: str = "lex") -> dict | None:
        rows = serving.render_document(self.spark, repo, path, format=fmt)
        out = rows.collect()
        if not out:
            return None
        r = out[0].asDict()
        return {"repo": repo, "path": path, "format": fmt,
                "content": r.get("lex") or r.get("html")}


def make_kb_service(spark: SparkSession):
    """ThreadingHTTPServer on an ephemeral localhost port serving the
    /kb endpoints as JSON (fmt=json is the only supported format — the
    reference's HTML app shell is browser chrome, not KB semantics)."""
    from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer

    service = KnowledgeService(spark)

    class Handler(BaseHTTPRequestHandler):
        protocol_version = "HTTP/1.1"

        def log_message(self, *a):  # quiet in tests
            pass

        def _json(self, obj, code: int = 200):
            body = json.dumps(obj).encode("utf-8")
            self.send_response(code)
            self.send_header("Content-Type", "application/json")
            self.send_header("Content-Length", str(len(body)))
            self.end_headers()
            self.wfile.write(body)

        def do_GET(self):
            u = urlparse(self.path)
            q = {k: v[0] for k, v in parse_qs(u.query).items()}
            try:
                if u.path == "/kb/query":
                    return self._json(
                        service.query(q.get("q", ""),
                                      int(q.get("limit", "10"))))
                if u.path == "/kb/search":
                    return self._json(
                        service.search(q.get("q", ""),
                                       int(q.get("limit", "10"))))
                if u.path == "/kb/item":
                    out = service.item(q.get("id", ""))
                    if out is None:
                        return self._json({"error": "no such item"}, 404)
                    return self._json(out)
                if u.path == "/kb/frame":
                    return self._json(service.frame(q.get("id", "")))
                if u.path == "/kb/stubs":
                    ids = [x for x in q.get("ids", "").split(",") if x]
                    return self._json(service.stubs(ids))
                if u.path == "/kb/topic":
                    out = service.topic(q.get("repo", ""), q.get("path", ""),
                                        q.get("fmt", "lex"))
                    if out is None:
                        return self._json({"error": "no such document"}, 404)
                    return self._json(out)
                return self._json({"error": "unknown endpoint"}, 404)
            except Exception as e:  # surface handler errors as JSON 500s
                return self._json({"error": str(e)}, 500)

    return ThreadingHTTPServer(("127.0.0.1", 0), Handler)
