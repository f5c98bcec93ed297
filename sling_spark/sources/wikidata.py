"""Wikidata JSON-dump importer (wikidata-converter.cc semantics).

Parses the wikibase JSON item layout — labels / aliases / claims with
mainsnak datavalues, qualifiers, and ranks — into the engine's item
shape (``assets.ITEMS_DDL``: id, name, types, statements) and alias
rows, so a real dump feeds straight into reconcile/merge and the
phrase-table build.

Reference semantics (file:line in /root/reference):
- field walk: sling/nlp/wiki/wikidata-converter.cc:113-310
- rank: 0=deprecated, 1=normal, 2=preferred (:270-275); deprecated
  statements carry their rank so the merger can drop them (our
  merge_items deprecated handling).
- datavalue conversion (:527-552): string, wikibase-entityid, time,
  quantity, monolingualtext, globecoordinate.
- time precision: wikibase 6=millennium 7=century 8=decade 9=year
  10=month 11=day → our date strings incl. the star notation
  (functions/dates.py, calendar.h:82-84).

The Spark wrapper is one mapInPandas over a JSONL dump — dump lines
cross Arrow inbound only, the emitted items/aliases are KB-dimension
sized.
"""

from __future__ import annotations

import json

ITEM_SCHEMA = (
    "id string, name string, types array<string>, statements "
    "array<struct<pid string, object string, qualifiers map<string,string>>>"
)
ALIAS_SCHEMA = "entity string, alias string, lang string, is_label boolean"


def convert_time(value: dict) -> str | None:
    """wikibase time → our date string ('+1958-03-14T00:00:00Z', p=11
    → '1958-03-14'; p=8 → '195*'; p=7 → '19**'; p=6 → '1***')."""
    t = value.get("time")
    if not isinstance(t, str):
        return None
    precision = value.get("precision", 11)
    if not isinstance(precision, int):
        precision = 11
    neg = t.startswith("-")
    t = t.lstrip("+-")
    date, _, _ = t.partition("T")
    parts = date.split("-")
    if len(parts) < 3 or not parts[0].isdigit():
        return None
    year = int(parts[0])
    sign = "-" if neg else ""
    if precision >= 11:
        return f"{sign}{year:04d}-{parts[1]}-{parts[2]}"
    if precision == 10:
        return f"{sign}{year:04d}-{parts[1]}"
    if precision == 9:
        return f"{sign}{year:04d}"
    if precision == 8:
        return f"{sign}{year // 10}*"
    if precision == 7:
        return f"{sign}{year // 100}**"
    if precision == 6:
        return f"{sign}{year // 1000}***"
    return f"{sign}{year:04d}"


def convert_datavalue(datavalue: dict) -> str | None:
    """ConvertValue (wikidata-converter.cc:527-552) → canonical string."""
    dtype = datavalue.get("type")
    value = datavalue.get("value")
    if dtype == "string":
        return value if isinstance(value, str) else None
    if not isinstance(value, dict):
        return None
    if dtype == "wikibase-entityid":
        if "id" in value:
            return value["id"]
        ent = {"item": "Q", "property": "P"}.get(value.get("entity-type"), "Q")
        num = value.get("numeric-id")
        return f"{ent}{num}" if num is not None else None
    if dtype == "time":
        return convert_time(value)
    if dtype == "quantity":
        amount = str(value.get("amount", "")).lstrip("+")
        unit = value.get("unit", "1")
        if isinstance(unit, str) and unit and unit != "1":
            return f"{amount}@{unit.rsplit('/', 1)[-1]}"
        return amount
    if dtype == "monolingualtext":
        text = value.get("text")
        return text if isinstance(text, str) else None
    if dtype == "globecoordinate":
        lat, lon = value.get("latitude"), value.get("longitude")
        return None if lat is None or lon is None else f"{lat},{lon}"
    return None  # unknown datatype: skip (the converter LOG(FATAL)s;
    #              on a dirty dump we drop instead of aborting the job)


def _as_dict(v) -> dict:
    return v if isinstance(v, dict) else {}


def _as_list(v) -> list:
    return v if isinstance(v, list) else []


def parse_item(obj: dict, lang: str = "en",
               with_claims: bool = True) -> tuple[dict, list[dict]] | None:
    """One wikibase JSON item → (item row, alias rows). Total over
    arbitrarily malformed JSON (dirty-dump tolerance): any field of the
    wrong shape is treated as absent, never raised on.

    ``with_claims=False`` skips the claims walk (statements/types stay
    empty) — the alias-only extraction path, where parsing every
    statement of every item would double the dump-import cost for rows
    that only need labels/aliases."""
    if not isinstance(obj, dict):
        return None
    qid = obj.get("id")
    if not qid or not isinstance(qid, str):
        return None
    labels = _as_dict(obj.get("labels"))
    # label fallback: prefer the requested language, else the first
    # well-formed label of ANY language — but then tag the alias row
    # with the label's ACTUAL language, so a foreign-script fallback
    # (the multi-language ingest case) never masquerades as a
    # requested-language alias in the phrase-table priors
    label_lang = lang
    label = labels.get(lang)
    name = label.get("value") if isinstance(label, dict) else None
    if not isinstance(name, str):
        name = None
        for k, v in labels.items():
            cand = v.get("value") if isinstance(v, dict) else None
            if isinstance(cand, str):
                name, label_lang = cand, k
                break

    aliases = [
        {"entity": qid, "alias": name, "lang": label_lang, "is_label": True}
    ] if name else []
    for al in _as_list(_as_dict(obj.get("aliases")).get(lang)):
        v = al.get("value") if isinstance(al, dict) else None
        if isinstance(v, str) and v:
            aliases.append({"entity": qid, "alias": v, "lang": lang, "is_label": False})

    if not with_claims:
        return {"id": qid, "name": name, "types": [], "statements": []}, aliases

    statements = []
    types = []
    for pid, stmts in _as_dict(obj.get("claims")).items():
        for st in _as_list(stmts):
            if not isinstance(st, dict):
                continue
            snak = _as_dict(st.get("mainsnak"))
            datavalue = snak.get("datavalue")
            if not isinstance(datavalue, dict):
                continue  # somevalue / novalue snaks carry no datavalue
            obj_val = convert_datavalue(datavalue)
            if obj_val is None:
                continue
            rank = st.get("rank", "normal")
            quals: dict[str, str] = {}
            for qpid, qstmts in _as_dict(st.get("qualifiers")).items():
                for q in _as_list(qstmts):
                    qv = q.get("datavalue") if isinstance(q, dict) else None
                    if isinstance(qv, dict):
                        qval = convert_datavalue(qv)
                        if qval is not None:
                            quals[qpid] = qval
            if rank == "deprecated":
                quals["rank"] = "deprecated"  # merge_items drops these
            elif rank == "preferred":
                quals["rank"] = "preferred"
            statements.append({"pid": pid, "object": obj_val, "qualifiers": quals})
            # a deprecated-rank P31 must not type the item: the
            # statement itself is dropped at merge (merge_items), and a
            # page typed only by a deprecated "disambiguation" claim
            # would otherwise be misclassified out of wikipedia_mapping
            if pid == "P31" and rank != "deprecated":
                types.append(obj_val)
    item = {"id": qid, "name": name, "types": types, "statements": statements}
    return item, aliases


def wikidata_items(dump, lang: str = "en", json_col: str = "value"):
    """JSONL dump DataFrame → (items DF in ITEMS_DDL shape, alias rows
    DF). Malformed lines are dropped (dirty-dump tolerance), counted
    implicitly by items vs input rows.

    Each returned DataFrame scans the dump lazily in its own Arrow
    pass, but the alias pass runs parse_item WITHOUT the claims walk
    (with_claims=False) — claims dominate item JSON, so the alias leg
    costs a small fraction of the item leg rather than doubling the
    import. Callers materializing both at real dump scale should write
    (or persist) the dump DataFrame once upstream, as the pipeline's
    staged ingest does."""
    import pandas as pd

    def parse(batches):
        for pdf in batches:
            rows = []
            for line in pdf[json_col]:
                try:
                    obj = json.loads(line)
                except (TypeError, ValueError):
                    continue
                parsed = parse_item(obj, lang)
                if parsed:
                    rows.append(parsed[0])
            yield pd.DataFrame(
                rows, columns=["id", "name", "types", "statements"]
            )

    def parse_aliases(batches):
        for pdf in batches:
            rows = []
            for line in pdf[json_col]:
                try:
                    obj = json.loads(line)
                except (TypeError, ValueError):
                    continue
                parsed = parse_item(obj, lang, with_claims=False)
                if parsed:
                    rows.extend(parsed[1])
            yield pd.DataFrame(
                rows, columns=["entity", "alias", "lang", "is_label"]
            )

    items = dump.select(json_col).mapInPandas(parse, schema=ITEM_SCHEMA)
    alias_rows = dump.select(json_col).mapInPandas(parse_aliases, schema=ALIAS_SCHEMA)
    return items, alias_rows


# ---------------------------------------------------------------------------
# wikipedia-mapping + multi-language (wikidata-importer.cc:237-365, :495-517)
# ---------------------------------------------------------------------------

SITELINK_SCHEMA = "qid string, lang string, title string"

#: Wikimedia page-type QIDs (WikimediaTypes, reference sling/nlp/wiki/
#: wiki.cc): P31 values that classify a linked page's kind.
WIKIMEDIA_CATEGORY = {"Q4167836"}
WIKIMEDIA_DISAMBIGUATION = {"Q4167410", "Q22808320"}
WIKIMEDIA_LIST = {"Q13406463"}
WIKIMEDIA_TEMPLATE = {"Q11266439"}
WIKIMEDIA_INFOBOX = {"Q19887878"}


#: Wikimedia site ids that END in 'wiki' but are NOT a language
#: Wikipedia — 'commonswiki' is Commons, not a 'commons' language.
#: Without this exclusion their gallery/category/meta pages would
#: enter the sitelink table as pseudo-language Wikipedia articles.
_NON_LANGUAGE_WIKIS = frozenset({
    "commonswiki", "specieswiki", "metawiki", "wikidatawiki",
    "mediawikiwiki", "sourceswiki", "incubatorwiki", "outreachwiki",
    "wikimaniawiki", "foundationwiki", "nostalgiawiki", "testwiki",
    "test2wiki", "testwikidatawiki", "wikifunctionswiki", "votewiki",
    "strategywiki", "fdcwiki",
})


def parse_sitelinks(obj: dict) -> list[dict]:
    """Wikibase ``sitelinks`` → (qid, lang, title) rows; only the
    ``{lang}wiki`` sites (Wikipedia proper) map, matching Wiki::Id —
    non-language '*wiki' site ids (Commons, Meta, Wikidata itself, ...)
    are excluded."""
    if not isinstance(obj, dict):
        return []
    qid = obj.get("id")
    if not isinstance(qid, str) or not qid:
        return []
    out = []
    for site, link in _as_dict(obj.get("sitelinks")).items():
        if (not isinstance(site, str) or not site.endswith("wiki")
                or site in _NON_LANGUAGE_WIKIS):
            continue
        lang = site[: -len("wiki")]
        title = link.get("title") if isinstance(link, dict) else None
        if lang and isinstance(title, str) and title:
            out.append({"qid": qid, "lang": lang, "title": title})
    return out


def wikidata_sitelinks(dump, json_col: str = "value"):
    """JSONL dump → sitelink rows (one Arrow pass)."""
    import pandas as pd

    def parse(batches):
        for pdf in batches:
            rows = []
            for line in pdf[json_col]:
                try:
                    obj = json.loads(line)
                except (TypeError, ValueError):
                    continue
                rows.extend(parse_sitelinks(obj))
            yield pd.DataFrame(rows, columns=["qid", "lang", "title"])

    return dump.select(json_col).mapInPandas(parse, schema=SITELINK_SCHEMA)


def wiki_title_norm(col):
    """MediaWiki title normalization (the Wiki::Id rule, reference
    sling/nlp/wiki/wiki.cc): strip a ``#section`` anchor, fold
    underscores to spaces, collapse whitespace, and uppercase the first
    letter — applied identically to link targets AND sitelink titles so
    lowercase-first or anchored links still join (ADVICE r02). Pure
    Catalyst column expression."""
    from pyspark.sql import functions as F

    t = F.regexp_replace(col, "#.*$", "")
    t = F.regexp_replace(t, "_", " ")
    t = F.trim(F.regexp_replace(t, r"\s+", " "))
    return F.concat(F.upper(t.substr(F.lit(1), F.lit(1))), t.substr(F.lit(2), F.length(t)))


def wikipedia_mapping(items, sitelinks, lang: str = "en"):
    """pageid/title → QID dimension (WikipediaMapping, reference
    wikidata-importer.cc:237-365): for every item with a ``{lang}wiki``
    sitelink, emit (wiki_id "/wp/{lang}/{title}", qid, kind) where kind
    classifies the page by its P31 types against the Wikimedia
    page-type items — precedence list > category > disambiguation >
    infobox > template > article (:308-330). Pure Catalyst: one
    broadcast-sized join + a when-chain."""
    from pyspark.sql import functions as F

    links = sitelinks.filter(F.col("lang") == lang)
    joined = links.join(items.select(F.col("id").alias("qid"), "types"), on="qid")

    def overlap(type_set):
        return F.arrays_overlap(
            F.coalesce(F.col("types"), F.array()),
            F.array(*[F.lit(t) for t in sorted(type_set)]),
        )

    kind = (
        F.when(overlap(WIKIMEDIA_LIST), F.lit("list"))
        .when(overlap(WIKIMEDIA_CATEGORY), F.lit("category"))
        .when(overlap(WIKIMEDIA_DISAMBIGUATION), F.lit("disambiguation"))
        .when(overlap(WIKIMEDIA_INFOBOX), F.lit("infobox"))
        .when(overlap(WIKIMEDIA_TEMPLATE), F.lit("template"))
        .otherwise(F.lit("article"))
    )
    return joined.select(
        F.concat(F.lit(f"/wp/{lang}/"), wiki_title_norm(F.col("title"))).alias("wiki_id"),
        "qid",
        kind.alias("kind"),
    )


def is_multi_language(obj: dict, lang: str = "en") -> bool:
    """WikidataMultiLanguage predicate (wikidata-importer.cc:495-517):
    the item carries a name in SOME language but none in ``lang``."""
    labels = _as_dict(obj.get("labels")) if isinstance(obj, dict) else {}
    has_primary = isinstance(labels.get(lang), dict)
    has_other = any(
        isinstance(v, dict) and k != lang for k, v in labels.items()
    )
    return has_other and not has_primary


def multi_language_items(dump, lang: str = "en", json_col: str = "value"):
    """Filter the dump to multi-language items (non-``lang`` names only)
    and parse them with the label-language fallback parse_item already
    applies — the multi-language slot-filter stage."""
    import pandas as pd

    def parse(batches):
        for pdf in batches:
            rows = []
            for line in pdf[json_col]:
                try:
                    obj = json.loads(line)
                except (TypeError, ValueError):
                    continue
                if not is_multi_language(obj, lang):
                    continue
                parsed = parse_item(obj, lang)
                if parsed:
                    rows.append(parsed[0])
            yield pd.DataFrame(rows, columns=["id", "name", "types", "statements"])

    return dump.select(json_col).mapInPandas(parse, schema=ITEM_SCHEMA)


def engine_alias_rows(alias_rows, default_count: int = 1):
    """Adapt importer alias rows (entity, alias, lang, is_label) to the
    engine's alias table shape (entity, alias, fp, count, form,
    sources): phrase fingerprint/form computed under the engine
    tokenizer (the phrase-table lookup invariant), labels as NAME
    source, aliases as ALIAS source. Counts default to 1 — corpus-
    derived anchor counts (anchor_aliases / wikipedia_alias_rows)
    sharpen the prior exactly as the reference's anchor counts do."""
    import pandas as pd

    def conv(batches):
        from ..functions.tokenize import phrase_fingerprint, phrase_form
        from ..sources.kb import SRC_ALIAS, SRC_NAME

        for pdf in batches:
            rows = []
            for entity, alias, is_label in zip(
                pdf["entity"], pdf["alias"], pdf["is_label"]
            ):
                rows.append(
                    {
                        "entity": entity,
                        "alias": alias,
                        "fp": phrase_fingerprint(alias),
                        "count": default_count,
                        "form": phrase_form(alias),
                        "sources": SRC_NAME if is_label else SRC_ALIAS,
                    }
                )
            yield pd.DataFrame(
                rows,
                columns=["entity", "alias", "fp", "count", "form", "sources"],
            )

    return alias_rows.select("entity", "alias", "is_label").mapInPandas(
        conv,
        schema="entity string, alias string, fp long, count int, form int, sources int",
    )
