"""spark-submit entrypoint for incremental KB delta maintenance (the
wikidaily analog — kg/delta.py).

Takes a prior build's output directory (as written by
tools/submit_pipeline.py: sources/, clusters/, kb_items/) plus a delta
batch parquet with the source-item schema + (source_priority int,
deleted boolean), and writes the maintained state to --output:
sources/ (upserted), kb_items/ (== a full rebuild, parity-tested),
touched/ (the canonical ids that were re-reconciled) and
kb_triples/ — in time proportional to the DELTA, not the KB.

    spark-submit --py-files sling_spark.zip tools/apply_delta.py \
        --base s3://bucket/kb/ --delta s3://bucket/delta.parquet \
        --output s3://bucket/kb_v2/ [--verify-full-rebuild]

``--verify-full-rebuild`` additionally runs the from-scratch rebuild
over the upserted sources and fails loudly on any divergence — the
audit mode for promoting a maintained KB.
"""

from __future__ import annotations

import argparse
import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--base", required=True,
                    help="prior output dir (sources/, clusters/, kb_items/)")
    ap.add_argument("--delta", required=True,
                    help="delta parquet: items schema + source_priority, deleted")
    ap.add_argument("--output", required=True)
    ap.add_argument("--master", default=None)
    ap.add_argument("--verify-full-rebuild", action="store_true")
    args = ap.parse_args()

    from sling_spark.kg.delta import apply_kb_delta, delta_triples, full_rebuild
    from sling_spark.session import get_spark

    spark = get_spark(master=args.master, app_name="sling_spark_apply_delta")
    t0 = time.time()

    sources = spark.read.parquet(f"{args.base}/sources")
    clusters = spark.read.parquet(f"{args.base}/clusters")
    kb_items = spark.read.parquet(f"{args.base}/kb_items")
    delta = spark.read.parquet(args.delta)

    res = apply_kb_delta(spark, sources, delta, clusters, kb_items)
    res["sources"].write.mode("overwrite").parquet(f"{args.output}/sources")
    res["kb_items"].write.mode("overwrite").parquet(f"{args.output}/kb_items")
    res["touched"].write.mode("overwrite").parquet(f"{args.output}/touched")
    clusters.write.mode("overwrite").parquet(f"{args.output}/clusters")
    delta_triples(
        spark.read.parquet(f"{args.output}/kb_items")
    ).write.mode("overwrite").parquet(f"{args.output}/kb_triples")

    out = {
        "n_delta_rows": delta.count(),
        "n_touched": res["touched"].count(),
        "n_items": spark.read.parquet(f"{args.output}/kb_items").count(),
        "wall_sec": round(time.time() - t0, 2),
    }
    if args.verify_full_rebuild:
        def canon(df):
            out = set()
            for r in df.collect():
                sts = tuple(sorted(
                    (s["pid"], s["object"],
                     tuple(sorted((s["qualifiers"] or {}).items())))
                    for s in (r["statements"] or [])
                ))
                out.add((r["id"], r["name"],
                         tuple(sorted(r["types"] or [])), sts))
            return out

        expected = full_rebuild(
            spark.read.parquet(f"{args.output}/sources"), clusters
        )
        got = spark.read.parquet(f"{args.output}/kb_items")
        if canon(got) != canon(expected):
            print(json.dumps({**out, "verified": False}))
            raise SystemExit("delta result diverges from full rebuild")
        out["verified"] = True
    print(json.dumps(out))


if __name__ == "__main__":
    main()
