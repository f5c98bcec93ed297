"""Local replica of the driver's correctness gate.

Runs every ``queries()`` entry on Spark at the given sf dir and the
matching ``oracle_sql()`` in DuckDB over the same parquet files, then
compares row count + column names + an order-insensitive value hash
(columns sorted by name, every cell canonicalized to a string).

Usage: python tools/check_contract.py [sf_dir] [query ...]
"""

from __future__ import annotations

import hashlib
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]


def canon_cell(v) -> str:
    import datetime
    import math

    if v is None:
        return "NULL"
    if isinstance(v, bool):
        return str(int(v))
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        if math.isinf(v):  # int(inf) raises — report, don't crash
            return "Inf" if v > 0 else "-Inf"
        if v == int(v) and abs(v) < 1e15:
            return str(int(v))
        return repr(round(v, 9))
    if isinstance(v, datetime.datetime):
        return v.replace(tzinfo=None).isoformat()
    return str(v)


def table_hash(cols: list[str], rows: list[tuple]) -> tuple[str, list[str]]:
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    lines = sorted(
        "\x1f".join(canon_cell(r[i]) for i in order) for r in rows
    )
    h = hashlib.sha256("\n".join(lines).encode()).hexdigest()
    return h, lines


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])

    import duckdb

    import __spark_entry__ as entrymod
    from sling_spark.session import get_spark

    spark = get_spark(master="local[8]", shuffle_partitions=8, app_name="contract-check")

    con = duckdb.connect()
    for t in TABLES:
        path = f"{sf_dir}/{t}.parquet"
        if os.path.exists(path):
            con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{path}'")

    qs = entrymod.queries()
    oracles = entrymod.oracle_sql()
    if only:
        unknown = [n for n in only if n not in qs]
        if unknown:
            # a typo'd name must not skip everything and print ALL OK
            print(f"ERROR unknown queries: {unknown}")
            print(f"      available: {sorted(qs)}")
            return 2
    failures = []
    results = {}  # name -> record for the optional JSON artifact
    for name, fn in qs.items():
        if only and name not in only:
            continue
        t0 = time.time()
        try:
            df = fn(spark, sf_dir)
            cols = df.columns
            rows = [tuple(r) for r in df.collect()]
        except Exception as e:  # noqa: BLE001
            print(f"FAIL  {name}: spark error: {e}")
            failures.append(name)
            results[name] = {
                "rows_match": False, "schema_match": False,
                "hash_match": False, "spark_rows": None, "oracle_rows": None,
                "err": f"spark error: {e}",
            }
            continue
        spark_t = time.time() - t0
        if name not in oracles:
            print(f"ROWS  {name}: {len(rows)} rows (no oracle) [{spark_t:.1f}s]")
            if len(rows) == 0:
                failures.append(name)
            results[name] = {
                "rows_match": len(rows) > 0, "schema_match": None,
                "hash_match": None, "spark_rows": len(rows), "oracle_rows": None,
                "err": "no oracle" if len(rows) else "no oracle; zero rows",
            }
            continue
        try:
            res = con.sql(oracles[name])
            ocols = [d[0] for d in res.description]
            orows = res.fetchall()
        except Exception as e:  # noqa: BLE001
            print(f"FAIL  {name}: duckdb error: {e}")
            failures.append(name)
            results[name] = {
                "rows_match": False, "schema_match": False,
                "hash_match": False, "spark_rows": len(rows), "oracle_rows": None,
                "err": f"duckdb error: {e}",
            }
            continue
        problems = []
        if sorted(cols) != sorted(ocols):
            problems.append(f"schema {sorted(cols)} vs {sorted(ocols)}")
        if len(rows) != len(orows):
            problems.append(f"rowcount {len(rows)} vs {len(orows)}")
        if not problems:
            hs, ls = table_hash(cols, rows)
            ho, lo = table_hash(ocols, orows)
            if hs != ho:
                lo_set, ls_set = set(lo), set(ls)  # hoisted: O(n+m)
                diff_a = [l for l in ls if l not in lo_set][:3]
                diff_b = [l for l in lo if l not in ls_set][:3]
                problems.append(f"valuehash; spark-only={diff_a} duck-only={diff_b}")
        if problems:
            print(f"FAIL  {name}: {'; '.join(problems)}")
            failures.append(name)
        else:
            print(f"OK    {name}: {len(rows)} rows match [{spark_t:.1f}s]")
        results[name] = {
            "rows_match": len(rows) == len(orows),
            "schema_match": sorted(cols) == sorted(ocols),
            "hash_match": not problems,
            "spark_rows": len(rows),
            "oracle_rows": len(orows),
            "err": "; ".join(problems) or None,
        }
    print(f"\n{len(failures)} failures: {failures}" if failures else "\nALL OK")
    # Optional machine-readable artifact (driver CORRECTNESS_r* schema)
    # so full 58-query sweeps — including the entries past the driver's
    # recording budget — can be committed and diffed per round:
    #   CHECK_CONTRACT_JSON=CORRECTNESS_full_r06.json python tools/check_contract.py
    out_json = os.environ.get("CHECK_CONTRACT_JSON")
    if out_json:
        import json

        with open(out_json, "w") as fh:
            json.dump(results, fh, indent=2)
        print(f"wrote {out_json} ({len(results)} entries)")
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())
