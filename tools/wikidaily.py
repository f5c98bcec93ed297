"""Crawl-service entrypoint: daily incremental ingest + live change
monitoring for the record store (the wikidaily/wikimonitor analog —
sling_spark/crawl.py).

Daily mode (reference python/crawl/wikidaily.py): parse the day's
incremental stub dump as a Spark job (byte-range-split, so a multi-GB
single file parses in parallel), select the latest in-range revision
per QID, drop candidates the store already has (--check-revision),
fetch each item from --fetch-dir (archived fetches; file:// or object
store) or --fetch-url (live Special:EntityData), and PUT it with
Version=revision in ordered mode:

    python tools/wikidaily.py daily --stubs dump.xml --db kb.db \\
        --fetch-dir s3://bucket/fetches/ [--minrev N --maxrev N \\
        --minqid N --maxqid N --check-revision]

Monitor mode (reference python/crawl/wikimonitor.py): consume a
recentchange stream — an SSE capture (--sse) or a JSONL replay file —
with a timestamp checkpoint every --checkpoint-interval changes:

    python tools/wikidaily.py monitor --events changes.jsonl \\
        --db kb.db --fetch-dir fetches/ --checkpoint ckpt [--threads 8]

Both modes persist the store log afterwards; downstream, Spark drains
the epoch tail via crawl.db_tail_items into kg/delta.apply_kb_delta
(see tools/apply_delta.py).  Prints one JSON summary line.
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
    ap.add_argument("mode", choices=["daily", "monitor"])
    ap.add_argument("--db", required=True, help="record-store log path")
    ap.add_argument("--fetch-dir", default=None,
                    help="directory of <qid>[@<rev>].json fetches")
    ap.add_argument("--fetch-url", default=None,
                    help="live Special:EntityData endpoint")
    ap.add_argument("--lang", default="en")
    # daily
    ap.add_argument("--stubs", help="daily incremental stub XML dump")
    ap.add_argument("--minrev", type=int, default=0)
    ap.add_argument("--maxrev", type=int, default=999999999999)
    ap.add_argument("--minqid", type=int, default=0)
    ap.add_argument("--maxqid", type=int, default=999999999999)
    ap.add_argument("--check-revision", action="store_true")
    ap.add_argument("--master", default=None)
    # monitor
    ap.add_argument("--events", help="recentchange JSONL replay file")
    ap.add_argument("--sse", help="SSE capture file")
    ap.add_argument("--checkpoint", default=None)
    ap.add_argument("--checkpoint-interval", type=int, default=1000)
    ap.add_argument("--threads", type=int, default=1)
    args = ap.parse_args()

    from sling_spark import crawl
    from sling_spark.db import RecordDatabase

    if args.fetch_dir:
        fetcher = crawl.DirectoryFetcher(args.fetch_dir)
    elif args.fetch_url:
        fetcher = crawl.HTTPFetcher(args.fetch_url)
    else:
        ap.error("one of --fetch-dir / --fetch-url is required")

    db = RecordDatabase.open(args.db)
    epoch0 = db.epoch()
    t0 = time.time()

    if args.mode == "daily":
        if not args.stubs:
            ap.error("daily mode requires --stubs")
        from sling_spark.session import get_spark

        spark = get_spark(master=args.master, app_name="sling_spark_wikidaily")
        candidates = crawl.stub_revisions(
            spark, args.stubs, min_rev=args.minrev, max_rev=args.maxrev,
            min_qid=args.minqid, max_qid=args.maxqid)
        if args.check_revision:
            candidates = crawl.pending_updates(candidates, db)
        counts = crawl.wikidaily_ingest(
            db, candidates, fetcher, lang=args.lang)
    else:
        if args.sse:
            def chunks():
                with open(args.sse, "rb") as f:
                    while True:
                        blob = f.read(4096)
                        if not blob:
                            return
                        yield blob

            changes = crawl.recent_changes(crawl.parse_sse(chunks()))
        elif args.events:
            def lines():
                with open(args.events) as f:
                    for line in f:
                        if line.strip():
                            yield {"event": "message",
                                   "data": line.strip()}

            changes = crawl.recent_changes(lines())
        else:
            ap.error("monitor mode requires --events or --sse")
        counts = crawl.monitor_changes(
            db, changes, fetcher, lang=args.lang,
            checkpoint=args.checkpoint,
            checkpoint_interval=args.checkpoint_interval,
            threads=args.threads)

    epoch = db.flush(args.db)
    print(json.dumps({
        "mode": args.mode, "counts": counts, "epoch_before": epoch0,
        "epoch": epoch, "wall_sec": round(time.time() - t0, 2),
    }, sort_keys=True))


if __name__ == "__main__":
    main()
