"""Build the --py-files archive for cluster submission.

    python tools/package_pyfiles.py [out.zip]

Produces a zip of the ``sling_spark`` package (sources only, no caches)
suitable for::

    spark-submit --py-files sling_spark.zip tools/submit_pipeline.py \
        --corpus s3://bucket/corpus --output s3://bucket/kg \
        --checkpoint s3://bucket/ckpt

The archive is deterministic (sorted entries, zeroed timestamps) so
repeated builds produce byte-identical artifacts — reproducible deploys.
"""

from __future__ import annotations

import os
import sys
import zipfile


def build(out: str = "sling_spark.zip") -> str:
    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    pkg = os.path.join(root, "sling_spark")
    entries = []
    for dirpath, dirnames, filenames in os.walk(pkg):
        dirnames[:] = [d for d in dirnames if d != "__pycache__"]
        for f in filenames:
            if f.endswith(".py"):
                full = os.path.join(dirpath, f)
                entries.append((os.path.relpath(full, root), full))
    entries.sort()
    with zipfile.ZipFile(out, "w", zipfile.ZIP_DEFLATED) as z:
        for arcname, full in entries:
            info = zipfile.ZipInfo(arcname, date_time=(1980, 1, 1, 0, 0, 0))
            info.compress_type = zipfile.ZIP_DEFLATED
            info.external_attr = 0o644 << 16
            with open(full, "rb") as fh:
                z.writestr(info, fh.read())
    return out


if __name__ == "__main__":
    out = build(sys.argv[1] if len(sys.argv) > 1 else "sling_spark.zip")
    print(out)
