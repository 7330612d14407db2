"""Build the --py-files archive for multi-executor cluster submission
(north_rule: `spark-submit --py-files` at sizes N and 4N).

    python tools/make_pyfiles.py           # → dist/biz_crawlers_spark.zip
    spark-submit --master <cluster> \
        --py-files dist/biz_crawlers_spark.zip \
        --conf spark.sql.adaptive.enabled=true \
        your_job.py

The archive is deterministic (fixed timestamps, sorted entries) so repeated
builds are byte-identical — ship-what-you-tested.
"""

from __future__ import annotations

import os
import sys
import zipfile

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def main() -> str:
    dist = os.path.join(ROOT, "dist")
    os.makedirs(dist, exist_ok=True)
    dest = os.path.join(dist, "biz_crawlers_spark.zip")
    entries = []
    pkg = os.path.join(ROOT, "biz_crawlers_spark")
    for dirpath, dirnames, filenames in os.walk(pkg):
        dirnames[:] = sorted(d for d in dirnames if d != "__pycache__")
        for fn in sorted(filenames):
            if fn.endswith(".py"):
                full = os.path.join(dirpath, fn)
                entries.append((full, os.path.relpath(full, ROOT)))
    with zipfile.ZipFile(dest, "w", zipfile.ZIP_DEFLATED) as z:
        for full, rel in entries:
            zi = zipfile.ZipInfo(rel, date_time=(2020, 1, 1, 0, 0, 0))
            zi.external_attr = 0o644 << 16
            with open(full, "rb") as f:
                z.writestr(zi, f.read())
    print(f"{dest}: {len(entries)} modules")
    return dest


if __name__ == "__main__":
    sys.exit(0 if main() else 1)
