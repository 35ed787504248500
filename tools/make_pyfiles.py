"""Build the --py-files artifact for cluster submission (north rule:
"ships via spark-submit --py-files to a multi-executor cluster").

    python tools/make_pyfiles.py [--out /tmp/fornax_spark.zip]
    spark-submit --py-files /tmp/fornax_spark.zip \
        fornax_spark/cli.py build --pages ... --out ... --buckets 4096

Deterministic: source files are added in sorted order with zeroed
timestamps, so the artifact hash is reproducible for a given tree
(lineage records can pin it).
"""

from __future__ import annotations

import argparse
import os
import zipfile

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def build_zip(out: str) -> str:
    src_root = os.path.join(REPO, "fornax_spark")
    members = []
    for root, _dirs, files in os.walk(src_root):
        for f in files:
            if f.endswith(".py"):
                p = os.path.join(root, f)
                members.append((os.path.relpath(p, REPO), p))
    members.sort()
    with zipfile.ZipFile(out, "w", zipfile.ZIP_DEFLATED) as z:
        for arcname, path in members:
            with open(path, "rb") as fh:
                data = fh.read()
            info = zipfile.ZipInfo(arcname, date_time=(1980, 1, 1, 0, 0, 0))
            info.compress_type = zipfile.ZIP_DEFLATED
            z.writestr(info, data)
    return out


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default="/tmp/fornax_spark.zip")
    args = ap.parse_args()
    out = build_zip(args.out)
    print(out, os.path.getsize(out), "bytes")


if __name__ == "__main__":
    main()
