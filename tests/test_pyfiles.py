"""The spark-submit --py-files ship story (VERDICT r5 item 8): the
artifact tools/make_pyfiles.py builds must be (a) byte-deterministic for
a given tree — lineage records pin its hash — and (b) actually runnable:
a fresh interpreter with ONLY the zip on sys.path (plus
sparkContext.addPyFile, the programmatic --py-files) drives an index
build + query end to end."""

from __future__ import annotations

import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def test_pyfiles_zip_deterministic(tmp_path):
    z1 = str(tmp_path / "a.zip")
    z2 = str(tmp_path / "b.zip")
    for z in (z1, z2):
        subprocess.run(
            [sys.executable, os.path.join(REPO, "tools", "make_pyfiles.py"),
             "--out", z],
            check=True, capture_output=True, timeout=60,
        )
    b1 = open(z1, "rb").read()
    assert b1 == open(z2, "rb").read()
    assert len(b1) > 10_000


def test_pyfiles_zip_runs_query(tmp_path):
    zp = str(tmp_path / "ship.zip")
    subprocess.run(
        [sys.executable, os.path.join(REPO, "tools", "make_pyfiles.py"),
         "--out", zp],
        check=True, capture_output=True, timeout=60,
    )
    code = f"""
import sys
sys.path.insert(0, {zp!r})
import fornax_spark
assert fornax_spark.__file__.startswith({zp!r}), fornax_spark.__file__
from fornax_spark.session import get_spark
from fornax_spark.fulltext.build import build_index_from_table
from fornax_spark.fulltext.query import search

spark = get_spark("pyfiles-ship", cores=2, shuffle_partitions=2)
spark.sparkContext.addPyFile({zp!r})  # programmatic --py-files
docs = spark.createDataFrame(
    [(i, f"zipship alpha tok{{i % 5}}") for i in range(60)],
    "doc_id long, text string",
)
idx = build_index_from_table(docs)
rows = search(spark, idx, "zipship tok3", k=5).collect()
assert len(rows) == 5 and rows[0]["rank"] == 1, rows
idx.postings.unpersist()
spark.stop()
print("ZIPRUN-OK")
"""
    out = subprocess.run(
        [sys.executable, "-c", code],
        capture_output=True, text=True, timeout=400,
        cwd=str(tmp_path),  # repo dir NOT on the path — only the zip is
    )
    assert "ZIPRUN-OK" in out.stdout, out.stdout[-2000:] + out.stderr[-4000:]
