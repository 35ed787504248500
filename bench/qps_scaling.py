"""Query-throughput scaling at 2→8, PLAIN vs BUCKETED store form.

Companion to bench/scaling.py (same protocol: fresh JVM per level,
interleaved levels, control-gated launch, all reps published): each
worker builds the index + segment store untimed, publishes the blocks
as a bucketed table, then times the 200-query and 1,000-query reference
batches against BOTH store forms. The bucketed form removes the
query-time blob shuffle (segments.as_bucketed_table), which is most of
the non-scaling floor the small batch pays — this measures how much of
the small-batch scaling gap that recovers.

Usage: python bench/qps_scaling.py --pages <dir> [--low 2 --high 8]
       [--gate-control 0.95] [--reps 2]
Writes bench/qps_scaling_<low>_<high>.json.
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from scaling import cpu_control  # noqa: E402

WORKER = r"""
import json, os, sys, time
sys.path.insert(0, %(repo)r)
from fornax_spark.session import get_spark
from fornax_spark.fulltext.build import build_index
from fornax_spark.fulltext.corpus import reference_queries
from fornax_spark.fulltext.segments import as_bucketed_table, build_segments
from fornax_spark.fulltext.wand import search_segments_batch

cores = %(cores)d
spark = get_spark(
    "qps-scaling-%%d" %% cores, cores=cores, shuffle_partitions=cores,
    extra_conf={"spark.sql.files.maxPartitionBytes": str(8 * 1024 * 1024)},
)
pages = spark.read.parquet(%(pages)r)
pages.count()
warm = build_index(spark, pages.limit(3200).repartition(cores), from_html=True)
warm.term_stats.count()
warm.postings.unpersist()

idx = build_index(spark, pages, from_html=True)  # untimed here
seg_dir = %(seg)r + str(cores)
store = build_segments(spark, idx, seg_dir, n_buckets=64)
bstore = as_bucketed_table(spark, store, "qps_scaling_bstore_%%d" %% cores)

import pandas as pd
q1 = reference_queries()
queries = pd.concat(
    [q1.assign(query_id=q1["query_id"] + i * len(q1)) for i in range(4)],
    ignore_index=True,
)
mult_1k = max(1, 1000 // len(q1))
queries_1k = pd.concat(
    [q1.assign(query_id=q1["query_id"] + i * len(q1)) for i in range(mult_1k)],
    ignore_index=True,
)


def best_of(fn, reps):
    best = None
    for _ in range(reps):
        t0 = time.time()
        fn()
        secs = time.time() - t0
        best = secs if best is None else min(best, secs)
    return best


out = {"cores": cores, "n_docs": idx.stats.n_docs}
for label, st in (("plain", store), ("bucketed", bstore)):
    sb = best_of(lambda: search_segments_batch(spark, st, queries).count(), 3)
    s1k = best_of(
        lambda: search_segments_batch(spark, st, queries_1k).count(), 2
    )
    out["batch200_secs_" + label] = round(sb, 2)
    out["qps_" + label] = round(len(queries) / sb, 1)
    out["batch1k_secs_" + label] = round(s1k, 2)
    out["qps_1k_" + label] = round(len(queries_1k) / s1k, 1)

print("RESULT " + json.dumps(out))
spark.stop()
import shutil
shutil.rmtree(seg_dir, ignore_errors=True)
"""


def run_level(cores: int, pages: str, seg_base: str, gate: float) -> dict:
    import time as _t

    attempts = [round(cpu_control(), 3)]
    while gate and attempts[-1] < gate and len(attempts) < 5:
        _t.sleep(20)
        attempts.append(round(cpu_control(), 3))
    code = WORKER % {"repo": REPO, "cores": cores, "pages": pages, "seg": seg_base}
    out = subprocess.run(
        [sys.executable, "-c", code], capture_output=True, text=True,
        timeout=3000,
    )
    for line in out.stdout.splitlines():
        if line.startswith("RESULT "):
            row = json.loads(line[len("RESULT "):])
            row["cpu_control_2_8"] = attempts[-1]
            if len(attempts) > 1:
                row["cpu_control_attempts"] = attempts
            return row
    raise RuntimeError(
        f"worker[{cores}] failed:\n{out.stdout[-2000:]}\n{out.stderr[-4000:]}"
    )


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--pages", required=True)
    ap.add_argument("--low", type=int, default=2)
    ap.add_argument("--high", type=int, default=8)
    ap.add_argument("--gate-control", type=float, default=0.95)
    ap.add_argument("--reps", type=int, default=2)
    args = ap.parse_args()

    seg_root = "/dev/shm" if os.path.isdir("/dev/shm") else None
    import tempfile

    lo_reps, hi_reps = [], []
    for rep in range(args.reps):
        base = tempfile.mkdtemp(prefix=f"qps_seg{rep}_", dir=seg_root) + "/"
        lo = run_level(args.low, args.pages, base + "lo", args.gate_control)
        hi = run_level(args.high, args.pages, base + "hi", args.gate_control)
        print(f"LOW[{rep}] ", json.dumps(lo))
        print(f"HIGH[{rep}]", json.dumps(hi))
        lo_reps.append(lo)
        hi_reps.append(hi)

    ratio = args.high / args.low
    result = {"reps": {"low": lo_reps, "high": hi_reps}}
    for key in ("qps_plain", "qps_bucketed", "qps_1k_plain", "qps_1k_bucketed"):
        lo_best = max(r[key] for r in lo_reps)
        hi_best = max(r[key] for r in hi_reps)
        result["best_" + key] = {"low": lo_best, "high": hi_best}
        result["scaling_efficiency_" + key] = round(
            (hi_best / lo_best) / ratio, 3
        )
    print(json.dumps(result))
    out_path = os.path.join(
        os.path.dirname(os.path.abspath(__file__)),
        f"qps_scaling_{args.low}_{args.high}.json",
    )
    with open(out_path, "w") as f:
        json.dump(result, f, indent=1)


if __name__ == "__main__":
    main()
