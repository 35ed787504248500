"""Query-throughput scaling at 2→8, PLAIN vs BUCKETED store form.

Companion to bench/scaling.py (same protocol family: fresh JVM per
timed worker, interleaved levels, control-gated launch, ALL reps
published): the segment store + bucketed table are built ONCE, untimed
(they are deterministic functions of the corpus — v1 rebuilt them
inside every worker, which made a rep pair cost ~22 min of untimed
build for ~2 min of measurement); each timed worker is then a FRESH
JVM at its core count that re-opens the store from disk — the plain
form via `open_segments`, the bucketed form via the durable
`open_bucketed_table` re-registration path (which is also exactly the
cross-session reopen the store form advertises) — and times the
200-query and 1,000-query reference batches against BOTH forms. Both
levels read the SAME bytes (one shared store), so the comparison is
layout-identical by construction.

The bucketed form removes the query-time blob shuffle
(segments.as_bucketed_table), which is most of the non-scaling floor
the small batch pays — this measures how much of the small-batch
scaling gap that recovers.

Health rule (v2, pre-registered before any v2 runs): a rep pair feeds
the claimed ratios only if BOTH its levels launched at an adjacent
pure-CPU control >= gate AND finished with a post-run control >= gate,
where the post-run control is the BEST of 3 samples 15 s apart. The
single-sample post control of v1 had published within-minute swings of
0.63→1.25 on this host — one draw measures the sampler, not the host;
best-of-3 still fails honestly when the host is actually degraded (a
contended host cannot produce a fast sample) but stops discarding
healthy runs on sampler noise. All attempts and all three post samples
are published per row.

Usage: python bench/qps_scaling.py --pages <dir> [--low 2 --high 8]
       [--gate-control 0.95] [--reps 3]
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

TABLE = "qps_scaling_bstore"

#: one-time, untimed: build index + segment store + bucketed table at a
#: fixed parallelism (8) — store bytes are identical for every timed
#: worker at every level
BUILDER = r"""
import json, os, sys
sys.path.insert(0, %(repo)r)
from fornax_spark.session import get_spark
from fornax_spark.fulltext.build import build_index
from fornax_spark.fulltext.segments import as_bucketed_table, build_segments

spark = get_spark(
    "qps-scaling-build", cores=8, shuffle_partitions=8,
    extra_conf={"spark.sql.files.maxPartitionBytes": str(8 * 1024 * 1024)},
)
pages = spark.read.parquet(%(pages)r)
idx = build_index(spark, pages, from_html=True)
store = build_segments(spark, idx, %(seg)r, n_buckets=64)
as_bucketed_table(spark, store, %(table)r)
print("BUILT", store.n_docs, flush=True)
spark.stop()
"""

WORKER = r"""
import json, os, sys, time
sys.path.insert(0, %(repo)r)
from fornax_spark.session import get_spark
from fornax_spark.fulltext.build import build_index
from fornax_spark.fulltext.corpus import reference_queries
from fornax_spark.fulltext.segments import open_bucketed_table, open_segments
from fornax_spark.fulltext.wand import search_segments_batch

cores = %(cores)d
spark = get_spark(
    "qps-scaling-%%d" %% cores, cores=cores, shuffle_partitions=cores,
    extra_conf={"spark.sql.files.maxPartitionBytes": str(8 * 1024 * 1024)},
)
store = open_segments(%(seg)r)
bstore = open_bucketed_table(spark, %(seg)r)

# JIT/Arrow warmup on a tiny throwaway index + one small untimed query
# batch per form (identical at both levels)
import pyspark.sql.functions as F
pages = spark.read.parquet(%(pages)r)
warm = build_index(spark, pages.limit(3200).repartition(cores), from_html=True)
warm.term_stats.count()
warm.postings.unpersist()

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
warm_q = q1.head(20)


def best_of(fn, reps):
    best = None
    for _ in range(reps):
        t0 = time.time()
        fn()
        secs = time.time() - t0
        best = secs if best is None else min(best, secs)
    return best


out = {"cores": cores, "n_docs": store.n_docs}
for label, st in (("plain", store), ("bucketed", bstore)):
    search_segments_batch(spark, st, warm_q).count()  # untimed warm
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
"""


def ensure_store(pages: str, seg_dir: str) -> None:
    """Build the shared store once; reuse if its ledger already exists."""
    if os.path.exists(os.path.join(seg_dir, "ledger.json")) and os.path.exists(
        os.path.join(seg_dir, "bucketed_table.json")
    ):
        return
    code = BUILDER % {
        "repo": REPO, "pages": pages, "seg": seg_dir, "table": TABLE,
    }
    out = subprocess.run(
        [sys.executable, "-c", code], capture_output=True, text=True,
        timeout=3000,
    )
    if "BUILT" not in out.stdout:
        raise RuntimeError(
            f"store build failed:\n{out.stdout[-2000:]}\n{out.stderr[-4000:]}"
        )


def run_level(
    cores: int, pages: str, seg_dir: str, gate: float, max_waits: int = 12
) -> dict:
    """One fresh-JVM worker at `cores`, gated on an adjacent pure-CPU
    control and followed by a best-of-3 post-run control (see module
    docstring for the pre-registered health rule)."""
    import time as _t

    attempts = [round(cpu_control(), 3)]
    while gate and attempts[-1] < gate and len(attempts) <= max_waits:
        _t.sleep(20)
        attempts.append(round(cpu_control(), 3))
    code = WORKER % {
        "repo": REPO, "cores": cores, "pages": pages, "seg": seg_dir,
    }
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
            post = [round(cpu_control(), 3)]
            for _ in range(2):
                _t.sleep(15)
                post.append(round(cpu_control(), 3))
            row["cpu_control_post_samples"] = post
            row["cpu_control_post"] = max(post)
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
    ap.add_argument("--reps", type=int, default=3)
    ap.add_argument(
        "--seg-dir", default=None,
        help="shared store dir (built if absent, reused if present)",
    )
    args = ap.parse_args()

    seg_root = "/dev/shm" if os.path.isdir("/dev/shm") else None
    import tempfile

    seg_dir = args.seg_dir or os.path.join(
        seg_root or tempfile.gettempdir(), "qps_scaling_store"
    )
    ensure_store(args.pages, seg_dir)

    lo_reps, hi_reps = [], []
    for rep in range(args.reps):
        lo = run_level(args.low, args.pages, seg_dir, args.gate_control)
        hi = run_level(args.high, args.pages, seg_dir, args.gate_control)
        print(f"LOW[{rep}] ", json.dumps(lo), flush=True)
        print(f"HIGH[{rep}]", json.dumps(hi), flush=True)
        lo_reps.append(lo)
        hi_reps.append(hi)

    ratio = args.high / args.low
    result = {
        "protocol": "v2: shared untimed store, fresh JVM per timed "
        "worker via durable reopen, post-run control best-of-3",
        "reps": {"low": lo_reps, "high": hi_reps},
    }

    # a rep PAIR is healthy only if both its levels launched at
    # control >= gate AND finished with post-run control >= gate
    # (wandering-host runs are published but never feed a ratio)
    def healthy(r: dict) -> bool:
        return (
            r["cpu_control_2_8"] >= args.gate_control
            and r.get("cpu_control_post", 0) >= args.gate_control
        )

    pairs = [
        (lo, hi)
        for lo, hi in zip(lo_reps, hi_reps)
        if healthy(lo) and healthy(hi)
    ]
    result["healthy_pairs"] = len(pairs)
    result["status"] = "ok" if pairs else "partial"
    if pairs:
        for key in (
            "qps_plain", "qps_bucketed", "qps_1k_plain", "qps_1k_bucketed"
        ):
            lo_best = max(lo[key] for lo, _hi in pairs)
            hi_best = max(hi[key] for _lo, hi in pairs)
            result["best_" + key] = {"low": lo_best, "high": hi_best}
            result["scaling_efficiency_" + key] = round(
                (hi_best / lo_best) / ratio, 3
            )
    else:
        result["note"] = (
            "no rep pair launched AND finished at control >= "
            f"{args.gate_control}: scaling ratios not claimed"
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
