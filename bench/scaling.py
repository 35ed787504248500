"""Scaling-efficiency evidence for the north rule: the SAME index-build +
query job at two parallelism levels (local[8] vs local[32] — the
sandbox stand-in for N vs 4N executors), on identical input.

Usage:  python bench/scaling.py [--docs 30000] [--low 8] [--high 32]
Writes: bench/scaling_<low>_<high>.json and prints one JSON line
(BENCH.md is hand-curated from these).

Each level runs in a FRESH subprocess (own JVM) so nothing is shared
but the on-disk corpus. Timed sections exclude session startup and
corpus generation; throughput = docs indexed / build seconds.

Store writes go to tmpfs (/dev/shm), the same stand-in session.py uses
for shuffle: this sandbox's /tmp is an overlay fs whose CONCURRENT
writes serialize (measured: the identical 150k-doc segment build at 8
cores takes 25.8 s writing to /tmp vs 14.9 s to tmpfs — the extra 11 s
is filesystem contention, constant in core count, which masquerades as
poor Spark scaling). On a real cluster the store lands on HDFS/S3/NVMe
where writer bandwidth scales with the writers.
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys
import tempfile

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

WORKER = r"""
import json, os, sys, time
sys.path.insert(0, %(repo)r)
from fornax_spark.session import get_spark
from fornax_spark.fulltext.build import build_index
from fornax_spark.fulltext.corpus import reference_queries
from fornax_spark.fulltext.segments import build_segments
from fornax_spark.fulltext.wand import search_segments_batch

cores = %(cores)d
spark = get_spark(
    "scaling-%%d" %% cores, cores=cores, shuffle_partitions=cores,
    extra_conf={"spark.sql.files.maxPartitionBytes": str(8 * 1024 * 1024)},
)
pages = spark.read.parquet(%(pages)r)
pages.count()

# warm-up (untimed): spawns+imports the Python UDF workers on every core
# and JIT/codegen-compiles the whole pipeline — a cluster amortizes this
# one-time cost over hours; steady-state throughput is the metric.
warm = build_index(spark, pages.limit(3200).repartition(cores), from_html=True)
warm.term_stats.count()
warm.postings.unpersist()

build_secs = None
for rep in range(2):  # best-of-2: single-tenant box but noisy neighbors
    if rep:
        idx.postings.unpersist()
    t0 = time.time()
    idx = build_index(spark, pages, from_html=True)
    secs = time.time() - t0
    build_secs = secs if build_secs is None else min(build_secs, secs)
n_docs = idx.stats.n_docs
n_postings = idx.postings.count()

seg_secs = None  # best-of-2: the VM's wandering stall poisons single shots
dict_secs = None
seg_dirs = []
for rep in range(2):
    seg_dir = %(seg)r + str(cores) + "_" + str(rep)
    seg_dirs.append(seg_dir)
    t0 = time.time()
    store = build_segments(spark, idx, seg_dir, n_buckets=64)
    secs = time.time() - t0
    seg_secs = secs if seg_secs is None else min(seg_secs, secs)
    with open(os.path.join(seg_dir, "ledger.json")) as f:
        d = json.load(f).get("dict_secs", 0.0)
    dict_secs = d if dict_secs is None else min(dict_secs, d)

import pandas as pd
q1 = reference_queries()
# 4x the reference set (fresh query ids): the round-1/2-comparable batch
queries = pd.concat(
    [q1.assign(query_id=q1["query_id"] + i * len(q1)) for i in range(4)],
    ignore_index=True,
)
lat = []
for _ in range(3):
    t0 = time.time()
    search_segments_batch(spark, store, queries).count()
    lat.append(time.time() - t0)
lat.sort()

# ~1000-query batch: ONE Spark job whose per-job scheduling floor
# (constant in cluster size) is amortized ~12x further than the small
# batch — this isolates whether poor small-batch QPS scaling is floor or
# actual per-query work (the north-rule evidence the small batch can't
# give)
mult_1k = max(1, 1000 // len(q1))
queries_1k = pd.concat(
    [q1.assign(query_id=q1["query_id"] + i * len(q1)) for i in range(mult_1k)],
    ignore_index=True,
)
lat1k = []
for _ in range(2):
    t0 = time.time()
    search_segments_batch(spark, store, queries_1k).count()
    lat1k.append(time.time() - t0)
lat1k.sort()

print("RESULT " + json.dumps({
    "cores": cores,
    "n_docs": n_docs,
    "n_postings": n_postings,
    "build_secs": round(build_secs, 2),
    "docs_per_sec": round(n_docs / build_secs, 1),
    "postings_per_sec": round(n_postings / build_secs, 1),
    "segment_build_secs": round(seg_secs, 2),
    "segment_docs_per_sec": round(n_docs / seg_secs, 1),
    "segment_dict_secs": round(dict_secs, 2),
    "segment_encode_write_secs": round(seg_secs - dict_secs, 2),
    "segment_encode_docs_per_sec": round(n_docs / (seg_secs - dict_secs), 1),
    "query_batch_secs": round(lat[0], 2),
    "qps": round(len(queries) / lat[0], 1),
    "n_queries_1k": len(queries_1k),
    "query_batch1k_secs": round(lat1k[0], 2),
    "qps_1k": round(len(queries_1k) / lat1k[0], 1),
}))
spark.stop()
import shutil
for d in seg_dirs:
    shutil.rmtree(d, ignore_errors=True)
"""


def run_level(cores: int, pages_path: str, seg_base: str) -> dict:
    # adjacent machine-state control: the host's own deliverable CPU
    # scaling right before this worker, so episodic degradation is in
    # the record next to the number it may have polluted
    ctl = round(cpu_control(), 3)
    code = WORKER % {"repo": REPO, "cores": cores, "pages": pages_path, "seg": seg_base}
    out = subprocess.run(
        [sys.executable, "-c", code], capture_output=True, text=True, timeout=3000
    )
    for line in out.stdout.splitlines():
        if line.startswith("RESULT "):
            row = json.loads(line[len("RESULT "):])
            row["cpu_control_2_8"] = ctl
            return row
    raise RuntimeError(f"worker[{cores}] failed:\n{out.stdout[-2000:]}\n{out.stderr[-4000:]}")


def _burn(n: int) -> int:
    s = 0
    for i in range(n):
        s += i * i
    return s


def cpu_control(workers_a: int = 2, workers_b: int = 8) -> float:
    """Pure-CPU multiprocessing scaling control (no Spark): how much of
    ideal the MACHINE delivers between the two worker counts right now.
    Run adjacent to each Spark level so episodic host degradation (steal
    spikes) is visible in the record instead of silently polluting the
    Spark ratios."""
    import multiprocessing as mp
    import time as _t

    def rate(workers: int, per: int = 20_000_000) -> float:
        t0 = _t.time()
        with mp.Pool(workers) as p:
            p.map(_burn, [per] * workers)
        return workers * per / (_t.time() - t0)

    ra, rb = rate(workers_a), rate(workers_b)
    return (rb / ra) / (workers_b / workers_a)


def gen_corpus(docs: int, pages_path: str) -> None:
    gen = (
        "import sys; sys.path.insert(0, %r);\n"
        "from fornax_spark.session import get_spark\n"
        "from fornax_spark.fulltext.corpus import generate_pages_spark\n"
        "spark = get_spark('gen', cores=32)\n"
        "generate_pages_spark(spark, %d, seed=42, partitions=64)"
        ".write.mode('overwrite').parquet(%r)\n"
        "spark.stop()\n" % (REPO, docs, pages_path)
    )
    subprocess.run([sys.executable, "-c", gen], check=True, timeout=3000)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--docs", type=int, default=30000)
    ap.add_argument("--low", type=int, default=8)
    ap.add_argument("--high", type=int, default=32)
    ap.add_argument(
        "--one-level", type=int, default=None, metavar="CORES",
        help="run ONE worker at CORES against --pages and append the "
        "result row (+ an adjacent pure-CPU control) to --out as JSON "
        "lines; the caller interleaves levels and combines with "
        "--combine. Lets each worker run in its own short foreground "
        "invocation instead of one long background process.",
    )
    ap.add_argument("--pages", default=None)
    ap.add_argument("--out", default=None)
    ap.add_argument(
        "--gen-only", action="store_true",
        help="only materialize the corpus at --pages and exit",
    )
    ap.add_argument(
        "--combine", nargs="+", default=None, metavar="JSONL",
        help="combine --one-level JSONL files into the final "
        "scaling_<low>_<high>.json (rows carry their own core counts)",
    )
    args = ap.parse_args()

    if args.gen_only:
        gen_corpus(args.docs, args.pages)
        return

    if args.one_level is not None:
        seg_root = "/dev/shm" if os.path.isdir("/dev/shm") else None
        row = run_level(
            args.one_level, args.pages,
            tempfile.mkdtemp(prefix="fornax_seg1_", dir=seg_root) + "/",
        )
        line = json.dumps(row)
        print(line)
        if args.out:
            with open(args.out, "a") as f:
                f.write(line + "\n")
        return

    if args.combine:
        rows = []
        for p in args.combine:
            with open(p) as f:
                rows.extend(json.loads(ln) for ln in f if ln.strip())
        lo_reps = [r for r in rows if r["cores"] == args.low]
        hi_reps = [r for r in rows if r["cores"] == args.high]
        finish(args, lo_reps, hi_reps)
        return

    workdir = tempfile.mkdtemp(prefix="fornax_scaling_")
    pages_path = os.path.join(workdir, "pages")
    gen_corpus(args.docs, pages_path)

    # interleave the levels (low, high, low, high): the VM's throughput
    # wanders over tens of minutes, so back-to-back single runs would
    # compare different machine states. ALL reps are published; each
    # efficiency ratio uses the per-METRIC best across reps at each
    # level (one metric per ratio — no cross-metric composition), and
    # the aggregate rows are labeled best_per_metric, not presented as
    # a single run no process produced.
    lo_reps, hi_reps = [], []
    for rep in range(2):
        seg_root = "/dev/shm" if os.path.isdir("/dev/shm") else workdir
        lo_r = run_level(
            args.low, pages_path, os.path.join(seg_root, f"fx_seg_lo{rep}_")
        )
        hi_r = run_level(
            args.high, pages_path, os.path.join(seg_root, f"fx_seg_hi{rep}_")
        )
        print(f"LOW[{rep}] ", json.dumps(lo_r))
        print(f"HIGH[{rep}]", json.dumps(hi_r))
        lo_reps.append(lo_r)
        hi_reps.append(hi_r)
    finish(args, lo_reps, hi_reps)


def finish(args, lo_reps: list[dict], hi_reps: list[dict]) -> None:
    rate_keys = [
        "docs_per_sec", "postings_per_sec", "segment_docs_per_sec",
        "segment_encode_docs_per_sec", "qps", "qps_1k",
    ]
    sec_keys = ["build_secs", "segment_build_secs", "segment_dict_secs",
                "segment_encode_write_secs", "query_batch_secs",
                "query_batch1k_secs"]

    def best_per_metric(reps: list[dict]) -> dict:
        out = dict(reps[0])
        for k in rate_keys:
            out[k] = max(r[k] for r in reps)
        for k in sec_keys:
            out[k] = min(r[k] for r in reps)
        return out

    lo, hi = best_per_metric(lo_reps), best_per_metric(hi_reps)
    ratio = args.high / args.low
    eff_build = (hi["docs_per_sec"] / lo["docs_per_sec"]) / ratio
    eff_seg = (hi["segment_docs_per_sec"] / lo["segment_docs_per_sec"]) / ratio
    eff_qps = (hi["qps"] / lo["qps"]) / ratio
    eff_qps_1k = (hi["qps_1k"] / lo["qps_1k"]) / ratio
    eff_encode = (
        hi["segment_encode_docs_per_sec"] / lo["segment_encode_docs_per_sec"]
    ) / ratio

    result = {
        "docs": args.docs,
        "reps": {"low": lo_reps, "high": hi_reps},
        "best_per_metric": {"low": lo, "high": hi},
        "scaling_efficiency_index_build": round(eff_build, 3),
        "scaling_efficiency_segment_build": round(eff_seg, 3),
        "scaling_efficiency_segment_encode_write": round(eff_encode, 3),
        "scaling_efficiency_qps": round(eff_qps, 3),
        "scaling_efficiency_qps_1k": round(eff_qps_1k, 3),
        "cpu_controls_2_8": {
            "low": [r.get("cpu_control_2_8") for r in lo_reps],
            "high": [r.get("cpu_control_2_8") for r in hi_reps],
        },
    }
    print(json.dumps(result))

    out_path = os.path.join(
        os.path.dirname(os.path.abspath(__file__)),
        f"scaling_{args.low}_{args.high}.json",
    )
    with open(out_path, "w") as f:
        json.dump(result, f, indent=1)


if __name__ == "__main__":
    main()
