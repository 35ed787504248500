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
import json, os, sys, time, urllib.request
sys.path.insert(0, %(repo)r)
from fornax_spark.session import get_spark
from fornax_spark.fulltext.build import build_index
from fornax_spark.fulltext.corpus import reference_queries
from fornax_spark.fulltext.segments import build_segments
from fornax_spark.fulltext.wand import search_segments_batch

cores = %(cores)d
spark = get_spark(
    "scaling-%%d" %% cores, cores=cores, shuffle_partitions=cores,
    extra_conf={
        "spark.sql.files.maxPartitionBytes": str(8 * 1024 * 1024),
        # UI on for this worker only: the REST stage API is the source
        # of sum-of-executor-task-time (wall of tasks) and executor CPU
        # time per timed section — host-stall-immune evidence (steal
        # time never enters thread CPU time) for the scaling table
        "spark.ui.enabled": "true",
        "spark.ui.retainedStages": "5000",
    },
)


def _stage_totals():
    # (sum executorRunTime secs, sum executorCpuTime secs) across all
    # completed stages so far; section cost = delta around the section
    base = spark.sparkContext.uiWebUrl
    apps = json.load(urllib.request.urlopen(base + "/api/v1/applications"))
    app_id = apps[0]["id"]
    run = cpu = gc = 0
    for status in ("complete",):
        stages = json.load(urllib.request.urlopen(
            base + "/api/v1/applications/" + app_id + "/stages?status=" + status
        ))
        run += sum(s.get("executorRunTime", 0) for s in stages)
        cpu += sum(s.get("executorCpuTime", 0) for s in stages)
        gc += sum(s.get("jvmGcTime", 0) for s in stages)
    return run / 1e3, cpu / 1e9, gc / 1e3


def _timed(fn, reps):
    # best-of-N wall clock; task/cpu/gc deltas reported FOR THE BEST REP
    # so wall and task time describe the same execution
    best = None
    for rep in range(reps):
        r0, c0, g0 = _stage_totals()
        t0 = time.time()
        ret = fn(rep)
        secs = time.time() - t0
        r1, c1, g1 = _stage_totals()
        row = (secs, r1 - r0, c1 - c0, g1 - g0, ret)
        if best is None or secs < best[0]:
            best = row
    return best


pages = spark.read.parquet(%(pages)r)
pages.count()

# warm-up (untimed): spawns+imports the Python UDF workers on every core
# and JIT/codegen-compiles the whole pipeline — a cluster amortizes this
# one-time cost over hours; steady-state throughput is the metric.
warm = build_index(spark, pages.limit(3200).repartition(cores), from_html=True)
warm.term_stats.count()
warm.postings.unpersist()

_idx_box = []
def _build(rep):
    if _idx_box:
        _idx_box.pop().postings.unpersist()
    idx = build_index(spark, pages, from_html=True)
    _idx_box.append(idx)
    return idx

build_secs, build_task, build_cpu, build_gc, _ = _timed(_build, 2)
idx = _idx_box[-1]  # the still-persisted (last) build feeds the next stage
n_docs = idx.stats.n_docs
n_postings = idx.postings.count()

seg_dirs = []
def _segs(rep):
    seg_dir = %(seg)r + str(cores) + "_" + str(rep)
    seg_dirs.append(seg_dir)
    store = build_segments(spark, idx, seg_dir, n_buckets=64)
    with open(os.path.join(seg_dir, "ledger.json")) as f:
        d = json.load(f).get("dict_secs", 0.0)
    return store, d

seg_secs, seg_task, seg_cpu, seg_gc, (store, dict_secs) = _timed(_segs, 2)

import pandas as pd
q1 = reference_queries()
# 4x the reference set (fresh query ids): the round-1/2-comparable batch
queries = pd.concat(
    [q1.assign(query_id=q1["query_id"] + i * len(q1)) for i in range(4)],
    ignore_index=True,
)
qb_secs, qb_task, qb_cpu, qb_gc, _ = _timed(
    lambda rep: search_segments_batch(spark, store, queries).count(), 3
)

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
q1k_secs, q1k_task, q1k_cpu, q1k_gc, _ = _timed(
    lambda rep: search_segments_batch(spark, store, queries_1k).count(), 2
)

print("RESULT " + json.dumps({
    "cores": cores,
    "n_docs": n_docs,
    "n_postings": n_postings,
    "build_secs": round(build_secs, 2),
    "docs_per_sec": round(n_docs / build_secs, 1),
    "postings_per_sec": round(n_postings / build_secs, 1),
    "build_task_secs": round(build_task, 2),
    "build_cpu_secs": round(build_cpu, 2),
    "build_gc_secs": round(build_gc, 2),
    "segment_build_secs": round(seg_secs, 2),
    "segment_docs_per_sec": round(n_docs / seg_secs, 1),
    "segment_dict_secs": round(dict_secs, 2),
    "segment_encode_write_secs": round(seg_secs - dict_secs, 2),
    "segment_encode_docs_per_sec": round(n_docs / (seg_secs - dict_secs), 1),
    "segment_task_secs": round(seg_task, 2),
    "segment_cpu_secs": round(seg_cpu, 2),
    "segment_gc_secs": round(seg_gc, 2),
    "query_batch_secs": round(qb_secs, 2),
    "qps": round(len(queries) / qb_secs, 1),
    "query_task_secs": round(qb_task, 2),
    "query_cpu_secs": round(qb_cpu, 2),
    "query_gc_secs": round(qb_gc, 2),
    "n_queries_1k": len(queries_1k),
    "query_batch1k_secs": round(q1k_secs, 2),
    "qps_1k": round(len(queries_1k) / q1k_secs, 1),
    "query1k_task_secs": round(q1k_task, 2),
    "query1k_cpu_secs": round(q1k_cpu, 2),
    "query1k_gc_secs": round(q1k_gc, 2),
}))
spark.stop()
import shutil
for d in seg_dirs:
    shutil.rmtree(d, ignore_errors=True)
"""


def run_level(
    cores: int, pages_path: str, seg_base: str, gate_control: float = 0.0
) -> dict:
    # adjacent machine-state control: the host's own deliverable CPU
    # scaling right before this worker, so episodic degradation is in
    # the record next to the number it may have polluted. With
    # gate_control > 0 (VERDICT r3 item 2, option a) the level WAITS for
    # a healthy host: the control is re-measured until it clears the
    # gate (up to 5 tries, 20 s apart); every attempt is published.
    # The gate is TWO-SIDED (r6): a stable host reads ~1.0 — readings
    # ABOVE 2-gate are superlinear, i.e. the low-worker denominator
    # phase itself stalled (observed 1.37/1.71 on demonstrably unstable
    # windows), and must not pass as healthy.
    import time as _t

    attempts = [round(cpu_control(), 3)]
    while (
        gate_control
        and not (gate_control <= attempts[-1] <= 2 - gate_control)
        and len(attempts) < 5
    ):
        _t.sleep(20)
        attempts.append(round(cpu_control(), 3))
    code = WORKER % {"repo": REPO, "cores": cores, "pages": pages_path, "seg": seg_base}
    out = subprocess.run(
        [sys.executable, "-c", code], capture_output=True, text=True, timeout=3000
    )
    for line in out.stdout.splitlines():
        if line.startswith("RESULT "):
            row = json.loads(line[len("RESULT "):])
            row["cpu_control_2_8"] = attempts[-1]
            if len(attempts) > 1:
                row["cpu_control_attempts"] = attempts
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


def _codec_burn(n_blocks: int) -> int:
    """One worker's share of the CODEC-MATCHED control: the repo's own
    delta+varint kernels over realistic posting blocks — the same
    numpy-memory-bound instruction mix the segment encode runs, with
    zero Spark. Used to measure the HOST's delivered ceiling for this
    workload class at encode's busy-thread counts."""
    import numpy as np

    sys.path.insert(0, REPO)
    from fornax_spark.fulltext import codec

    rng = np.random.default_rng(0)
    docs = np.sort(rng.choice(10_000_000, size=128, replace=False)).astype(np.int64)
    tfs = rng.integers(1, 50, size=128).astype(np.int64)
    s = 0
    for _ in range(n_blocks):
        b1 = codec.delta_encode_docids(docs)
        b2 = codec.encode_counts(tfs)
        s += len(codec.delta_decode_docids(b1, 128)) + len(
            codec.decode_counts(b2, 128)
        )
    return s


def mem_control(workers_a: int = 4, workers_b: int = 16,
                blocks: int = 3000) -> float:
    """Codec-matched host control (VERDICT r3 item 2): how much of ideal
    scaling the MACHINE delivers for the encode kernel's own
    numpy/memory-bound instruction mix between the two busy-thread
    counts the 2→8 Spark comparison actually exercises (~2 busy threads
    per encode task: JVM + Arrow python worker). A ceiling here is a
    HOST property — the identical per-worker work runs with no Spark,
    no shuffle, no shared JVM heap."""
    import multiprocessing as mp
    import time as _t

    def rate(workers: int) -> float:
        t0 = _t.time()
        with mp.Pool(workers) as p:
            p.map(_codec_burn, [blocks] * workers)
        return workers * blocks / (_t.time() - t0)

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
        "--gate-control", type=float, default=0.0,
        help="with --one-level: wait (up to 5 tries, 20 s apart) until "
        "the adjacent pure-CPU control reaches this efficiency before "
        "launching the worker; all attempts are published in the row",
    )
    ap.add_argument(
        "--gen-only", action="store_true",
        help="only materialize the corpus at --pages and exit",
    )
    ap.add_argument(
        "--mem-control", action="store_true",
        help="run the codec-matched memory-bound host control (4 vs 16 "
        "workers) once and print its efficiency-of-ideal",
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

    if args.mem_control:
        print(json.dumps({
            "codec_mem_control_4_16": round(mem_control(4, 16), 3),
            "cpu_control_2_8": round(cpu_control(), 3),
        }))
        return

    if args.one_level is not None:
        seg_root = "/dev/shm" if os.path.isdir("/dev/shm") else None
        row = run_level(
            args.one_level, args.pages,
            tempfile.mkdtemp(prefix="fornax_seg1_", dir=seg_root) + "/",
            gate_control=args.gate_control,
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
            args.low, pages_path, os.path.join(seg_root, f"fx_seg_lo{rep}_"),
            gate_control=args.gate_control,
        )
        hi_r = run_level(
            args.high, pages_path, os.path.join(seg_root, f"fx_seg_hi{rep}_"),
            gate_control=args.gate_control,
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
                "query_batch1k_secs",
                "build_task_secs", "build_cpu_secs", "build_gc_secs",
                "segment_task_secs", "segment_cpu_secs", "segment_gc_secs",
                "query_task_secs", "query_cpu_secs", "query_gc_secs",
                "query1k_task_secs", "query1k_cpu_secs",
                "query1k_gc_secs"]

    def best_per_metric(reps: list[dict]) -> dict:
        out = dict(reps[0])
        for k in rate_keys:
            vals = [r[k] for r in reps if k in r]
            if vals:
                out[k] = max(vals)
        for k in sec_keys:
            vals = [r[k] for r in reps if k in r]
            if vals:
                out[k] = min(vals)
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

    # task-time decomposition (VERDICT r3 item 2, option b): engine WORK
    # scaling — total executor task wall ("task") and thread CPU time
    # ("cpu") at low vs high parallelism. A ratio near 1.0 means
    # quadrupling parallelism adds no serial/duplicated engine work; any
    # wall-clock efficiency shortfall is then host thread-crowding
    # (documented by the adjacent pure-CPU controls), not plan shape.
    # CPU time is host-stall-immune: steal time never enters thread CPU
    # time, and Spark measures it per task regardless of scheduling.
    work = {}
    for label, lo_k, hi_k in [
        ("index_build", "build", "build"),
        ("segment_build", "segment", "segment"),
        ("query_batch", "query", "query"),
        ("query_batch_1k", "query1k", "query1k"),
    ]:
        tl, th = lo.get(f"{lo_k}_task_secs"), hi.get(f"{hi_k}_task_secs")
        cl, ch = lo.get(f"{lo_k}_cpu_secs"), hi.get(f"{hi_k}_cpu_secs")
        if None not in (tl, th) and th:
            work[f"work_scaling_task_{label}"] = round(tl / th, 3)
        if None not in (cl, ch) and ch:
            work[f"work_scaling_cpu_{label}"] = round(cl / ch, 3)

    result = {
        "docs": args.docs,
        "reps": {"low": lo_reps, "high": hi_reps},
        "best_per_metric": {"low": lo, "high": hi},
        "scaling_efficiency_index_build": round(eff_build, 3),
        "scaling_efficiency_segment_build": round(eff_seg, 3),
        "scaling_efficiency_segment_encode_write": round(eff_encode, 3),
        "scaling_efficiency_qps": round(eff_qps, 3),
        "scaling_efficiency_qps_1k": round(eff_qps_1k, 3),
        **work,
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
