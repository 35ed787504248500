"""Dense-leg (batch cosine) bench: N embeddings scanned ONCE for a
64-query exact cosine top-depth batch (similarity.cosine_topk_batch),
vs the single-query cosine_topk, with the repo's standard host-control
hygiene.

Usage: python bench/dense_bench.py [--rows N] [--dim D] [--out PATH]
       [--cores C] [--reps R]

Scaling-pair mode (north rule): run twice on the SAME generated
parquet (written once, keyed by rows/dim, partitions fixed at 32 so
engine work is identical across levels) with --cores 2 and --cores 8;
efficiency = (t_2 / t_8) / 4 on p50s. The kernel is a matmul-shaped
Arrow scan — the closest thing this engine has to a pure-CPU
embarrassingly-parallel verb.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import numpy as np  # noqa: E402

from serving_bench import gated_control  # noqa: E402
from scaling import cpu_control  # noqa: E402


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--rows", type=int, default=500_000)
    ap.add_argument("--dim", type=int, default=64)
    ap.add_argument("--queries", type=int, default=64)
    ap.add_argument("--depth", type=int, default=50)
    ap.add_argument("--cores", type=int, default=32)
    ap.add_argument("--reps", type=int, default=5)
    ap.add_argument("--out", default="bench/dense_bench.json")
    args = ap.parse_args()

    pre, pre_attempts = gated_control()

    from fornax_spark.operators.similarity import cosine_topk, cosine_topk_batch
    from fornax_spark.session import get_spark

    spark = get_spark(
        "dense-bench", cores=args.cores, shuffle_partitions=args.cores
    )
    spark.sparkContext.setLogLevel("ERROR")

    path = f"/dev/shm/fornax_dense_{args.rows}_{args.dim}"
    if not os.path.exists(path):
        # deterministic distributed gen: per-row rng seeded by vec_id,
        # written ONCE and reused by every parallelism level
        import pandas as pd

        def gen(batches):
            for pdf in batches:
                ids = pdf["id"].to_numpy()
                vecs = [
                    np.random.default_rng(int(i)).standard_normal(
                        args.dim
                    ).astype(np.float32).tolist()
                    for i in ids
                ]
                yield pd.DataFrame({"vec_id": ids, "embedding": vecs})

        spark.range(args.rows, numPartitions=32).mapInPandas(
            gen, "vec_id long, embedding array<float>"
        ).write.parquet(path)
    emb = spark.read.parquet(path)

    qrng = np.random.default_rng(4242)
    qvecs = [
        [float(x) for x in qrng.standard_normal(args.dim)]
        for _ in range(args.queries)
    ]

    timings: dict = {"rows": args.rows, "dim": args.dim}

    def run(name, fn, reps=args.reps):
        lat = []
        n = 0
        for _ in range(reps):
            t = time.time()
            n = len(fn().collect())
            lat.append(time.time() - t)
        lat.sort()
        timings[name] = {
            "rows_out": n,
            "p50_sec": round(lat[len(lat) // 2], 3),
            "min_sec": round(lat[0], 3),
            "all_secs": [round(x, 3) for x in lat],
        }

    run(
        f"cosine_batch{args.queries}",
        lambda: cosine_topk_batch(emb, qvecs, depth=args.depth),
    )
    run("cosine_single", lambda: cosine_topk(emb, qvecs[0], k=args.depth))
    spark.stop()

    post_samples = [round(cpu_control(), 3) for _ in range(3)]
    out = {
        "metric": "dense_bench",
        "unit": "sec",
        "cores": args.cores,
        "n_queries": args.queries,
        "depth": args.depth,
        "host_control": pre,
        "host_control_attempts": pre_attempts,
        "host_control_post": max(post_samples),
        "host_control_post_samples": post_samples,
        **timings,
    }
    with open(args.out, "w") as f:
        json.dump(out, f, indent=1, sort_keys=True)
    print(json.dumps(out, sort_keys=True))


if __name__ == "__main__":
    main()
