"""Positional-index bench: build + store + phrase/proximity query at a
600k-doc corpus, with the repo's standard host-control hygiene (gated
pre control, best-of post control, all attempts published).

Usage: python bench/positional_bench.py [--docs N] [--out PATH]

Phases (one JVM; controls run before it exists / after it stops):
  1. corpus gen (untimed) -> docs(doc_id, text) parquet on /dev/shm
  2. positional build + durable store write (timed; docs/sec, bytes)
  3. phrase / proximity / phrase-BM25 single-query latency (reps,
     p50/p95) and a sequential 20-phrase batch (QPS)
"""

from __future__ import annotations

import argparse
import json
import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from scaling import cpu_control  # noqa: E402

GATE = 0.95


def gated_control(max_tries: int = 8) -> tuple[float, list[float]]:
    attempts = [round(cpu_control(), 3)]
    while not (GATE <= attempts[-1] <= 2 - GATE) and len(attempts) < max_tries:
        time.sleep(20)
        attempts.append(round(cpu_control(), 3))
    return attempts[-1], attempts


def dir_bytes(path: str) -> int:
    total = 0
    for root, _, files in os.walk(path):
        for f in files:
            total += os.path.getsize(os.path.join(root, f))
    return total


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--docs", type=int, default=600_000)
    ap.add_argument("--out", default="bench/positional_bench.json")
    args = ap.parse_args()

    pre, pre_attempts = gated_control()

    from fornax_spark.fulltext.build import extract_udf
    from fornax_spark.fulltext.corpus import generate_pages_spark
    from fornax_spark.fulltext.positional import (
        open_positional_store,
        write_positional_store,
    )
    from fornax_spark.session import get_spark
    from pyspark.sql import functions as F

    spark = get_spark("positional-bench", cores=32, shuffle_partitions=32)
    spark.sparkContext.setLogLevel("ERROR")

    base = "/dev/shm/fornax_posbench"
    shutil.rmtree(base, ignore_errors=True)
    os.makedirs(base)
    try:
        # -- phase 1: corpus (untimed) ----------------------------------
        pages = generate_pages_spark(spark, args.docs, seed=42)
        docs_path = f"{base}/docs"
        pages.select(
            F.xxhash64("url").alias("doc_id"),
            extract_udf(F.col("html")).alias("text"),
        ).write.parquet(docs_path)
        docs = spark.read.parquet(docs_path)

        # -- phase 2: positional build + store write (timed) ------------
        t0 = time.time()
        store = write_positional_store(
            spark, docs, f"{base}/pos", n_partitions=32
        )
        build_secs = time.time() - t0
        store_bytes = dir_bytes(f"{base}/pos/postings")

        # postings count + raw positional payload size for the
        # compression ratio claim (8B doc + 4B/position + 8B dl naive)
        p = store.postings(spark)
        row = p.agg(
            F.count(F.lit(1)).alias("rows"),
            F.sum(F.size("positions")).alias("positions"),
        ).collect()[0]
        n_rows, n_positions = int(row["rows"]), int(row["positions"])
        raw_bytes = n_rows * 16 + n_positions * 4

        # -- phase 3: queries (timed) ------------------------------------
        opened = open_positional_store(f"{base}/pos")

        def run(kind: str, phrase: str, gap: int, reps: int = 5) -> dict:
            lat = []
            n = 0
            for _ in range(reps):
                t = time.time()
                if kind == "bm25":
                    n = len(opened.phrase_bm25_topk(spark, phrase, k=10).collect())
                else:
                    n = len(
                        opened.phrase_topk(
                            spark, phrase, k=10, max_gap=gap
                        ).collect()
                    )
                lat.append(time.time() - t)
            lat.sort()
            return {
                "phrase": phrase,
                "max_gap": gap,
                "hits": n,
                "p50_sec": round(lat[len(lat) // 2], 3),
                "min_sec": round(lat[0], 3),
                "all_secs": [round(x, 3) for x in lat],
            }

        # head terms are force-injected into >50% of docs (corpus.py), so
        # these phrases have real hit counts at any corpus size
        q_exact = run("plain", "term00000 term00001", 1)
        q_prox = run("plain", "term00000 term00001", 8)
        q_bm25 = run("bm25", "term00000 term00001", 1)
        # tail-of-Zipf phrase: selective terms -> the pushed `term IN`
        # filter prunes to a handful of row groups; the latency gap vs
        # the head-term phrase above is the store layout doing its job
        q_tail = run("plain", "term04000 term04500", 8)

        batch_phrases = [
            f"term{i:05d} term{j:05d}" for i, j in zip(range(10), range(1, 11))
        ] + [f"term{i:05d} term{j:05d}" for i, j in zip(range(10, 20), range(0, 10))]
        t0 = time.time()
        batch_hits = 0
        for ph in batch_phrases:
            batch_hits += len(
                opened.phrase_topk(spark, ph, k=10, max_gap=4).collect()
            )
        batch_secs = time.time() - t0

        # batched form: same 20 phrases in ONE plan (phrase_topk_batch)
        from fornax_spark.fulltext.positional import phrase_topk_batch

        t0 = time.time()
        batched_rows = phrase_topk_batch(
            spark, opened.postings(spark), batch_phrases, k=10, max_gap=4
        ).collect()
        batched_secs = time.time() - t0
        assert len(batched_rows) == batch_hits, (
            f"batched != sequential hit count: {len(batched_rows)} vs {batch_hits}"
        )
    finally:
        spark.stop()
        shutil.rmtree(base, ignore_errors=True)

    post_samples = [round(cpu_control(), 3) for _ in range(3)]
    out = {
        "metric": "positional_bench",
        "unit": "sec",
        "n_docs": args.docs,
        "host_control": pre,
        "host_control_attempts": pre_attempts,
        "host_control_post": max(post_samples),
        "host_control_post_samples": post_samples,
        "build_store_secs": round(build_secs, 2),
        "build_docs_per_sec": round(args.docs / build_secs, 1),
        "postings_rows": n_rows,
        "positions_total": n_positions,
        "store_bytes": store_bytes,
        "raw_positional_bytes": raw_bytes,
        "bytes_ratio_vs_raw": round(store_bytes / raw_bytes, 3),
        "phrase_exact": q_exact,
        "phrase_prox_gap8": q_prox,
        "phrase_tail_gap8": q_tail,
        "phrase_bm25": q_bm25,
        "batch20_gap4_secs": round(batch_secs, 2),
        "batch20_qps": round(len(batch_phrases) / batch_secs, 2),
        "batch20_total_hits": batch_hits,
        "batch20_one_plan_secs": round(batched_secs, 2),
        "batch20_one_plan_qps": round(len(batch_phrases) / batched_secs, 2),
    }
    line = json.dumps(out, sort_keys=True)
    print(line)
    with open(args.out, "w") as f:
        f.write(line + "\n")


if __name__ == "__main__":
    main()
