"""Sandbox-max scale capture (VERDICT r6 item 1): the full pipeline —
distributed corpus generation -> index build -> segment store (varint
AND pfor) -> bucketed publish -> 1k-query batch + single-query latency
— at millions of documents on local[32], with the standard host
controls embedded in the artifact.

This is the strongest in-sandbox test of the 100 TB design claims: it
exercises the vocabulary-sized driver/broadcast structures at the
largest corpus this box holds, measures the carry-df fallback (the
past-the-gate build mode) at real data volume, and publishes docs/sec,
store bytes, vocabulary size, dictionary-broadcast bytes, p50/p95 and
QPS alongside the control readings that certify the window.

The reference's own scale goal is "millions of nodes and edges"
(/root/reference/docs/guide.rst:53) — this meets it literally.

Usage:  python bench/scale_capture.py [--docs 10000000] [--cores 32]
Writes: bench/scale_10m.json and prints one JSON line.
"""

from __future__ import annotations

import argparse
import json
import os
import shutil
import subprocess
import sys
import time
import urllib.request

BENCH_DIR = os.path.dirname(os.path.abspath(__file__))
REPO = os.path.dirname(BENCH_DIR)
sys.path.insert(0, REPO)
sys.path.insert(0, BENCH_DIR)

# Memory budget (125 GB box, learned the hard way — an 88g heap run
# was OOM-killed at the publish rewrite and a 64g run at the third
# consecutive segment build, both with JVM anon-rss ~100 GB):
#   * heap 48g — enough for the biggest single phase (the 64-bucket
#     encode sort over 845M postings) once the postings HEAP CACHE is
#     replaced by a parquet spill (below); everything above real need
#     is RAM the tmpfs working set (pages + stores + shuffle files,
#     ~30 GB peak) can't use.
#   * MaxDirectMemorySize=8g — the silent killer: it DEFAULTS to Xmx,
#     so a 64g heap licenses another 64g of netty/Arrow direct
#     buffers on top. 8g is ~8x the worst concurrent Arrow batch set
#     (32 tasks x ~10 MB) observed here.
#   * MALLOC_ARENA_MAX=2 — glibc per-thread arenas otherwise retain
#     native (zstd/lz4/snappy) scratch across 32+ JVM threads.
os.environ.setdefault("SPARK_GRAFT_DRIVER_MEM", "48g")
os.environ.setdefault("MALLOC_ARENA_MAX", "2")


def _gated_control(gate: float = 0.95, max_tries: int = 8):
    from scaling import cpu_control

    attempts = [round(cpu_control(), 3)]
    while not (gate <= attempts[-1] <= 2 - gate) and len(attempts) < max_tries:
        time.sleep(20)
        attempts.append(round(cpu_control(), 3))
    return attempts[-1], attempts


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--docs", type=int, default=10_000_000)
    ap.add_argument("--cores", type=int, default=32)
    ap.add_argument("--out", default=os.path.join(BENCH_DIR, "scale_10m.json"))
    args = ap.parse_args()

    host_control, control_attempts = _gated_control()

    from fornax_spark.fulltext.build import build_index
    from fornax_spark.fulltext.corpus import (
        generate_pages_spark,
        reference_queries,
    )
    from fornax_spark.fulltext.segments import (
        as_bucketed_table,
        build_segments,
        open_segments,
    )
    from fornax_spark.fulltext.wand import search_segments, search_segments_batch
    from fornax_spark.session import get_spark

    spark = get_spark(
        "scale-capture",
        cores=args.cores,
        shuffle_partitions=2 * args.cores,
        extra_conf={
            # UI on: the REST stage API supplies sum-of-task-time and
            # executor CPU per section — host-stall-immune evidence
            "spark.ui.enabled": "true",
            "spark.ui.retainedStages": "10000",
            # at this corpus size the generated parquet has real row
            # groups; the 8 MB test-scale split default would make
            # ~2000 tiny partitions of the pages scan
            "spark.sql.files.maxPartitionBytes": str(64 * 1024 * 1024),
            # see the memory-budget note at the top of this file
            "spark.driver.extraJavaOptions": "-XX:MaxDirectMemorySize=8g",
            "spark.ui.showConsoleProgress": "false",
        },
    )

    def stage_totals():
        base = spark.sparkContext.uiWebUrl
        apps = json.load(urllib.request.urlopen(base + "/api/v1/applications"))
        app_id = apps[0]["id"]
        stages = json.load(
            urllib.request.urlopen(
                base + f"/api/v1/applications/{app_id}/stages?status=complete"
            )
        )
        return (
            sum(s.get("executorRunTime", 0) for s in stages) / 1e3,
            sum(s.get("executorCpuTime", 0) for s in stages) / 1e9,
            sum(s.get("jvmGcTime", 0) for s in stages) / 1e3,
        )

    def timed(fn):
        r0, c0, g0 = stage_totals()
        t0 = time.time()
        ret = fn()
        secs = time.time() - t0
        r1, c1, g1 = stage_totals()
        return secs, round(r1 - r0, 1), round(c1 - c0, 1), round(g1 - g0, 1), ret

    shm = "/dev/shm/scale_capture"
    shutil.rmtree(shm, ignore_errors=True)
    os.makedirs(shm, exist_ok=True)
    pages_path = os.path.join(shm, "pages")

    out: dict = {
        "metric": "scale_capture",
        "unit": "sec",
        "n_docs": args.docs,
        "cores": args.cores,
        "host_control": host_control,
        "host_control_attempts": control_attempts,
    }

    # --- corpus generation (distributed; informational — a real
    # deployment reads WARC/parquet that already exists) ---------------
    gen_parts = max(args.cores * 4, args.docs // 50_000)
    gen_secs, *_ = timed(
        lambda: generate_pages_spark(
            spark, args.docs, partitions=gen_parts
        ).write.parquet(pages_path)
    )
    def tree_bytes(path):
        return sum(
            os.path.getsize(os.path.join(r, f))
            for r, _d, fs in os.walk(path)
            for f in fs
        )

    pages_bytes = tree_bytes(pages_path)
    out["gen_secs"] = round(gen_secs, 1)
    out["pages_bytes"] = pages_bytes
    print(f"# generated {args.docs} docs, {pages_bytes/1e9:.1f} GB "
          f"in {gen_secs:.0f}s", file=sys.stderr)

    pages = spark.read.parquet(pages_path)

    # warm-up (untimed): python UDF workers + codegen on every core
    warm = build_index(spark, pages.limit(3200).repartition(args.cores))
    warm.term_stats.count()
    warm.postings.unpersist()

    # --- index build (single rep: ~N/5000 sec; task/cpu totals published
    # so a host stall is distinguishable from real cost) ----------------
    build_secs, b_task, b_cpu, b_gc, idx = timed(
        lambda: build_index(spark, pages, from_html=True)
    )
    n_postings = idx.postings.count()
    out.update(
        build_secs=round(build_secs, 1),
        docs_per_sec=round(args.docs / build_secs, 1),
        postings=n_postings,
        postings_per_sec=round(n_postings / build_secs, 1),
        build_task_secs=b_task,
        build_cpu_secs=b_cpu,
        build_gc_secs=b_gc,
    )
    print(f"# index: {build_secs:.0f}s, {args.docs/build_secs:.0f} docs/s, "
          f"{n_postings} postings", file=sys.stderr)

    # Spill postings to parquet and DROP the ~15 GB heap cache: every
    # downstream phase (three segment builds + publish + queries) reads
    # the spill instead, so the heap stays execution-sized for the
    # encode sorts. This is also the natural cluster shape — between
    # pipeline stages the postings table IS a parquet/Iceberg table,
    # not a cross-job executor cache.
    from fornax_spark.fulltext.build import InvertedIndex, build_term_stats

    postings_path = os.path.join(shm, "postings")
    spill_secs, *_sp, _ = timed(
        lambda: idx.postings.write.parquet(postings_path)
    )
    idx.postings.unpersist()
    postings_df = spark.read.parquet(postings_path)
    idx = InvertedIndex(
        postings=postings_df,
        term_stats=build_term_stats(postings_df).persist(),
        stats=idx.stats,
    )
    out["postings_spill_secs"] = round(spill_secs, 1)
    out["postings_parquet_bytes"] = tree_bytes(postings_path)
    # pages are never read again past this point — 9 GB of tmpfs back
    shutil.rmtree(pages_path, ignore_errors=True)

    # --- segment store, varint (the default production form) ----------
    seg_v = os.path.join(shm, "seg_varint")
    segv_secs, sv_task, sv_cpu, sv_gc, store = timed(
        lambda: build_segments(spark, idx, seg_v, n_buckets=64)
    )
    with open(os.path.join(seg_v, "ledger.json")) as f:
        led = json.load(f)
    out.update(
        segment_build_secs=round(segv_secs, 1),
        segment_docs_per_sec=round(args.docs / segv_secs, 1),
        segment_dict_secs=led.get("dict_secs"),
        segment_task_secs=sv_task,
        segment_cpu_secs=sv_cpu,
        segment_gc_secs=sv_gc,
        store_bytes_varint=led.get("bytes_compressed_total"),
        bytes_raw_postings=n_postings * 24,
        parquet_codec=led.get("parquet_codec"),
        vocab_terms=led.get("vocab_terms"),
        df_attach=led.get("df_attach"),
        # the two vocabulary-sized broadcast payloads the gate bounds:
        # the dense term_id->df int64 array and the (term, term_id)
        # broadcast join side (~40 B/term incl. string)
        dict_broadcast_bytes=8 * int(led.get("vocab_terms", 0)),
    )
    print(f"# segments varint: {segv_secs:.0f}s, vocab "
          f"{led.get('vocab_terms')}, {led.get('bytes_compressed_total', 0)/1e9:.2f} GB",
          file=sys.stderr)

    # 1k-query batch set, reused by the pfor and bucketed query phases
    import pandas as pd

    q1 = reference_queries()
    mult = max(1, 1000 // len(q1))
    q1k = pd.concat(
        [q1.assign(query_id=q1["query_id"] + i * len(q1)) for i in range(mult)],
        ignore_index=True,
    )

    # --- pfor codec store: same index, bit-packed postings -------------
    seg_p = os.path.join(shm, "seg_pfor")
    segp_secs, *_rest2, pstore = timed(
        lambda: build_segments(spark, idx, seg_p, n_buckets=64, codec="pfor")
    )
    with open(os.path.join(seg_p, "ledger.json")) as f:
        led_p = json.load(f)
    lat_p = []
    for _ in range(2):
        t0 = time.time()
        search_segments_batch(spark, pstore, q1k).count()
        lat_p.append(time.time() - t0)
    out.update(
        segment_build_pfor_secs=round(segp_secs, 1),
        store_bytes_pfor=led_p.get("bytes_compressed_total"),
        qps_1k_pfor=round(len(q1k) / min(lat_p), 1),
    )
    shutil.rmtree(seg_p, ignore_errors=True)
    print(f"# pfor: build {segp_secs:.0f}s, "
          f"{led_p.get('bytes_compressed_total', 0)/1e9:.2f} GB", file=sys.stderr)

    # --- carry-df fallback at scale: the past-the-gate build mode ------
    # (the corpus family's vocabulary is bounded at ~5k terms so the 64M
    # gate never trips naturally; forcing it measures the fallback's
    # real cost — the extra term-string shuffle join + 8 B/row wider
    # layout exchange — at the largest data volume this box holds)
    seg_c = os.path.join(shm, "seg_carry")
    segc_secs, *_rest3, cstore = timed(
        lambda: build_segments(
            spark, idx, seg_c, n_buckets=64, vocab_broadcast_max_terms=0
        )
    )
    with open(os.path.join(seg_c, "ledger.json")) as f:
        led_c = json.load(f)
    assert led_c.get("df_attach") == "carry", led_c
    out.update(
        segment_build_carry_secs=round(segc_secs, 1),
        carry_vs_broadcast_ratio=round(segc_secs / segv_secs, 3),
    )
    shutil.rmtree(seg_c, ignore_errors=True)
    print(f"# carry-mode: {segc_secs:.0f}s "
          f"({segc_secs/segv_secs:.2f}x broadcast mode)", file=sys.stderr)

    # builds done: the postings spill and its term_stats cache are no
    # longer needed — the publish/query phases read only store files
    idx.term_stats.unpersist()
    shutil.rmtree(postings_path, ignore_errors=True)

    # --- bucketed publish (the 100 TB query form) ----------------------
    pub_secs, *_rest, bstore = timed(
        lambda: as_bucketed_table(spark, store, "scale_capture_tbl")
    )
    out["publish_secs"] = round(pub_secs, 1)

    # --- queries -------------------------------------------------------
    # bucketed 1k batch, best-of-2 (per-rep decode caches are per-task;
    # rep 2 measures the same cold path — best-of filters host stalls)
    lat = []
    for _ in range(2):
        t0 = time.time()
        search_segments_batch(spark, bstore, q1k).count()
        lat.append(time.time() - t0)
    out["query_batch1k_secs"] = round(min(lat), 2)
    out["qps_1k_bucketed"] = round(len(q1k) / min(lat), 1)

    # single-query latency (p50/p95), plain then dict-cached serving.
    # At 10M terms load_term_cache DECLINES (4M-term gate) — the
    # artifact records the gate doing its job at the scale it's for.
    def latencies(st):
        xs = []
        for qt in q1["query_text"].tolist()[:12]:
            t0 = time.time()
            search_segments(spark, st, qt, k=10).count()
            xs.append(time.time() - t0)
        xs.sort()
        return xs[len(xs) // 2], xs[min(len(xs) - 1, int(len(xs) * 0.95))]

    p50, p95 = latencies(bstore)
    out["query_p50_sec"] = round(p50, 3)
    out["query_p95_sec"] = round(p95, 3)
    cache_loaded = bstore.load_term_cache(spark)
    out["term_cache_loaded"] = bool(cache_loaded)
    if cache_loaded:
        p50c, p95c = latencies(bstore)
        out["query_p50_dictcached_sec"] = round(p50c, 3)
        out["query_p95_dictcached_sec"] = round(p95c, 3)
    print(f"# queries: qps_1k {out['qps_1k_bucketed']}, p95 {p95:.3f}s",
          file=sys.stderr)

    spark.sql("DROP TABLE IF EXISTS scale_capture_tbl")
    spark.stop()
    shutil.rmtree(shm, ignore_errors=True)

    # --- post control: fresh interpreter, best-closest-to-1 of 3 -------
    try:
        probe = subprocess.run(
            [
                sys.executable,
                "-c",
                "import sys; sys.path.insert(0, %r); import json; "
                "from scaling import cpu_control; "
                "print(json.dumps([cpu_control() for _ in range(3)]))"
                % BENCH_DIR,
            ],
            capture_output=True,
            text=True,
            timeout=600,
        )
        samples = json.loads(probe.stdout.strip().splitlines()[-1])
        out["host_control_post"] = round(min(samples, key=lambda c: abs(1 - c)), 3)
        out["host_control_post_samples"] = [round(c, 3) for c in samples]
    except Exception as e:  # noqa: BLE001
        out["host_control_post"] = None
        out["host_control_post_error"] = str(e)[:300]

    with open(args.out, "w") as f:
        json.dump(out, f, indent=1, sort_keys=True)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
