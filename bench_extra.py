"""Round-8 optimization harness (separate from the FROZEN bench.py).

Times individual headline entries with the noop sink (guide §1.4) so the
computation is measured without sink effects, labels jobs (§1.5), and
dumps `.explain("formatted")` for each entry to plans/r08/.

Usage:
    python bench_extra.py [entry ...]            # default: all headline
    SPARK_GRAFT_SF_DIR=/root/testdata/sf1.0 python bench_extra.py ngram_jaccard_pairs
    PLAN_TAG=before python bench_extra.py --plans-only   # just dump plans
"""

from __future__ import annotations

import json
import os
import sys
import time

os.environ.setdefault("SPARK_GRAFT_SF_DIR", "/root/testdata/sf1.0")
SF_DIR = os.environ["SPARK_GRAFT_SF_DIR"]
PLAN_TAG = os.environ.get("PLAN_TAG", "")
REPS = int(os.environ.get("BENCH_EXTRA_REPS", "2"))

HEADLINE = [
    "ft_bm25_topk",
    "ft_postings",
    "q1_pricing_summary",
    "q3_shipping_priority",
    "q5_region_revenue",
    "top3_orders_per_customer",
    "sessionize_events",
    "token_count",
    "quality_score",
    "dedup_exact",
    "ngram_jaccard_pairs",
    "minhash_pairs",
    "simhash_pairs",
    "ann_cosine_topk",
    "ann_lsh_topk",
    "ann_ivf_topk",
    "emb_similar_pairs",
    "json_meta_extract",
    "nema_topn",
]


def main() -> None:
    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    import __spark_entry__ as entry_mod
    from fornax_spark.session import get_spark

    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    plans_only = "--plans-only" in sys.argv
    names = args or HEADLINE

    spark = get_spark("fornax-bench-extra")
    sc = spark.sparkContext
    qs = entry_mod.queries()

    # warm codegen/python workers on the tiny smoke corpus
    spark.read.parquet(f"{SF_DIR}/documents.parquet").count()

    plan_dir = os.path.join(os.path.dirname(os.path.abspath(__file__)), "plans", "r08")
    os.makedirs(plan_dir, exist_ok=True)

    timings: dict[str, float] = {}
    for name in names:
        df = qs[name](spark, SF_DIR)
        if PLAN_TAG:
            import contextlib
            import io

            buf = io.StringIO()
            with contextlib.redirect_stdout(buf):
                df.explain("formatted")
            with open(os.path.join(plan_dir, f"{name}_{PLAN_TAG}.txt"), "w") as f:
                f.write(buf.getvalue())
        if plans_only:
            print(f"plan dumped: {name}")
            continue
        best = None
        for rep in range(REPS):
            if name.startswith("ft_"):
                entry_mod.reset_ft_caches()
            df = qs[name](spark, SF_DIR)
            sc.setJobDescription(f"bench_extra:{name}:rep{rep}")
            t0 = time.time()
            df.write.format("noop").mode("overwrite").save()
            secs = time.time() - t0
            best = secs if best is None else min(best, secs)
            sc.setJobDescription(None)
        timings[name] = round(best, 3)
        print(f"{name}: {timings[name]}s", flush=True)
    if not plans_only:
        print(json.dumps({"sf_dir": SF_DIR, "timings": timings, "total": round(sum(timings.values()), 3)}))
    spark.stop()


if __name__ == "__main__":
    main()
