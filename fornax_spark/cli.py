"""spark-submit entrypoints.

Packaging (north rule: "ships via spark-submit --py-files to a
multi-executor cluster"):

    cd /root/repo && zip -r /tmp/fornax_spark.zip fornax_spark
    spark-submit --py-files /tmp/fornax_spark.zip \
        fornax_spark/cli.py build --pages s3://corpus/pages \
        --out s3://index/v1 --buckets 4096

In local mode the same commands run as plain `python -m fornax_spark.cli`.
Subcommands:
    gen-corpus  --docs N --out PATH          deterministic synthetic pages
    build       --pages PATH --out PATH      index -> compressed segments
                [--buckets 64] [--group-size N]
                (re-running resumes implicitly: done groups are skipped;
                 a layout/corpus mismatch wipes the store and rebuilds)
    query       --index PATH --q "terms"     top-k via block-max kernel
                [--k 10] [--exhaustive]
    delete      --index PATH --ids FILE      live tombstone delete (one
                                             doc_id per line); queries
                                             exclude the docs immediately
    merge       --out PATH store1 store2...  LSM compaction
                [--tombstones FILE]          (one doc_id per line)
"""

from __future__ import annotations

import argparse
import json
import sys
import time


def main(argv: list[str] | None = None) -> int:
    ap = argparse.ArgumentParser(prog="fornax_spark")
    sub = ap.add_subparsers(dest="cmd", required=True)

    g = sub.add_parser("gen-corpus")
    g.add_argument("--docs", type=int, required=True)
    g.add_argument("--out", required=True)
    g.add_argument("--seed", type=int, default=42)
    g.add_argument("--partitions", type=int, default=64)

    b = sub.add_parser("build")
    b.add_argument("--pages", required=True)
    b.add_argument("--out", required=True)
    b.add_argument("--buckets", type=int, default=64)
    b.add_argument(
        "--group-size", type=int, default=None,
        help="buckets per resume checkpoint (default: all in one job)",
    )
    b.add_argument(
        "--codec", default="varint", choices=["varint", "pfor"],
        help="posting-block codec (recorded in the store ledger)",
    )

    q = sub.add_parser("query")
    q.add_argument("--index", required=True)
    q.add_argument("--q", required=True)
    q.add_argument("--k", type=int, default=10)
    q.add_argument("--exhaustive", action="store_true")

    d = sub.add_parser("delete")
    d.add_argument("--index", required=True)
    d.add_argument("--ids", required=True)

    m = sub.add_parser("merge")
    m.add_argument("--out", required=True)
    m.add_argument("stores", nargs="+")
    m.add_argument("--tombstones", default=None)

    args = ap.parse_args(argv)

    from .session import get_spark

    spark = get_spark(f"fornax-{args.cmd}")

    if args.cmd == "gen-corpus":
        from .fulltext.corpus import generate_pages, pages_to_spark

        pages_to_spark(
            spark, generate_pages(args.docs, seed=args.seed), args.partitions
        ).write.mode("overwrite").parquet(args.out)
        print(json.dumps({"docs": args.docs, "out": args.out}))

    elif args.cmd == "build":
        from .fulltext.build import build_index
        from .fulltext.segments import build_segments

        t0 = time.time()
        idx = build_index(spark, spark.read.parquet(args.pages))
        store = build_segments(
            spark, idx, args.out, n_buckets=args.buckets,
            group_size=args.group_size, codec=args.codec,
        )
        secs = time.time() - t0
        print(
            json.dumps(
                {
                    "n_docs": store.n_docs,
                    "avgdl": store.avgdl,
                    "buckets": store.n_buckets,
                    "secs": round(secs, 2),
                    "docs_per_sec": round(store.n_docs / secs, 1),
                }
            )
        )

    elif args.cmd == "query":
        from .fulltext.segments import open_segments
        from .fulltext.wand import search_segments

        store = open_segments(args.index)
        t0 = time.time()
        rows = search_segments(
            spark, store, args.q, k=args.k, prune=not args.exhaustive
        ).collect()
        print(
            json.dumps(
                {
                    "query": args.q,
                    "secs": round(time.time() - t0, 3),
                    "hits": [
                        {"rank": r["rank"], "doc_id": r["doc_id"], "score": r["score"]}
                        for r in rows
                    ],
                }
            )
        )

    elif args.cmd == "delete":
        from .fulltext.deletes import delete_docs
        from .fulltext.segments import open_segments

        with open(args.ids) as f:
            ids = [int(line) for line in f if line.strip()]
        t = delete_docs(spark, open_segments(args.index), ids)
        print(
            json.dumps(
                {
                    "tombstoned": len(t.doc_ids),
                    "docs_removed": t.n_deleted,
                    "n_docs_effective": t.n_docs_new,
                }
            )
        )

    elif args.cmd == "merge":
        from .fulltext.merge import merge_stores
        from .fulltext.segments import open_segments

        tomb = None
        if args.tombstones:
            with open(args.tombstones) as f:
                tomb = [int(line) for line in f if line.strip()]
        stores = [open_segments(p) for p in args.stores]
        merged = merge_stores(spark, stores, args.out, deleted_doc_ids=tomb)
        print(json.dumps({"n_docs": merged.n_docs, "out": args.out}))

    spark.stop()
    return 0


if __name__ == "__main__":
    sys.exit(main())
