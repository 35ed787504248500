"""LSM-style segment merge: fold many segment stores into one.

Log-structured lifecycle (the Spark analogue of Lucene/Iceberg segment
compaction, and of the reference's registry-of-graphs model where
corpora accumulate under graph ids, /root/reference/fornax/model.py:10-31):

  * index builds append new stores (disjoint, newer documents);
  * deletes are TOMBSTONES (a doc_id set) applied at merge time — a
    posting-level merge cannot infer which terms an updated document
    lost, so replacement = tombstone old doc + ingest new doc;
  * merge = decode all stores' blocks back to a postings DataFrame
    (streaming mapInPandas, no per-group overhead), drop tombstoned
    postings, recompute df / corpus stats exactly, then RE-USE the
    build pipeline (segments.build_segments) to re-encode — so a merged
    store is bit-identical in behavior to a clean build over the union
    corpus (tests/test_merge.py) and inherits the resume ledger.

Scale: decode is a narrow map; the only shuffles are the term_stats
hash agg and the bucket repartition inside build_segments — the same
skew-safe shape as a fresh build.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from . import codec
from .build import index_from_postings
from .segments import SegmentStore, _load_ledger, _save_ledger, build_segments

_ID_POSTINGS_SCHEMA = "term_id int, doc_id long, tf long, dl long"


def blocks_to_postings(blocks: DataFrame, dictionary: DataFrame) -> DataFrame:
    """Decode segment blocks back into postings rows (narrow map), then
    restore term strings via the store's own dictionary (broadcast —
    term ids are store-local; a merge across stores must go back to the
    global key, the term string)."""

    def decode(batches):
        for pdf in batches:
            terms, ns, docs, tfs, dls = [], [], [], [], []
            for r in pdf.itertuples(index=False):
                n = int(r.n)
                docs.append(codec.delta_decode_docids(bytes(r.doc_blob), n))
                tfs.append(codec.decode_counts(bytes(r.tf_blob), n))
                dls.append(codec.decode_counts(bytes(r.dl_blob), n))
                terms.append(int(r.term_id))
                ns.append(n)
            if not terms:
                yield pd.DataFrame(
                    {
                        "term_id": pd.Series([], dtype="int32"),
                        "doc_id": pd.Series([], dtype="int64"),
                        "tf": pd.Series([], dtype="int64"),
                        "dl": pd.Series([], dtype="int64"),
                    }
                )
                continue
            yield pd.DataFrame(
                {
                    # one repeat over the whole Arrow batch — the per-
                    # block python work is just the blob decode calls
                    "term_id": np.repeat(
                        np.asarray(terms, dtype=np.int32),
                        np.asarray(ns, dtype=np.int64),
                    ),
                    "doc_id": np.concatenate(docs),
                    "tf": np.concatenate(tfs),
                    "dl": np.concatenate(dls),
                }
            )

    ids = blocks.select(
        "term_id", "n", "doc_blob", "tf_blob", "dl_blob"
    ).mapInPandas(decode, _ID_POSTINGS_SCHEMA)
    return ids.join(
        F.broadcast(dictionary.select("term_id", "term")), "term_id"
    ).select("term", "doc_id", "tf", "dl")


def merge_stores(
    spark: SparkSession,
    stores: list[SegmentStore],
    out_path: str,
    deleted_doc_ids: list[int] | None = None,
    block_size: int = codec.BLOCK_SIZE,
) -> SegmentStore:
    """Merge stores (disjoint doc sets) minus tombstones into out_path.

    Tombstones = explicit `deleted_doc_ids` plus every input store's own
    live-delete manifest (deletes.delete_docs) — a merge physically
    drops the masked postings and the merged store starts clean."""
    from .deletes import load_tombstones

    n_buckets = stores[0].n_buckets
    assert all(s.n_buckets == n_buckets for s in stores), "bucket layout must match"
    tomb_set = set(int(x) for x in (deleted_doc_ids or []))
    for s in stores:
        t = load_tombstones(s)
        if t is not None:
            tomb_set.update(int(x) for x in t.doc_ids)
    tomb = sorted(tomb_set)

    postings = None
    for s in stores:
        p = blocks_to_postings(s.blocks(spark), s.dictionary(spark))
        postings = p if postings is None else postings.unionByName(p)
    if tomb:
        postings = postings.filter(~F.col("doc_id").isin(tomb))

    # exact merged-corpus stats (disjoint stores: one dl per doc) — the
    # shared postings->index adapter, also the streamed-deltas entry
    idx = index_from_postings(postings)
    postings = idx.postings  # the persisted handle
    store = build_segments(
        spark, idx, out_path, n_buckets=n_buckets,
        block_size=block_size, group_size=n_buckets,
    )
    postings.unpersist()

    ledger = _load_ledger(out_path)
    ledger["merged_from"] = [s.path for s in stores]
    ledger["tombstones"] = len(tomb)
    _save_ledger(out_path, ledger)
    return store
