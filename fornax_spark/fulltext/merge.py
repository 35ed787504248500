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


def blocks_to_postings(
    blocks: DataFrame, dictionary: DataFrame, codec_mod=codec
) -> DataFrame:
    """Decode segment blocks back into postings rows (narrow map), then
    restore term strings via the store's own dictionary (broadcast —
    term ids are store-local; a merge across stores must go back to the
    global key, the term string). codec_mod: the codec module that
    WROTE this store's blobs (codec.get_codec(store.codec))."""

    def decode(batches):
        for pdf in batches:
            terms, ns, docs, tfs, dls = [], [], [], [], []
            for r in pdf.itertuples(index=False):
                n = int(r.n)
                docs.append(codec_mod.delta_decode_docids(bytes(r.doc_blob), n))
                tfs.append(codec_mod.decode_counts(bytes(r.tf_blob), n))
                dls.append(codec_mod.decode_counts(bytes(r.dl_blob), n))
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
    out_codec: str | None = None,
) -> SegmentStore:
    """Merge stores (disjoint doc sets) minus tombstones into out_path.

    Tombstones are STORE-LOCAL: each input store's own live-delete
    manifest (deletes.delete_docs) masks only THAT store's postings —
    so LSM replacement works (tombstone the old copy, ingest the new
    document in a later generation, merge). The explicit
    `deleted_doc_ids` apply to every store (caller intent: delete the
    document everywhere). A merge physically drops all masked postings
    and the merged store starts clean.

    Disjointness of LIVE documents is ENFORCED, not assumed: a live
    doc_id present in two stores would silently double-count df and
    ship two conflicting dl values through dropDuplicates — the
    reference surfaces duplicate ids as primary-key IntegrityErrors
    (/root/reference/fornax/api.py); here the merge raises ValueError.
    The check is one extra aggregation over the already-persisted
    decoded postings (src-tagged countDistinct)."""
    from .deletes import load_tombstones

    n_buckets = stores[0].n_buckets
    assert all(s.n_buckets == n_buckets for s in stores), "bucket layout must match"
    explicit = sorted(set(int(x) for x in (deleted_doc_ids or [])))
    n_tomb_total = len(explicit)

    def _masked(si: int, s: SegmentStore) -> DataFrame:
        nonlocal n_tomb_total
        p = blocks_to_postings(
            s.blocks(spark), s.dictionary(spark), codec.get_codec(s.codec)
        )
        t = load_tombstones(s)
        if t is not None and len(t.doc_ids):
            own = sorted(int(x) for x in t.doc_ids)
            n_tomb_total += len(own)
            p = p.filter(~F.col("doc_id").isin(own))
        return p

    if len(stores) == 1:
        postings = _masked(0, stores[0])
        if explicit:
            postings = postings.filter(~F.col("doc_id").isin(explicit))
        # single-store merge (compaction): the shared postings->index
        # adapter, also the streamed-deltas entry point
        idx = index_from_postings(postings)
        postings = idx.postings  # the persisted handle
    else:
        from .build import CorpusStats, InvertedIndex, build_term_stats

        tagged = None
        for si, s in enumerate(stores):
            p = _masked(si, s).withColumn("src", F.lit(si))
            tagged = p if tagged is None else tagged.unionByName(p)
        if explicit:
            tagged = tagged.filter(~F.col("doc_id").isin(explicit))
        postings = tagged.persist()
        chk = postings.agg(
            F.countDistinct("doc_id").alias("d"),
            F.countDistinct("src", "doc_id").alias("sd"),
        ).collect()[0]
        if int(chk["d"]) != int(chk["sd"]):
            overlap = int(chk["sd"]) - int(chk["d"])
            postings.unpersist()
            raise ValueError(
                f"merge_stores: {overlap} live doc_id(s) present in more "
                "than one input store — stores must hold disjoint "
                "documents (tombstone the stale copy first)"
            )
        row = (
            postings.dropDuplicates(["doc_id"])
            .agg(F.count(F.lit(1)).alias("n"), F.sum("dl").alias("total"))
            .collect()[0]
        )
        n = int(row["n"]) or 0
        body = postings.select("term", "doc_id", "tf", "dl")
        idx = InvertedIndex(
            postings=body,
            term_stats=build_term_stats(body),
            stats=CorpusStats(
                n_docs=n, avgdl=(float(row["total"]) / n) if n else 0.0
            ),
        )
    store = build_segments(
        spark, idx, out_path, n_buckets=n_buckets,
        block_size=block_size, group_size=n_buckets,
        # a compaction keeps the inputs' codec by default (inputs may
        # mix codecs — decode always goes store-by-store above — so the
        # default follows the first store; pass out_codec to transcode)
        codec=out_codec if out_codec is not None else stores[0].codec,
    )
    postings.unpersist()

    ledger = _load_ledger(out_path)
    ledger["merged_from"] = [s.path for s in stores]
    ledger["tombstones"] = n_tomb_total
    _save_ledger(out_path, ledger)
    return store
