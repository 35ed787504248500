"""Standalone document deletes (S6): tombstones honored at query time,
without a full merge.

The reference deletes with cascading SQL statements
(/root/reference/fornax/api.py:327-345,637-647). A compressed segment
store can't cheaply rewrite blocks, so delete = write a TOMBSTONE
manifest; the query kernels then mask deleted docs out of decoded
blocks. Queries must stay EXACT (== a rebuild without the docs), so
BM25's corpus statistics have to shift too; one distributed pass over
the store at delete time collects everything needed:

  * per-term df deltas (#deleted docs among the term's postings,
    keyed by the store's term_id),
  * the deleted docs' total dl and count (for n_docs / avgdl).

Block-max metadata becomes stale under the shifted stats: deleting docs
RAISES idf (df' <= df) and can raise the tf component (if avgdl grows),
so a stale per-block max could under-estimate and break MaxScore
admission soundness. The kernels therefore scale each term's upper
bound by idf'(t)/idf(t) * max(1, avgdl'/avgdl) — a valid (slightly
loose) bound; "pruned == exhaustive == rebuilt store" is the test
invariant (tests/test_deletes.py).

The merge path (merge.py) consumes the manifest and physically drops
the postings, resetting the store to a tombstone-free state.
"""

from __future__ import annotations

import json
import os
from dataclasses import dataclass

import numpy as np
import pandas as pd
from pyspark.sql import SparkSession

from . import codec
from .segments import SegmentStore

TOMBSTONE_FILE = "tombstones.json"


@dataclass
class Tombstones:
    doc_ids: np.ndarray  # sorted int64
    df_deltas: dict[str, int]
    n_deleted: int  # docs actually present in the store
    dl_deleted: int
    n_docs_old: int
    avgdl_old: float

    @property
    def n_docs_new(self) -> int:
        return self.n_docs_old - self.n_deleted

    @property
    def avgdl_new(self) -> float:
        n = self.n_docs_new
        return (
            (self.avgdl_old * self.n_docs_old - self.dl_deleted) / n
            if n
            else 0.0
        )


def load_tombstones(store: SegmentStore) -> Tombstones | None:
    p = os.path.join(store.path, TOMBSTONE_FILE)
    if not os.path.exists(p):
        return None
    with open(p) as f:
        d = json.load(f)
    return Tombstones(
        doc_ids=np.array(sorted(d["doc_ids"]), dtype=np.int64),
        df_deltas=d["df_deltas"],
        n_deleted=d["n_deleted"],
        dl_deleted=d["dl_deleted"],
        n_docs_old=store.n_docs,
        avgdl_old=store.avgdl,
    )


def delete_docs(
    spark: SparkSession, store: SegmentStore, doc_ids: list[int]
) -> Tombstones:
    """Tombstone `doc_ids` in the live store (cumulative across calls).

    One column-pruned distributed pass over the store's blocks collects
    the per-term df deltas and the deleted docs' dl sum; the manifest
    write is atomic. Docs not present in the store are recorded in the
    mask but do not shift statistics."""
    prior = load_tombstones(store)
    prior_ids = set(int(x) for x in prior.doc_ids) if prior else set()
    req = set(int(x) for x in doc_ids)
    new_ids = np.array(sorted(req - prior_ids), dtype=np.int64)

    df_deltas: dict[str, int] = dict(prior.df_deltas) if prior else {}
    n_deleted = prior.n_deleted if prior else 0
    dl_deleted = prior.dl_deleted if prior else 0

    if len(new_ids):
        target = new_ids  # closure constant (small; broadcast with task)
        cmod = codec.get_codec(store.codec)  # the codec that wrote the blobs

        def scan(batches):
            # batched over the whole Arrow frame (the np.repeat pattern
            # from merge.blocks_to_postings): the only per-block Python
            # work is the blob decode calls; masking, per-term counting
            # and dl extraction run once over the concatenated batch
            for pdf in batches:
                if not len(pdf):
                    continue
                ns = pdf["n"].to_numpy(np.int64)
                docs = np.concatenate(
                    [
                        cmod.delta_decode_docids(bytes(b), int(n))
                        for b, n in zip(pdf["doc_blob"], ns)
                    ]
                )
                m = np.isin(docs, target)
                if not m.any():
                    continue
                dls = np.concatenate(
                    [
                        cmod.decode_counts(bytes(b), int(n))
                        for b, n in zip(pdf["dl_blob"], ns)
                    ]
                )
                term_rep = np.repeat(pdf["term_id"].to_numpy(np.int64), ns)
                hit_terms, cnts = np.unique(term_rep[m], return_counts=True)
                hit_docs = docs[m]
                hit_dls = dls[m]
                yield pd.DataFrame(
                    {
                        "kind": ["df"] * len(hit_terms)
                        + ["dl"] * len(hit_docs),
                        "term": [str(int(t)) for t in hit_terms]
                        + [""] * len(hit_docs),
                        "doc_id": np.concatenate(
                            [np.zeros(len(hit_terms), np.int64), hit_docs]
                        ),
                        "val": np.concatenate(
                            [cnts.astype(np.int64), hit_dls]
                        ),
                    }
                )

        from pyspark.sql import functions as F

        scan_df = (
            store.blocks(spark)
            .select("term_id", "n", "doc_blob", "dl_blob")
            .mapInPandas(scan, "kind string, term string, doc_id long, val long")
            .persist()
        )
        # per-term deltas: vocabulary-bounded rows reach the driver
        for r in (
            scan_df.filter(F.col("kind") == "df")
            .groupBy("term")
            .agg(F.sum("val").alias("delta"))
            .collect()
        ):
            df_deltas[r["term"]] = df_deltas.get(r["term"], 0) + int(r["delta"])
        # deleted-doc count + dl sum: one row (dl is identical in every
        # posting of a doc, so dedup by doc before summing)
        row = (
            scan_df.filter(F.col("kind") == "dl")
            .dropDuplicates(["doc_id"])
            .agg(F.count(F.lit(1)).alias("n"), F.sum("val").alias("dl"))
            .collect()[0]
        )
        scan_df.unpersist()
        n_deleted += int(row["n"] or 0)
        dl_deleted += int(row["dl"] or 0)

    manifest = {
        "doc_ids": sorted(req | prior_ids),
        "df_deltas": df_deltas,
        "n_deleted": n_deleted,
        "dl_deleted": dl_deleted,
    }
    p = os.path.join(store.path, TOMBSTONE_FILE)
    tmp = p + ".tmp"
    with open(tmp, "w") as f:
        json.dump(manifest, f)
    os.replace(tmp, p)
    return load_tombstones(store)
