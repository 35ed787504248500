"""Segment store: compressed posting blocks, document-sharded.

Layout (the scale design):
  * postings are DOCUMENT-SHARDED into `n_buckets` by the top bits of
    the (bias-mapped) doc_id — xxhash64 ids are uniform, so buckets are
    balanced by construction, and every bucket holds the COMPLETE
    postings of its documents for ALL terms. Query-time scoring is then
    embarrassingly parallel per bucket (mapInPandas over co-partitioned
    posting blocks feeding a distributed top-k reduce) — no query-time
    shuffle of the index at any scale.
  * within a bucket, postings of one term are sorted by doc_id and cut
    into blocks of 128: delta+varint doc ids, varint tf/dl, per-block
    exact max BM25 contribution (block-max, Ding & Suel SIGIR'11) and
    [first_doc, last_doc] fences for skip-reads.
  * head-term skew: a term's postings WITHIN a bucket are bounded by the
    bucket's doc count, and the (bucket, term) encode groups are split
    by doc-sharding — the classic Zipf hot-term problem lands on
    `n_buckets` independent groups instead of one. AQE handles residual
    imbalance.
  * files: parquet partitioned by bucket (partition pruning), rows
    sorted by term (row-group min/max stats prune term lookups).

Resumability (north rule): the build loops over bucket GROUPS; each
group is one atomic parquet write plus a ledger row (FIXTURES.md §3
schema) with docs/postings/bytes/secs metrics. Re-running skips groups
whose ledger row is `done` — the Spark analogue of the reference's
batched-offsets evaluation and its batched==unbatched equivalence test
(/root/reference/fornax/select.py:91-96, test/test_select.py:211-258).
"""

from __future__ import annotations

import json
import math
import os
import shutil
import time
from dataclasses import dataclass

import numpy as np
import pandas as pd
from dataclasses import field
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from . import bm25, codec
from .build import InvertedIndex
from .codec import get_codec

SEG_SCHEMA = (
    "bucket int, term_id int, block_id int, n int, df long, "
    "first_doc long, last_doc long, block_max double, "
    "doc_blob binary, tf_blob binary, dl_blob binary"
)

#: ledger format version — bumped when the on-disk layout changes so the
#: resume-mismatch check wipes stores written by an older code version
STORE_FORMAT = 2

_SIGN_BIT = -(1 << 63)  # XOR with this == order-preserving bias to uint64


def build_dictionary(term_stats: DataFrame) -> DataFrame:
    """Term dictionary: (term string, term_id int, df long) with ids
    assigned by ascending term — term_id order IS term order, so every
    ordering contract downstream (block sort, float-sum rank order)
    transfers to the 4-byte id unchanged.

    id = global rank of the term, computed WITHOUT a Python-serialized
    RDD pass (the old rdd.zipWithIndex pickled every vocabulary row
    through Python workers) and without a single-task global window:
      1. range-partition + sort the vocabulary by term, then PIN that
         layout with localCheckpoint — partition index order is range
         order, and pinning makes the two passes below read identical
         partitions (a silent recompute with different range bounds
         would corrupt the ids; with the checkpoint it can't happen);
      2. one tiny JVM agg: rows per partition -> driver-side prefix
         offsets (n_partitions entries);
      3. one Arrow pass (mapInPandas) assigning id = partition offset +
         row position. Vocabulary-sized; the postings never ride it."""
    spark = term_stats.sparkSession
    parallelism = spark.sparkContext.defaultParallelism
    ranged = (
        term_stats.select("term", "df")
        .repartitionByRange(parallelism, "term")
        .sortWithinPartitions("term")
        .localCheckpoint()
    )
    # pid is evaluated over the PINNED layout, so it names the range
    # partition (range order == partition index order) — ids derive from
    # the data itself, not from task layout, which keeps them correct
    # under the coalesce below (coalesce concatenates whole partitions
    # in order; each pid run stays contiguous and sorted).
    with_pid = ranged.select(
        F.spark_partition_id().alias("pid"), "term", "df"
    )
    counts = {
        int(r["pid"]): int(r["cnt"])
        for r in with_pid.groupBy("pid")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .collect()
    }
    offsets: dict[int, int] = {}
    acc = 0
    for pid in range(max(counts) + 1 if counts else 0):
        offsets[pid] = acc
        acc += counts.get(pid, 0)

    def assign(batches):
        seen: dict[int, int] = {}
        for pdf in batches:
            pids = pdf["pid"].to_numpy()
            ids = np.empty(len(pdf), dtype=np.int32)
            run_starts = np.flatnonzero(
                np.concatenate(([True], pids[1:] != pids[:-1]))
            )
            run_ends = np.append(run_starts[1:], len(pdf))
            for rs, re in zip(run_starts, run_ends):
                pid = int(pids[rs])
                base = offsets.get(pid, 0) + seen.get(pid, 0)
                ids[rs:re] = np.arange(base, base + (re - rs), dtype=np.int32)
                seen[pid] = seen.get(pid, 0) + (re - rs)
            yield pd.DataFrame(
                {
                    "term": pdf["term"],
                    "term_id": ids,
                    "df": pdf["df"].to_numpy(np.int64),
                }
            )

    # few LARGE dictionary files, not one tiny file per core: the
    # per-query term lookup is a pushed-filter scan whose cost at small
    # vocab is file-open/task overhead — 32 near-empty files measurably
    # tax single-query latency. ~4M terms/file keeps the file count
    # proportional to vocabulary size at web scale.
    n_files = min(parallelism, max(1, -(-acc // 4_000_000)))
    return with_pid.coalesce(n_files).mapInPandas(
        assign, "term string, term_id int, df long"
    )


def bucket_col(doc_id_col, n_buckets: int):
    """Doc-shard bucket = top log2(n_buckets) bits of biased doc id.

    n_buckets=1 is special-cased: the JVM masks shift amounts to the
    low 6 bits, so shiftrightunsigned(x, 64) would be a no-op instead
    of producing 0.
    """
    if n_buckets == 1:
        return F.lit(0)
    shift = 64 - int(math.log2(n_buckets))
    return F.shiftrightunsigned(
        doc_id_col.bitwiseXOR(F.lit(_SIGN_BIT)), shift
    ).cast("int")


def bucket_of_doc(doc_id: int, n_buckets: int) -> int:
    if n_buckets == 1:
        return 0
    shift = 64 - int(math.log2(n_buckets))
    return ((doc_id ^ (1 << 63)) & ((1 << 64) - 1)) >> shift


def bucket_of_docs_np(docs: np.ndarray, n_buckets: int) -> np.ndarray:
    """Vectorized bucket_of_doc over an int64 array (bit-reinterpret to
    uint64 == the JVM's biased unsigned shift; parity with bucket_col /
    bucket_of_doc is pinned in tests/test_segments.py). The encode
    kernel recomputes buckets from doc ids with this instead of
    shuffling a bucket column — the bucket is derived data, and the
    exchange is the encode path's measured scaling bottleneck."""
    if n_buckets == 1:
        return np.zeros(len(docs), dtype=np.int64)
    shift = 64 - int(math.log2(n_buckets))
    return (
        (docs.view(np.uint64) ^ np.uint64(1 << 63)) >> np.uint64(shift)
    ).astype(np.int64)


def _encoder(n_docs: int, avgdl: float, block_size: int, df_bcast,
             n_buckets: int, codec_mod=codec):
    """Streaming per-PARTITION encoder (mapInPandas).

    Input partitions are range-distributed by (bucket, term) and sorted
    by (bucket, term, doc_id); the kernel walks group boundaries with
    numpy and carries the trailing partial (bucket, term) run across
    Arrow batch boundaries. One python invocation per Arrow batch — NOT
    one per (bucket, term) group, which at web scale (10^5 terms x 10^3
    buckets) would pay the per-group pandas overhead ~10^8 times.

    Shuffle-width contract: rows arrive as (term_id, doc_id, tfdl) —
    tf and dl packed into ONE int64 ((tf<<32)|dl; both are bounded by
    document length << 2^31). Neither df NOR THE BUCKET is a shuffle
    column: term_ids are dense ranks, so per-term df rides in as
    `df_bcast` (a term_id-indexed int64 numpy array broadcast once per
    build), and the bucket is DERIVED data — top bits of the biased doc
    id — recomputed vectorized from doc_id on both sides (JVM
    partitioning expression / numpy in the kernel, bucket_of_docs_np).
    The exchange — the encode path's measured scaling bottleneck —
    carries 20 B/row instead of the naive 44.

    df_bcast=None switches to the past-the-broadcast-gate carry mode:
    rows arrive with a fourth `df` int64 column (28 B/row) and the
    kernel reads df from the rows instead of indexing the array.
    """

    def encode_stream(batches):
        carry: pd.DataFrame | None = None
        for pdf in batches:
            if carry is not None and len(carry):
                pdf = pd.concat([carry, pdf], ignore_index=True)
            if not len(pdf):
                carry = None
                continue
            # trailing (possibly incomplete) group = contiguous suffix
            # with the last row's (bucket, term_id)
            b = bucket_of_docs_np(pdf["doc_id"].to_numpy(np.int64), n_buckets)
            t = pdf["term_id"].to_numpy()
            last_b, last_t = b[-1], t[-1]
            in_tail = (b == last_b) & (t == last_t)
            # suffix start: first index from the end where in_tail flips
            flip = np.flatnonzero(~in_tail)
            tail_start = (flip[-1] + 1) if len(flip) else 0
            carry = pdf.iloc[tail_start:]
            body = pdf.iloc[:tail_start]
            if len(body):
                yield _encode_body(body, b[:tail_start])
        if carry is not None and len(carry):
            yield _encode_body(
                carry,
                bucket_of_docs_np(
                    carry["doc_id"].to_numpy(np.int64), n_buckets
                ),
            )

    def _encode_body(pdf: pd.DataFrame, b: np.ndarray) -> pd.DataFrame:
        n = len(pdf)
        terms = pdf["term_id"].to_numpy(np.int64)
        docs = pdf["doc_id"].to_numpy(np.int64)
        tfdl = pdf["tfdl"].to_numpy(np.int64)
        # carry-df fallback (vocabulary past the broadcast gate): df
        # arrived as a shuffle column instead of the broadcast array
        dfs = pdf["df"].to_numpy(np.int64) if df_bcast is None else None
        # rows arrive (bucket, term_id, doc_id)-sorted from the
        # repartitionByRange+sortWithinPartitions layout and the carry
        # logic preserves order — a pandas sort here re-paid ~60% of
        # the whole kernel (measured 510 of 872 ns/posting) for a
        # no-op. Verify the contract with one cheap vector pass and
        # lexsort only on violation (never in practice; belt+braces
        # for exotic callers).
        if n > 1:
            eq_b = b[1:] == b[:-1]
            eq_t = terms[1:] == terms[:-1]
            in_order = (
                (b[1:] > b[:-1])
                | (eq_b & (terms[1:] > terms[:-1]))
                | (eq_b & eq_t & (docs[1:] >= docs[:-1]))
            )
            if not in_order.all():
                order = np.lexsort((docs, terms, b))
                b = b[order]
                terms = terms[order]
                docs = docs[order]
                tfdl = tfdl[order]
                if dfs is not None:
                    dfs = dfs[order]
        tf = tfdl >> 32
        dl = tfdl & 0xFFFFFFFF
        if dfs is None:
            dfs = df_bcast.value[terms]

        # (bucket, term) group starts -> per-row offset within group ->
        # block starts every block_size rows, all vectorized
        gstart_mask = np.concatenate(
            ([True], (b[1:] != b[:-1]) | (terms[1:] != terms[:-1]))
        )
        gstarts = np.flatnonzero(gstart_mask)
        gsizes = np.diff(np.append(gstarts, n))
        off_in_group = np.arange(n) - np.repeat(gstarts, gsizes)
        bs = np.flatnonzero(off_in_group % block_size == 0)  # block starts
        be = np.append(bs[1:], n)

        scores = bm25.term_score(tf, dl, dfs.astype(np.float64), n_docs, avgdl)
        doc_blobs, tf_blobs, dl_blobs = codec_mod.encode_blocks_batch(
            docs, tf, dl, bs
        )
        return pd.DataFrame(
            {
                "bucket": b[bs].astype(np.int32),
                "term_id": terms[bs].astype(np.int32),
                "block_id": (off_in_group[bs] // block_size).astype(np.int32),
                "n": (be - bs).astype(np.int32),
                "df": dfs[bs],
                "first_doc": docs[bs],
                "last_doc": docs[be - 1],
                "block_max": np.maximum.reduceat(scores, bs),
                "doc_blob": doc_blobs,
                "tf_blob": tf_blobs,
                "dl_blob": dl_blobs,
            }
        )

    return encode_stream


@dataclass
class SegmentStore:
    path: str
    n_docs: int
    avgdl: float
    n_buckets: int
    #: posting-block codec that wrote the blobs (ledger-recorded;
    #: codec.get_codec resolves it on every decode path)
    codec: str = "varint"
    #: driver-side term -> term_id map (load_term_cache); never shipped
    #: to executors — query kernels receive resolved 4-byte ids only
    _term_cache: dict | None = field(
        default=None, init=False, repr=False, compare=False
    )

    def load_term_cache(
        self, spark: SparkSession, max_terms: int = 4_000_000
    ) -> bool:
        """Pull the term dictionary to the driver so query-term lookup
        is a dict probe instead of a Spark job — the single-query
        SERVING optimization: an ad-hoc `search_segments` call then
        schedules ONE job (score+top-k) instead of two, which is most
        of its latency floor at any corpus size.

        Size-gated: vocabularies past `max_terms` (a python dict of
        str->int runs ~100 B/term, so the default caps near ~0.5 GB of
        driver heap) return False and leave the pushed-filter
        dictionary scan in place — at 10^12-document web scale the
        vocabulary belongs on executors, not the driver. Explicit
        opt-in; batch queries already amortize one lookup job over the
        whole batch and gain ~nothing."""
        # ONE dictionary scan: collect at most max_terms+1 rows and use
        # the overflow row itself as the size gate (a separate count()
        # would double the one-time load cost).
        pdf = (
            self.dictionary(spark)
            .select("term", "term_id")
            .limit(max_terms + 1)
            .toPandas()
        )
        if len(pdf) > max_terms:
            return False
        self._term_cache = dict(
            zip(pdf["term"], (int(x) for x in pdf["term_id"]))
        )
        return True

    @property
    def data_path(self) -> str:
        return os.path.join(self.path, "segments")

    @property
    def dict_path(self) -> str:
        return os.path.join(self.path, "dictionary")

    def blocks(self, spark: SparkSession) -> DataFrame:
        return spark.read.schema(SEG_SCHEMA).parquet(self.data_path)

    def dictionary(self, spark: SparkSession) -> DataFrame:
        """(term, term_id, df) — vocabulary-sized."""
        return spark.read.schema("term string, term_id int, df long").parquet(
            self.dict_path
        )

    def term_ids(self, spark: SparkSession, terms: list[str]) -> dict[str, int]:
        """Query-term lookup: a driver dict probe when load_term_cache
        was called, else a pushed-filter scan of the dictionary
        returning only the asked-for terms (missing = OOV)."""
        if not terms:
            return {}
        if self._term_cache is not None:
            c = self._term_cache
            return {t: c[t] for t in set(terms) if t in c}
        rows = (
            self.dictionary(spark)
            .filter(F.col("term").isin(sorted(set(terms))))
            .collect()
        )
        return {r["term"]: int(r["term_id"]) for r in rows}


@dataclass
class BucketedSegmentStore(SegmentStore):
    """A SegmentStore whose blocks live in a Spark BUCKETED TABLE
    (`bucketBy` on the bucket column). The bucketed scan's output
    partitioning (HashPartitioning on `bucket`) satisfies the
    ClusteredDistribution that `groupBy("bucket").applyInPandas`
    requires, so Catalyst drops the exchange the plain parquet layout
    pays on every query batch — the compressed block blobs are never
    shuffled at query time (plan-asserted in tests/test_plans.py).

    Dictionary, ledger, stats and the tombstone manifest stay in the
    original store DIRECTORY (`path`); only the blocks move into the
    catalog table. With the default in-memory catalog the table
    metadata is session-scoped, but the data files persist under the
    warehouse dir and `as_bucketed_table` records (table, buckets,
    location) in a manifest beside the ledger — a FRESH session
    re-registers the existing files with `open_bucketed_table` and gets
    the same shuffle-free plan without rewriting a byte. On a cluster,
    a persistent metastore (or Iceberg's bucket-transform partitioning)
    removes even the re-registration step; the query path is identical
    either way.

    The table is a FROZEN SNAPSHOT of the blocks at publish time:
    deletes keep working (tombstones live in `path` and are applied at
    query time), but merges or newly appended segments under `path`
    do NOT appear in the table — re-publish after compaction."""

    table: str = ""

    def blocks(self, spark: SparkSession) -> DataFrame:
        return spark.table(self.table)


def as_bucketed_table(
    spark: SparkSession,
    store: SegmentStore,
    table_name: str,
    table_buckets: int | None = None,
) -> BucketedSegmentStore:
    """Publish an existing store's blocks as a bucketed table (one-time
    rewrite, sorted by (term_id, block_id) within table buckets so the
    pushed term filter keeps row-group pruning) and return the
    shuffle-free-query handle. Records a `bucketed_table.json` manifest
    in the store directory so `open_bucketed_table` can re-register the
    written files from a fresh session without rewriting them.

    The table is EXTERNAL, rooted INSIDE the store directory
    (`<path>/bucketed_blocks`) — each store owns its bucket-encoded
    files by construction, so two stores publishing under the same
    table NAME only contend for the catalog entry (which
    open_bucketed_table re-registers per store), never for each other's
    data files, and DROP TABLE is always metadata-only."""
    if (
        isinstance(store, BucketedSegmentStore)
        and store.table.lower() == table_name.lower()
    ):
        # blocks() on a BucketedSegmentStore reads spark.table(...)
        # LAZILY — dropping the target table below and then writing
        # from it would read the table we just deleted. Publishing to a
        # DIFFERENT name is fine (the source table stays intact); for a
        # same-name refresh, re-publish from the directory store.
        raise ValueError(
            f"cannot re-publish BucketedSegmentStore onto its own "
            f"table {table_name!r}: publish from the directory store "
            f"(open_segments({store.path!r})) or pick a new table name"
        )
    tb = table_buckets or store.n_buckets
    # free the catalog name and this store's own previous publish (the
    # location outlives the in-memory catalog across sessions, and
    # saveAsTable can only overwrite tables the catalog knows). DROP is
    # metadata-only ONLY for EXTERNAL tables — refuse to clobber a
    # user's MANAGED table, whose data files DROP would delete.
    if (
        spark.catalog.tableExists(table_name)
        and spark.catalog.getTable(table_name).tableType != "EXTERNAL"
    ):
        raise ValueError(
            f"catalog table {table_name!r} exists and is MANAGED "
            "(dropping it would delete its data) — pass a different "
            "table_name"
        )
    spark.sql(f"DROP TABLE IF EXISTS {table_name}")
    loc = os.path.join(os.path.abspath(store.path), "bucketed_blocks")
    if os.path.isdir(loc):
        shutil.rmtree(loc, ignore_errors=True)
    (
        store.blocks(spark)
        .write.bucketBy(tb, "bucket")
        .sortBy("term_id", "block_id")
        .option("path", loc)
        .mode("overwrite")
        .format("parquet")
        .saveAsTable(table_name)
    )
    manifest = {
        "table": table_name,
        "table_buckets": tb,
        "location": os.path.abspath(loc),
        "schema": SEG_SCHEMA,
        # staleness guard (VERDICT r5 item 3): the published table is a
        # frozen snapshot of the blocks; record WHICH ledger state it
        # snapshots so a later rebuild/merge-in-place under `path` can't
        # silently keep serving the old blocks through the table form.
        # Tombstones are deliberately NOT covered: deletes stay live
        # (applied at query time from the directory manifest).
        "ledger_sha": _ledger_fingerprint(store.path),
    }
    tmp = _bucketed_manifest_path(store.path) + ".tmp"
    with open(tmp, "w") as f:
        json.dump(manifest, f, indent=1)
    os.replace(tmp, _bucketed_manifest_path(store.path))
    return BucketedSegmentStore(
        path=store.path,
        n_docs=store.n_docs,
        avgdl=store.avgdl,
        n_buckets=store.n_buckets,
        codec=store.codec,
        table=table_name,
    )


class StaleBucketedTableError(RuntimeError):
    """The store's segments changed after its bucketed table was
    published (ledger fingerprint mismatch): the frozen table snapshot
    no longer reflects the directory store. Re-publish with
    as_bucketed_table, or fall back to the directory store."""


def _bucketed_manifest_path(path: str) -> str:
    return os.path.join(path, "bucketed_table.json")


def _ledger_fingerprint(path: str) -> str:
    """sha256 of the ledger file — identifies the segment state a
    bucketed-table publish snapshots (build/merge rewrite the ledger;
    live deletes don't, by design)."""
    import hashlib

    lp = _ledger_path(path)
    if not os.path.exists(lp):
        return ""
    with open(lp, "rb") as f:
        return hashlib.sha256(f.read()).hexdigest()


def _catalog_table_location(spark: SparkSession, table: str) -> str:
    """Filesystem location of a catalog table (normalized absolute
    path, file: scheme stripped) — used to detect name collisions where
    an existing table with the manifest's name is rooted at a different
    store's files."""
    for r in spark.sql(f"DESCRIBE TABLE EXTENDED {table}").collect():
        if r["col_name"] == "Location":
            loc = r["data_type"]
            return os.path.abspath(loc.removeprefix("file:"))
    return ""


def open_bucketed_table(
    spark: SparkSession,
    path: str,
    table_name: str | None = None,
) -> BucketedSegmentStore:
    """Re-open a previously published bucketed-table store from a FRESH
    session: the in-memory catalog forgets the table when the session
    that ran `as_bucketed_table` exits, but the bucket-encoded data
    files persist at the recorded warehouse location — this re-registers
    them as an EXTERNAL bucketed table (`CREATE TABLE ... USING parquet
    CLUSTERED BY (bucket) ... LOCATION`), restoring the shuffle-free
    query plan without rewriting a byte (plan-asserted in
    tests/test_plans.py). Store stats come from the directory ledger,
    exactly like `open_segments`.

    Durability parity with the reference's persistent multi-corpus
    registry (/root/reference/fornax/model.py:10-31): stores outlive
    the process that built them."""
    mp = _bucketed_manifest_path(path)
    if not os.path.exists(mp):
        raise FileNotFoundError(
            f"no bucketed-table manifest at {mp}: publish with "
            "as_bucketed_table first"
        )
    with open(mp) as f:
        man = json.load(f)
    table = table_name or man["table"]
    loc = man["location"]
    want_sha = man.get("ledger_sha")
    if want_sha is not None and want_sha != _ledger_fingerprint(path):
        raise StaleBucketedTableError(
            f"bucketed table {man['table']!r} was published from a "
            f"different segment state of {path} (ledger fingerprint "
            "mismatch — the store was rebuilt or merged in place after "
            "publish): re-publish with as_bucketed_table"
        )
    if not os.path.isdir(loc):
        raise FileNotFoundError(
            f"bucketed table location {loc} is gone (tmpfs warehouse "
            "cleared?): re-publish with as_bucketed_table"
        )
    if spark.catalog.tableExists(table) and (
        _catalog_table_location(spark, table) != os.path.abspath(loc)
    ):
        # name collision: the catalog already holds `table` but rooted at
        # a DIFFERENT store's files (e.g. two registries published under
        # the same default name). Reusing it would silently serve the
        # other store's blocks under this store's stats — re-register at
        # this manifest's location. DROP is metadata-only ONLY for
        # EXTERNAL tables; dropping a colliding MANAGED table would
        # delete a user's data files, so refuse and make them pick a
        # different name instead.
        if spark.catalog.getTable(table).tableType != "EXTERNAL":
            raise ValueError(
                f"catalog table {table!r} exists, is not this store's "
                "published snapshot, and is MANAGED (dropping it would "
                "delete its data) — pass a different table_name"
            )
        spark.sql(f"DROP TABLE IF EXISTS {table}")
    if not spark.catalog.tableExists(table):
        spark.sql(
            f"CREATE TABLE {table} ({man['schema']}) USING parquet "
            f"CLUSTERED BY (bucket) SORTED BY (term_id, block_id) "
            f"INTO {int(man['table_buckets'])} BUCKETS "
            f"LOCATION '{loc}'"
        )
    base = open_segments(path)
    return BucketedSegmentStore(
        path=path,
        n_docs=base.n_docs,
        avgdl=base.avgdl,
        n_buckets=base.n_buckets,
        codec=base.codec,
        table=table,
    )


def _ledger_path(path: str) -> str:
    return os.path.join(path, "ledger.json")


def _load_ledger(path: str) -> dict:
    lp = _ledger_path(path)
    if os.path.exists(lp):
        with open(lp) as f:
            return json.load(f)
    return {"groups": {}, "stats": None}


def _save_ledger(path: str, ledger: dict) -> None:
    lp = _ledger_path(path)
    tmp = lp + ".tmp"
    with open(tmp, "w") as f:
        json.dump(ledger, f, indent=1, sort_keys=True)
    os.replace(tmp, lp)  # atomic done-marker


#: vocabulary size above which the build stops BROADCASTING the
#: dictionary (both the 8 B/term dense df array and the term->term_id
#: join side) and falls back to a shuffle join that carries df through
#: the one existing exchange. 64M terms = 512 MB of dense array — about
#: the most a driver/executor heap should spend on a lookup table.
#: Noisy-web-text vocabularies reach 10^8-10^9 terms; past the gate the
#: vocabulary lives on executors only. Crossover: the fallback re-keys
#: the postings by term (an extra shuffle of term strings) and widens
#: the layout exchange by 8 B/row, so the broadcast form is strictly
#: better whenever it fits — the gate exists for when it can't.
VOCAB_BROADCAST_MAX_TERMS = 64_000_000


def df_lookup_broadcast(dictionary: DataFrame):
    """term_id-indexed df array as a Spark broadcast. term_ids are dense
    ranks 0..V-1, so the lookup is a plain numpy index — 8 B/term, the
    same vocabulary-sized payload the pre-exchange broadcast join
    already ships to every executor. Callers gate on vocabulary size
    (VOCAB_BROADCAST_MAX_TERMS) BEFORE calling — this function itself
    materializes the whole dictionary on the driver."""
    spark = dictionary.sparkSession
    pdf = dictionary.select("term_id", "df").toPandas()
    size = int(pdf["term_id"].max()) + 1 if len(pdf) else 0
    arr = np.zeros(size, dtype=np.int64)
    if size:
        arr[pdf["term_id"].to_numpy(np.int64)] = pdf["df"].to_numpy(np.int64)
    return spark.sparkContext.broadcast(arr)


def encoded_blocks(
    idx: InvertedIndex,
    dictionary: DataFrame,
    buckets: list[int],
    n_buckets: int,
    block_size: int,
    parallelism: int,
    df_bcast=None,
    codec_name: str = "varint",
    carry_df: bool = False,
) -> DataFrame:
    """The encode plan for one bucket group: postings -> posting blocks.

    Plan shape (guarded by tests/test_plans.py):
      * the term DICTIONARY (term -> 4-byte term_id; vocabulary-sized)
        is BROADCAST — the postings (the 100 TB side) are never
        shuffled for a join; no SortMergeJoin anywhere.
      * the dictionary join happens BEFORE the exchange so the shuffle
        carries exactly (term_id int, doc_id long, tfdl long) =
        20 B/row — no term strings, tf+dl packed into one int64, df not
        shuffled at all (re-attached inside the encoder from the
        term_id-indexed broadcast array, `df_lookup_broadcast`), and
        the BUCKET not shuffled either: it's derived data (top bits of
        the biased doc id), so the range partitioner and the in-
        partition sort evaluate it as an EXPRESSION over doc_id and the
        kernel recomputes it vectorized (bucket_of_docs_np). The
        shuffle is the encode path's measured scaling bottleneck; every
        byte through the range partitioner costs both bandwidth and
        comparator time.
      * exactly ONE shuffle of the postings: the range repartition that
        IS the index layout. Parallelism is sized to the cluster, not
        the bucket count — range partitioning by (bucket, term_id)
        keeps every encode group intact in one partition while letting
        many tasks share a bucket, so a hot bucket no longer caps
        concurrency; range (not hash) partitioning also keeps each
        task's rows inside 1-2 bucket dirs, so the partitionBy("bucket")
        write emits O(parallelism + n_buckets) files.

    carry_df=True is the PAST-THE-GATE fallback (vocabulary >
    VOCAB_BROADCAST_MAX_TERMS, see build_segments): no driver-side
    dictionary materialization and no broadcast at all — the dictionary
    join becomes a regular shuffle join (Catalyst/AQE picks the
    strategy for two big sides) and per-term df rides THROUGH the
    layout exchange as an extra int64 column, re-read by the kernel
    from the rows. Costs one extra shuffle (postings re-keyed by term
    string) plus 8 B/row on the layout exchange; buys a build whose
    every vocabulary-sized structure stays distributed. Bit-identical
    output (tests/test_segments.py).
    """
    if carry_df:
        df_bcast = None
    elif df_bcast is None:
        df_bcast = df_lookup_broadcast(dictionary)
    bexpr = bucket_col(F.col("doc_id"), n_buckets)
    dim_cols = ["term", "term_id"] + (["df"] if carry_df else [])
    dim = dictionary.select(*dim_cols)
    p = idx.postings.join(
        dim if carry_df else F.broadcast(dim), "term"
    ).select(
        "term_id",
        "doc_id",
        F.shiftleft(F.col("tf"), 32).bitwiseOR(F.col("dl")).alias("tfdl"),
        *(["df"] if carry_df else []),
    )
    if len(buckets) < n_buckets:
        # partial-group (resume) builds filter pre-shuffle; the common
        # all-buckets build skips the per-row isin entirely
        p = p.filter(bexpr.isin(buckets))
    encode = _encoder(
        idx.stats.n_docs, idx.stats.avgdl, block_size, df_bcast, n_buckets,
        codec_mod=codec.get_codec(codec_name),
    )
    # n_buckets == 1: the bucket expression is the constant 0 (not a
    # legal sort/partition key) and carries no information — range by
    # term alone
    keys = (
        [F.col("term_id")]
        if n_buckets == 1
        else [bexpr, F.col("term_id")]
    )
    return (
        p.repartitionByRange(max(len(buckets), parallelism), *keys)
        .sortWithinPartitions(*keys, F.col("doc_id"))
        .mapInPandas(encode, SEG_SCHEMA)
    )


def build_segments(
    spark: SparkSession,
    idx: InvertedIndex,
    path: str,
    n_buckets: int = 32,
    block_size: int = codec.BLOCK_SIZE,
    group_size: int | None = None,
    fail_after_groups: int | None = None,
    code_version: str = "fornax_spark-0.1",
    codec: str = "varint",
    parquet_codec: str | None = "zstd",
    vocab_broadcast_max_terms: int = VOCAB_BROADCAST_MAX_TERMS,
) -> SegmentStore:
    """Encode the index into a segment store, resumable per bucket group.

    codec: posting-block codec name — "varint" (default, delta+LEB128)
    or "pfor" (NewPFD bit-packing, fulltext/pfor.py). Recorded in the
    ledger stats so every decode path reads blobs with the codec that
    wrote them, and so a resume under a DIFFERENT codec wipes and
    rebuilds instead of mixing blob formats.

    parquet_codec: file-level compression for the segment parquet
    ("snappy"/"zstd"/"none"/...; None = Spark session default, snappy).
    Default zstd per the measured tradeoff (BENCH.md "Parquet file
    compression": 0.82x snappy's bytes with no build/query cost — the
    blobs are already entropy-coded, so the file codec mostly squeezes
    the metadata columns). Purely a file property (parquet files
    self-describe their codec), so resume may mix codecs safely and it
    is recorded in the ledger for information, not under the
    wipe-triggering stats.

    vocab_broadcast_max_terms: size gate on the two vocabulary-sized
    broadcast structures (the dense term_id->df array and the
    dictionary join side). Vocabularies past the gate build in CARRY
    mode — shuffle dictionary join, df carried through the layout
    exchange — so nothing vocabulary-sized ever lands on the driver or
    in a broadcast (encoded_blocks docstring has the cost model).
    Bit-identical output either way; recorded in the ledger.

    group_size: buckets per atomic write + ledger row. Default = ALL
    buckets in one Spark job — the group loop exists only as the resume
    granularity knob (checkpoint every `group_size` buckets); smaller
    groups trade wall-clock (serial jobs) for finer restart points.

    fail_after_groups: test hook — raise after N groups to exercise the
    resume path (metamorphic: resumed build == clean build).
    """
    assert n_buckets & (n_buckets - 1) == 0, "n_buckets must be a power of 2"
    if group_size is None:
        group_size = n_buckets
    os.makedirs(path, exist_ok=True)
    ledger = _load_ledger(path)
    get_codec(codec)  # fail fast on a typo, before touching the ledger
    stats_now = {"n_docs": idx.stats.n_docs, "avgdl": idx.stats.avgdl,
                 "n_buckets": n_buckets, "block_size": block_size,
                 "format": STORE_FORMAT, "codec": codec}
    # Resume safety: a ledger written under a different layout, corpus or
    # store format must not be silently mixed with this run (stale
    # bucket=N dirs from a wider layout would read back as valid blocks
    # and corrupt query results). Wipe and rebuild from scratch on any
    # mismatch.
    if ledger["groups"] and ledger.get("stats") != stats_now:
        shutil.rmtree(os.path.join(path, "segments"), ignore_errors=True)
        shutil.rmtree(os.path.join(path, "dictionary"), ignore_errors=True)
        ledger = {"groups": {}, "stats": None}
    if not ledger["groups"]:
        # Fresh (or wiped) build into a possibly-reused directory: stale
        # tombstones carry doc_ids and per-term df_deltas keyed by the OLD
        # store's term_ids — inherited, they'd silently mask live docs and
        # shift BM25 stats. A fresh store starts with no deletes.
        from .deletes import TOMBSTONE_FILE

        try:
            os.remove(os.path.join(path, TOMBSTONE_FILE))
        except FileNotFoundError:
            pass
    ledger["stats"] = stats_now

    # term dictionary: written once per build (idempotent overwrite on
    # resume — ids are deterministic for a given vocabulary). Timed
    # separately into the ledger: this section is O(vocabulary), not
    # O(corpus) — fixed cost that amortizes to nothing at real scale
    # but is a visible Amdahl term in small-corpus scaling measurements.
    t_dict = time.time()
    dictionary = build_dictionary(idx.term_stats).persist()
    dictionary.write.mode("overwrite").parquet(os.path.join(path, "dictionary"))
    # vocabulary-broadcast gate: count is a cheap scan of the persisted
    # (and just-written) dictionary. Past the gate, NOTHING
    # vocabulary-sized is materialized on the driver or broadcast —
    # the build runs in carry-df mode (encoded_blocks docstring).
    vocab_terms = dictionary.count()
    carry_df = vocab_terms > vocab_broadcast_max_terms
    df_bcast = None if carry_df else df_lookup_broadcast(dictionary)
    ledger["dict_secs"] = round(time.time() - t_dict, 3)
    ledger["vocab_terms"] = int(vocab_terms)
    ledger["df_attach"] = "carry" if carry_df else "broadcast"

    groups = [
        list(range(g, min(g + group_size, n_buckets)))
        for g in range(0, n_buckets, group_size)
    ]
    parallelism = spark.sparkContext.defaultParallelism
    done_groups = 0
    for gi, buckets in enumerate(groups):
        key = f"g{gi:04d}"
        if ledger["groups"].get(key, {}).get("status") == "done":
            continue
        if fail_after_groups is not None and done_groups >= fail_after_groups:
            dictionary.unpersist()
            if df_bcast is not None:
                df_bcast.unpersist()
            _save_ledger(path, ledger)
            raise RuntimeError(f"injected failure before group {key}")
        t0 = time.time()
        enc = encoded_blocks(
            idx, dictionary, buckets, n_buckets, block_size, parallelism,
            df_bcast=df_bcast, codec_name=codec, carry_df=carry_df,
        )
        out_dir = os.path.join(path, "segments")
        # idempotent per-group write: overwrite only this group's bucket dirs
        for b in buckets:
            d = os.path.join(out_dir, f"bucket={b}")
            if os.path.exists(d):
                shutil.rmtree(d)
        w = enc.write.partitionBy("bucket").mode("append")
        if parquet_codec is not None:
            w = w.option("compression", parquet_codec)
        w.parquet(out_dir)
        # ledger metrics from a column-pruned, join-free postings scan
        # (doc_id only) — NOT from `part`, which would replay the join.
        m = (
            idx.postings.select(
                "doc_id",
                bucket_col(F.col("doc_id"), n_buckets).alias("bucket"),
            )
            .filter(F.col("bucket").isin(buckets))
            .agg(
                F.countDistinct("doc_id").alias("docs"),
                F.count(F.lit(1)).alias("postings"),
            )
            .collect()[0]
        )
        secs = time.time() - t0
        ledger["groups"][key] = {
            "status": "done",
            "buckets": buckets,
            "docs": int(m["docs"]),
            "postings": int(m["postings"]),
            "bytes_raw": int(m["postings"]) * 24,  # 3x int64 per posting
            "build_secs": secs,
            "lineage": {
                "code_version": code_version,
                "n_buckets": n_buckets,
                "block_size": block_size,
            },
        }
        _save_ledger(path, ledger)
        done_groups += 1

    # compressed-bytes metric from the written files
    total_bytes = 0
    for root, _dirs, files in os.walk(os.path.join(path, "segments")):
        total_bytes += sum(
            os.path.getsize(os.path.join(root, f))
            for f in files
            if f.endswith(".parquet")
        )
    ledger["bytes_compressed_total"] = total_bytes
    ledger["parquet_codec"] = parquet_codec or "default"
    _save_ledger(path, ledger)
    dictionary.unpersist()
    if df_bcast is not None:
        df_bcast.unpersist()
    return SegmentStore(
        path=path,
        n_docs=idx.stats.n_docs,
        avgdl=idx.stats.avgdl,
        n_buckets=n_buckets,
        codec=codec,
    )


def open_segments(path: str) -> SegmentStore:
    ledger = _load_ledger(path)
    s = ledger["stats"]
    return SegmentStore(
        path=path,
        n_docs=s["n_docs"],
        avgdl=s["avgdl"],
        n_buckets=s["n_buckets"],
        codec=s.get("codec", "varint"),
    )
