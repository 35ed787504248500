"""End-to-end PForDelta-coded segment store (build_segments codec="pfor").

Codec independence is the invariant: every query / delete / merge result
over a pfor-coded store must be BIT-IDENTICAL to the same operation over
the default varint store of the same corpus — the codec changes bytes on
disk, never semantics. The ledger records the codec and every decode
path dispatches on it (codec.get_codec), so a store is always read with
the codec that wrote it, including after open_segments from a fresh
handle and through the CorpusHandle facade.
"""

from __future__ import annotations

import pytest

from fornax_spark.fulltext.build import build_index
from fornax_spark.fulltext.corpus import (
    generate_pages,
    pages_to_spark,
    reference_queries,
)
from fornax_spark.fulltext.segments import build_segments, open_segments
from fornax_spark.fulltext.wand import search_segments, search_segments_batch


@pytest.fixture(scope="module")
def two_stores(spark, tmp_path_factory):
    pages = generate_pages(500, seed=47)
    idx = build_index(spark, pages_to_spark(spark, pages, partitions=8))
    root = tmp_path_factory.mktemp("pforseg")
    sv = build_segments(spark, idx, str(root / "varint"), n_buckets=8)
    sp = build_segments(
        spark, idx, str(root / "pfor"), n_buckets=8, codec="pfor"
    )
    yield spark, idx, sv, sp
    idx.postings.unpersist()


def _batch(spark, store):
    return search_segments_batch(spark, store, reference_queries()).toPandas()


def test_pfor_store_query_bit_identical_to_varint(two_stores):
    spark, _idx, sv, sp = two_stores
    a = _batch(spark, sv)
    b = _batch(spark, sp)
    assert a["doc_id"].tolist() == b["doc_id"].tolist()
    assert a["score"].tolist() == b["score"].tolist()  # exact floats
    assert a["rank"].tolist() == b["rank"].tolist()


def test_pfor_ledger_roundtrip_and_bytes_differ(two_stores):
    spark, _idx, sv, sp = two_stores
    assert sv.codec == "varint" and sp.codec == "pfor"
    assert open_segments(sp.path).codec == "pfor"
    assert open_segments(sv.path).codec == "varint"
    # the codecs genuinely write different bytes: same block coordinates,
    # different doc_blob payloads (guards against a silent fallback to
    # the default codec on the encode path)
    key = ["bucket", "term_id", "block_id"]
    av = (
        sv.blocks(spark)
        .select(*key, "doc_blob")
        .toPandas()
        .sort_values(key, ignore_index=True)
    )
    ap = (
        sp.blocks(spark)
        .select(*key, "doc_blob")
        .toPandas()
        .sort_values(key, ignore_index=True)
    )
    assert av[key].equals(ap[key])  # identical block layout
    same = sum(
        bytes(x) == bytes(y) for x, y in zip(av["doc_blob"], ap["doc_blob"])
    )
    assert same < len(av)  # payload format actually changed


def test_pfor_delete_docs_matches_varint(two_stores, tmp_path):
    """Tombstone the same docs in both stores: masked results and the
    exact shifted stats must agree bit-for-bit (the delete scan decodes
    blobs with the store's own codec)."""
    spark, _idx, sv, sp = two_stores
    import shutil

    lv = open_segments(shutil.copytree(sv.path, str(tmp_path / "v")))
    lp = open_segments(shutil.copytree(sp.path, str(tmp_path / "p")))
    from fornax_spark.fulltext.deletes import delete_docs

    victims = _batch(spark, lv).query("rank == 1")["doc_id"].tolist()[:5]
    tv = delete_docs(spark, lv, victims)
    tp = delete_docs(spark, lp, victims)
    assert tv.n_docs_new == tp.n_docs_new
    assert tv.avgdl_new == tp.avgdl_new
    assert tv.df_deltas == tp.df_deltas
    a = _batch(spark, lv)
    b = _batch(spark, lp)
    assert a["doc_id"].tolist() == b["doc_id"].tolist()
    assert a["score"].tolist() == b["score"].tolist()


def test_pfor_merge_preserves_codec_and_results(two_stores, tmp_path):
    """Single-store merge (compaction) of a pfor store keeps the pfor
    codec by default and returns bit-identical query results."""
    spark, _idx, _sv, sp = two_stores
    from fornax_spark.fulltext.merge import merge_stores

    merged = merge_stores(spark, [sp], str(tmp_path / "m"))
    assert merged.codec == "pfor"
    assert open_segments(merged.path).codec == "pfor"
    a = _batch(spark, sp)
    b = _batch(spark, merged)
    assert a["doc_id"].tolist() == b["doc_id"].tolist()
    assert a["score"].tolist() == b["score"].tolist()


def test_codec_switch_wipes_and_rebuilds(two_stores, tmp_path):
    """Re-building an existing store directory under a DIFFERENT codec
    must wipe and re-encode (ledger stats mismatch), never mix blob
    formats within one store."""
    spark, idx, sv, _sp = two_stores
    path = str(tmp_path / "switch")
    build_segments(spark, idx, path, n_buckets=8, codec="pfor")
    assert open_segments(path).codec == "pfor"
    s2 = build_segments(spark, idx, path, n_buckets=8)  # default varint
    assert open_segments(path).codec == "varint"
    a = _batch(spark, sv)  # the fixture's varint store, same corpus
    b = _batch(spark, s2)
    assert a["doc_id"].tolist() == b["doc_id"].tolist()
    assert a["score"].tolist() == b["score"].tolist()


def test_unknown_codec_fails_fast(two_stores, tmp_path):
    spark, idx, _sv, _sp = two_stores
    with pytest.raises(ValueError, match="unknown posting codec"):
        build_segments(
            spark, idx, str(tmp_path / "bad"), n_buckets=8, codec="zstd"
        )


def test_mixed_codec_merge(two_stores, tmp_path):
    """A merge may fold stores written by DIFFERENT codecs (e.g. a
    varint-era store plus a pfor delta generation): decode dispatches
    per input store, the output defaults to the FIRST store's codec,
    and results equal a clean single-codec merge bit-for-bit."""
    spark, _idx, sv, sp = two_stores
    import shutil

    from fornax_spark.fulltext.deletes import delete_docs
    from fornax_spark.fulltext.merge import blocks_to_postings, merge_stores
    from fornax_spark.fulltext.segments import open_segments

    # disjoint halves: tombstone the complement in two copies (the doc
    # set comes from a real decode pass — every live doc must land in
    # exactly one half or the merge's disjointness check rightly raises)
    all_docs = sorted(
        r["doc_id"]
        for r in blocks_to_postings(sv.blocks(spark), sv.dictionary(spark))
        .select("doc_id")
        .distinct()
        .collect()
    )
    half = set(all_docs[: len(all_docs) // 2])
    va = open_segments(shutil.copytree(sv.path, str(tmp_path / "va")))
    pb = open_segments(shutil.copytree(sp.path, str(tmp_path / "pb")))
    doc_ids_a = [d for d in all_docs if d not in half]
    doc_ids_b = [d for d in all_docs if d in half]
    delete_docs(spark, va, doc_ids_a)  # varint store keeps `half`
    delete_docs(spark, pb, doc_ids_b)  # pfor store keeps the rest

    mixed = merge_stores(spark, [va, pb], str(tmp_path / "mixed"))
    assert mixed.codec == "varint"  # first input's codec
    clean = merge_stores(
        spark,
        [open_segments(shutil.copytree(sv.path, str(tmp_path / "v2")))],
        str(tmp_path / "clean"),
    )
    a = _batch(spark, mixed)
    b = _batch(spark, clean)
    assert a["doc_id"].tolist() == b["doc_id"].tolist()
    assert a["score"].tolist() == b["score"].tolist()

    transcoded = merge_stores(
        spark, [va, pb], str(tmp_path / "trans"), out_codec="pfor"
    )
    assert open_segments(transcoded.path).codec == "pfor"
    c = _batch(spark, transcoded)
    assert a["score"].tolist() == c["score"].tolist()


def test_facade_add_docs_inherits_codec(two_stores, tmp_path, spark):
    """CorpusHandle.add_docs on a pfor corpus writes its delta
    generation AND the folded store in pfor (the live store's codec),
    and the grown corpus still answers queries."""
    from fornax_spark.api import Connection

    _sp, _idx, _sv, _spstore = two_stores
    conn = Connection(str(tmp_path / "reg"), spark)
    c = conn.create_corpus("pcorp")
    pages = pages_to_spark(spark, generate_pages(300, seed=51), partitions=4)
    docs = pages.selectExpr("xxhash64(url) as doc_id", "text")
    c.build(docs.limit(200), codec="pfor")
    n0 = len(c)
    c.add_docs(docs.subtract(docs.limit(200)))
    assert open_segments(c.path).codec == "pfor"
    assert len(c) == 300 and n0 == 200
    assert c.search("term00001", k=5).count() > 0
    c.delete()
