"""Multimodal plumbing + streaming smoke tests."""

from __future__ import annotations

import numpy as np


def test_image_features_shape(spark):
    from fornax_spark.operators.multimodal import image_features, synthetic_assets

    assets = synthetic_assets(spark, n=30).repartition(4)
    out = image_features(assets, resize_to=(8, 8)).collect()
    assert len(out) == 10  # every 3rd asset is an image
    for r in out:
        assert len(r["feature"]) == 8 * 8 * 3
    # determinism across runs
    out2 = image_features(assets, resize_to=(8, 8)).collect()
    assert {r["asset_id"]: r["feature"] for r in out} == {
        r["asset_id"]: r["feature"] for r in out2
    }


def test_image_features_compose_with_ann(spark):
    """feature output plugs straight into the cosine ANN operator."""
    from fornax_spark.operators.multimodal import image_features, synthetic_assets
    from fornax_spark.operators.similarity import cosine_topk

    feats = image_features(synthetic_assets(spark, n=30))
    q = feats.limit(1).collect()[0]["feature"]
    top = cosine_topk(feats, list(q), k=3, id_col="asset_id", vec_col="feature")
    rows = top.collect()
    assert len(rows) == 3
    assert rows[0]["cosine"] == 1.0  # itself


def test_frame_sample_expands_rows(spark):
    from fornax_spark.operators.multimodal import frame_sample, synthetic_assets

    out = frame_sample(synthetic_assets(spark, n=30), every_n=10).collect()
    # 10 videos x 5 sampled frames (n_frames=50, every 10)
    assert len(out) == 50
    assert all(len(r["frame"]) == 64 for r in out)


def test_windowed_event_counts_batch_semantics(spark):
    """Windowed agg validated in batch mode (same plan streaming uses)."""
    from datetime import datetime

    from fornax_spark.streaming import windowed_event_counts

    rows = [
        (datetime(2024, 1, 1, 0, 1), "click", 1.0),
        (datetime(2024, 1, 1, 0, 2), "click", 2.0),
        (datetime(2024, 1, 1, 0, 7), "click", 3.0),
        (datetime(2024, 1, 1, 0, 7), "view", 4.0),
    ]
    df = spark.createDataFrame(rows, "ts timestamp, event_type string, value double")
    out = {
        (r["start"].minute, r["event_type"]): (r["n"], r["total_value"])
        for r in windowed_event_counts(df).collect()
    }
    assert out[(0, "click")] == (2, 3.0)
    assert out[(5, "click")] == (1, 3.0)
    assert out[(5, "view")] == (1, 4.0)


def test_incremental_index_stream(spark, tmp_path):
    """Micro-batch postings deltas: union of per-batch postings ==
    batch-built postings over the same pages."""
    from fornax_spark.fulltext.build import build_postings, docs_with_tokens
    from fornax_spark.fulltext.corpus import generate_pages, pages_to_spark
    from fornax_spark.streaming import incremental_index_stream

    pages = generate_pages(120, seed=45)
    pdir = str(tmp_path / "pages")
    df = pages_to_spark(spark, pages, partitions=3)
    df.write.mode("overwrite").parquet(pdir)

    out_dir = str(tmp_path / "deltas")
    q = incremental_index_stream(
        spark, pdir, out_dir, str(tmp_path / "ckpt"), df.schema
    )
    q.awaitTermination(120)

    got = spark.read.parquet(out_dir).select("term", "doc_id", "tf", "dl")
    want = build_postings(docs_with_tokens(df)).select("term", "doc_id", "tf", "dl")
    assert sorted(map(tuple, got.collect())) == sorted(map(tuple, want.collect()))


def test_fake_decoder_stub_contract():
    from fornax_spark.operators.multimodal import fake_decode_image
    import pytest

    img = fake_decode_image(b"\x01\x02\x03", 4, 2)
    assert img.shape == (2, 4, 3) and img.dtype == np.uint8
    with pytest.raises(NotImplementedError):
        fake_decode_image(None, 4, 2)


def test_csv_roundtrip_source(spark, tmp_path):
    """S10: CSV ingest path (reference tutorial reads node/edge CSVs)."""
    from fornax_spark.sources import load_csv

    p = str(tmp_path / "nodes.csv")
    with open(p, "w") as f:
        f.write("node_id,label\n1,hero\n2,team\n3,hero\n")
    df = load_csv(spark, p, schema="node_id long, label string")
    rows = sorted(map(tuple, df.collect()))
    assert rows == [(1, "hero"), (2, "team"), (3, "hero")]


def test_wav_roundtrip():
    """encode_wav -> decode_wav round-trips 16-bit PCM exactly (scaled
    to [-1, 1]); mono and stereo; 8-bit decode path too."""
    import io
    import wave

    import numpy as np

    from fornax_spark.operators.audiocodec import decode_wav, encode_wav

    rng = np.random.default_rng(5)
    for n_ch in (1, 2):
        s = rng.integers(-32768, 32768, (500, n_ch)).astype(np.int16)
        rate, arr = decode_wav(encode_wav(s, sample_rate=22050))
        assert rate == 22050
        assert arr.shape == (500, n_ch)
        assert np.allclose(arr, s.astype(np.float32) / 32768.0)

    # 8-bit unsigned PCM (written with stdlib wave directly)
    buf = io.BytesIO()
    with wave.open(buf, "wb") as w:
        w.setnchannels(1)
        w.setsampwidth(1)
        w.setframerate(8000)
        w.writeframes(bytes([0, 128, 255]))
    rate, arr = decode_wav(buf.getvalue())
    assert rate == 8000
    assert np.allclose(arr.ravel(), [(0 - 128) / 128, 0.0, (255 - 128) / 128])


def test_audio_features_match_numpy_oracle(spark):
    """audio_features over the synthetic asset table (REAL WAV payloads)
    equals a direct numpy computation of the mean-|amplitude| envelope."""
    import numpy as np

    from fornax_spark.operators.audiocodec import decode_wav
    from fornax_spark.operators.multimodal import audio_features, synthetic_assets

    assets = synthetic_assets(spark, n=30).repartition(4)
    got = {
        r["asset_id"]: (r["sample_rate"], np.array(r["feature"]))
        for r in audio_features(assets, n_bins=16).collect()
    }
    audio_rows = [
        r for r in assets.collect() if r["kind"] == "audio"
    ]
    assert len(got) == len(audio_rows) > 0
    for r in audio_rows:
        rate, samples = decode_wav(bytes(r["payload"]))
        mono = samples.mean(axis=1)
        tb = (len(mono) // 16) * 16
        want = np.abs(mono[:tb]).reshape(16, -1).mean(axis=1)
        grate, gfeat = got[r["asset_id"]]
        assert grate == rate == 16000
        assert np.allclose(gfeat, want, atol=1e-6), r["asset_id"]


def test_iceberg_gate(spark):
    """No Iceberg jars in this sandbox: the gated write/read paths must
    raise the explicit capability error (and iceberg_available must
    agree), not fail obscurely inside py4j."""
    import pytest

    from fornax_spark.sources import (
        IcebergUnavailableError,
        iceberg_available,
        iceberg_snapshots,
        read_snapshot,
        write_table_iceberg,
    )

    df = spark.range(3)
    if iceberg_available(spark):
        pytest.skip("iceberg on classpath; gate not exercisable here")
    for fn in (
        lambda: write_table_iceberg(df, "cat.db.t"),
        lambda: iceberg_snapshots(spark, "cat.db.t"),
        lambda: read_snapshot(spark, "cat.db.t", 1),
    ):
        with pytest.raises(IcebergUnavailableError, match="classpath"):
            fn()


def test_streamed_then_published_parity(spark, tmp_path):
    """VERDICT r5 item 6: the streaming LSM front composed with the
    bucketed-table publish — stream two delta generations, build a
    store per generation (build.index_from_postings), fold them with
    merge_stores, publish the merged store as a bucketed table, and the
    batch search must equal a BATCH-built store published the same way,
    bit-for-bit (ids AND scores)."""
    import glob

    from fornax_spark.fulltext.build import build_index, index_from_postings
    from fornax_spark.fulltext.corpus import (
        generate_pages,
        pages_to_spark,
        reference_queries,
    )
    from fornax_spark.fulltext.merge import merge_stores
    from fornax_spark.fulltext.segments import as_bucketed_table, build_segments
    from fornax_spark.fulltext.wand import search_segments_batch
    from fornax_spark.streaming import incremental_index_stream

    pages = generate_pages(240, seed=46)
    full = pages_to_spark(spark, pages, partitions=4)
    pdir = str(tmp_path / "pages")
    ddir = str(tmp_path / "deltas")
    ckpt = str(tmp_path / "ckpt")

    # two stream invocations = two LSM generations (the checkpoint keeps
    # the second run incremental over only the newly arrived files)
    pages_to_spark(spark, pages[:150], partitions=2).write.mode(
        "append"
    ).parquet(pdir)
    incremental_index_stream(
        spark, pdir, ddir, ckpt, full.schema
    ).awaitTermination(120)
    pages_to_spark(spark, pages[150:], partitions=2).write.mode(
        "append"
    ).parquet(pdir)
    incremental_index_stream(
        spark, pdir, ddir, ckpt, full.schema
    ).awaitTermination(120)

    batch_dirs = sorted(glob.glob(f"{ddir}/batch=*"))
    assert len(batch_dirs) >= 2, batch_dirs
    gen_stores, gen_idxs = [], []
    for i, bd in enumerate(batch_dirs):
        gidx = index_from_postings(spark.read.parquet(bd))
        gen_idxs.append(gidx)
        gen_stores.append(
            build_segments(
                spark, gidx, str(tmp_path / f"gen{i}"), n_buckets=8
            )
        )
    merged = merge_stores(spark, gen_stores, str(tmp_path / "merged"))
    bstream = as_bucketed_table(spark, merged, "stream_pub_tbl")

    bidx = build_index(spark, full)
    ref = build_segments(spark, bidx, str(tmp_path / "batchref"), n_buckets=8)
    bref = as_bucketed_table(spark, ref, "batch_pub_tbl")

    queries = reference_queries()
    got = [tuple(r) for r in search_segments_batch(spark, bstream, queries).collect()]
    want = [tuple(r) for r in search_segments_batch(spark, bref, queries).collect()]
    assert got == want and len(got) > 0

    for gidx in gen_idxs:
        gidx.postings.unpersist()
    bidx.postings.unpersist()
    spark.sql("DROP TABLE IF EXISTS stream_pub_tbl")
    spark.sql("DROP TABLE IF EXISTS batch_pub_tbl")


def test_stream_after_publish_staleness_and_refresh(spark, tmp_path):
    """VERDICT r6 item 6 — the inverse composition of
    test_streamed_then_published_parity: a delta streams in AFTER the
    bucketed publish and the store is rebuilt in place (what a naive
    streaming job pointed at the corpus path does, bypassing the facade
    verbs). The frozen snapshot must NOT be silently served: the
    fingerprint guard raises, the facade falls back to the live
    directory store (new docs visible), and publish_bucketed refreshes
    the table form to the same new answer."""
    import glob

    import pytest

    from fornax_spark.api import Connection
    from fornax_spark.fulltext.build import index_from_postings
    from fornax_spark.fulltext.corpus import generate_pages, pages_to_spark
    from fornax_spark.fulltext.segments import (
        StaleBucketedTableError,
        build_segments,
        open_bucketed_table,
    )
    from fornax_spark.streaming import incremental_index_stream

    pages = generate_pages(200, seed=47)
    full = pages_to_spark(spark, pages, partitions=4)
    pdir, ddir, ckpt = (str(tmp_path / d) for d in ("pages", "deltas", "ckpt"))

    pages_to_spark(spark, pages[:120], partitions=2).write.mode(
        "append"
    ).parquet(pdir)
    incremental_index_stream(
        spark, pdir, ddir, ckpt, full.schema
    ).awaitTermination(120)

    from pyspark.sql import functions as F

    def docs_of(pages_df):
        # same stable id scheme as the page pipeline (xxhash64(url))
        return pages_df.select(
            F.xxhash64("url").alias("doc_id"), F.col("text")
        )

    conn = Connection(str(tmp_path / "ns"), spark)
    c = conn.create_corpus("stale_stream")
    c.build(docs_of(pages_to_spark(spark, pages[:120], partitions=2)),
            n_buckets=8)
    c.publish_bucketed("stream_stale_tbl")
    qt = pages.iloc[120]["text"].split()[0]  # term the late delta adds docs for
    before = {r["doc_id"] for r in c.search(qt, k=50).collect()}

    # late delta arrives and the store is rebuilt IN PLACE at c.path
    # from the streamed postings (both generations) — the facade wasn't
    # consulted, so the published snapshot is now stale
    pages_to_spark(spark, pages[120:], partitions=2).write.mode(
        "append"
    ).parquet(pdir)
    incremental_index_stream(
        spark, pdir, ddir, ckpt, full.schema
    ).awaitTermination(120)
    all_postings = spark.read.parquet(
        *sorted(glob.glob(f"{ddir}/batch=*"))
    )
    gidx = index_from_postings(all_postings)
    build_segments(spark, gidx, c.path, n_buckets=8)

    with pytest.raises(StaleBucketedTableError, match="fingerprint"):
        open_bucketed_table(spark, c.path)
    # facade: falls back to the live directory store — new docs visible
    after = {r["doc_id"] for r in c.search(qt, k=50).collect()}
    assert after - before, "late-delta docs must be visible, not frozen"
    # re-publish refreshes the table form to the same new answer
    c.publish_bucketed("stream_stale_tbl")
    republished = {r["doc_id"] for r in c.search(qt, k=50).collect()}
    assert republished == after
    # and the table form is genuinely being used again (no raise)
    open_bucketed_table(spark, c.path)

    gidx.postings.unpersist()
    c.delete()
    spark.sql("DROP TABLE IF EXISTS stream_stale_tbl")
