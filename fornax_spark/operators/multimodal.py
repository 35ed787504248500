"""Multimodal columns: image/audio/video as opaque binary + typed metadata.

The Spark-side plumbing is REAL and tested: schemas, Arrow batch shapes,
mapInPandas iterators, partition sizing. The image decode step is REAL
too (round 2): PNG and uncompressed BMP decode pure-stdlib in
operators/imagecodec.py (zlib + numpy), and the synthetic asset table
carries genuine PNG payloads. Formats needing external codec libraries
(JPEG, audio, video) stay behind the pluggable `decoder=` hook — the
deterministic fake decoder documents that contract; swapping in
PIL/torchaudio/ffmpeg is a one-liner in production.

Schema convention (the multimodal analogue of the pages table):
    assets(asset_id long, kind string, payload binary,
           meta struct<width:int, height:int, sample_rate:int,
                       n_frames:int, codec:string>)
"""

from __future__ import annotations

from collections.abc import Callable, Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

ASSET_SCHEMA = T.StructType(
    [
        T.StructField("asset_id", T.LongType(), False),
        T.StructField("kind", T.StringType(), False),
        T.StructField("payload", T.BinaryType(), True),
        T.StructField(
            "meta",
            T.StructType(
                [
                    T.StructField("width", T.IntegerType(), True),
                    T.StructField("height", T.IntegerType(), True),
                    T.StructField("sample_rate", T.IntegerType(), True),
                    T.StructField("n_frames", T.IntegerType(), True),
                    T.StructField("codec", T.StringType(), True),
                ]
            ),
            True,
        ),
    ]
)


def _asset_rows(assets: DataFrame, kind: str, cols: tuple[str, ...]) -> DataFrame:
    """Scan-side prep for the decode kernels (guide §4.1/§2.3): filter
    the asset kind in the JVM (pushes to the parquet scan, so other
    kinds' PAYLOAD BYTES never cross the Python boundary just to be
    skipped), project only the columns the kernel reads (mapInPandas is
    opaque — Spark would otherwise ship every column), and fan out
    under-partitioned inputs so decodes use every core. The kernels
    keep their own kind guard as defense in depth."""
    from ..functions import fan_out

    return fan_out(assets.filter(F.col("kind") == kind).select(*cols))


def fake_decode_image(payload: bytes, width: int, height: int) -> np.ndarray:
    """Deterministic stand-in for a real image decoder: expands payload
    bytes into a (height, width, 3) uint8 array by seeded tiling. Replace
    with PIL/turbojpeg in production (NotImplementedError path below
    documents the contract)."""
    if payload is None:
        raise NotImplementedError(
            "real decode requires an image codec library (PIL/libjpeg) — "
            "not available in this environment; payload=None marks assets "
            "that need it"
        )
    src = np.frombuffer(payload, dtype=np.uint8)
    need = width * height * 3
    reps = int(np.ceil(need / max(len(src), 1)))
    return np.tile(src, reps)[:need].reshape(height, width, 3)


def image_features(
    assets: DataFrame,
    decoder: Callable[[bytes, int, int], np.ndarray] | None = None,
    resize_to: tuple[int, int] = (8, 8),
) -> DataFrame:
    """Decode -> resize (mean-pool) -> 192-dim float feature per image.

    Default decoder: the real pure-stdlib PNG/BMP codec
    (operators/imagecodec.decode_image).

    mapInPandas: one Arrow batch in, one out — the decoder runs inside
    the executor Python worker, vectorized per batch; output schema is
    fixed so downstream ANN (operators.similarity) composes directly.
    """
    if decoder is None:
        from .imagecodec import decode_image

        decoder = decode_image
    rw, rh = resize_to

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            feats, ids = [], []
            for r in pdf.itertuples(index=False):
                if r.kind != "image":
                    continue
                img = decoder(
                    None if r.payload is None else bytes(r.payload),
                    int(r.meta["width"]),
                    int(r.meta["height"]),
                )
                h, w, _ = img.shape
                # mean-pool resize to (rh, rw): trim to divisible grid
                th, tw = (h // rh) * rh, (w // rw) * rw
                pooled = (
                    img[:th, :tw]
                    .reshape(rh, th // rh, rw, tw // rw, 3)
                    .mean(axis=(1, 3))
                    .astype(np.float32)
                )
                feats.append(pooled.ravel().tolist())
                ids.append(r.asset_id)
            # explicit dtypes: an empty batch (no image rows in this
            # partition) would otherwise default feature to float64,
            # which Arrow cannot cast to list<float>
            yield pd.DataFrame(
                {
                    "asset_id": pd.Series(ids, dtype="int64"),
                    "feature": pd.Series(feats, dtype="object"),
                }
            )

    out_schema = T.StructType(
        [
            T.StructField("asset_id", T.LongType(), False),
            T.StructField("feature", T.ArrayType(T.FloatType()), False),
        ]
    )
    return _asset_rows(assets, "image", ("asset_id", "kind", "payload", "meta")).mapInPandas(
        run, out_schema
    )


def audio_features(
    assets: DataFrame,
    decoder: Callable[[bytes], tuple[int, np.ndarray]] | None = None,
    n_bins: int = 32,
) -> DataFrame:
    """Decode -> mono mix -> mean-pool to an `n_bins`-dim envelope
    feature per audio asset (mean |amplitude| per time bin).

    Default decoder: the real pure-stdlib WAV/PCM codec
    (operators/audiocodec.decode_wav) — same move that made images real
    in imagecodec.py. Compressed formats (mp3/ogg) swap in via the
    `decoder=` hook. Same mapInPandas shape as image_features, so the
    output composes with operators.similarity ANN directly.
    """
    if decoder is None:
        from .audiocodec import decode_wav

        decoder = decode_wav

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            feats, ids, rates = [], [], []
            for r in pdf.itertuples(index=False):
                if r.kind != "audio":
                    continue
                rate, samples = decoder(
                    None if r.payload is None else bytes(r.payload)
                )
                mono = samples.mean(axis=1)
                n = len(mono)
                # mean-pool |amplitude| into n_bins: trim to a divisible
                # grid (same policy as the image mean-pool above)
                tb = max((n // n_bins) * n_bins, 0)
                if tb == 0:
                    env = np.zeros(n_bins, dtype=np.float32)
                else:
                    env = (
                        np.abs(mono[:tb])
                        .reshape(n_bins, tb // n_bins)
                        .mean(axis=1)
                        .astype(np.float32)
                    )
                feats.append(env.tolist())
                ids.append(r.asset_id)
                rates.append(rate)
            yield pd.DataFrame(
                {
                    "asset_id": pd.Series(ids, dtype="int64"),
                    "sample_rate": pd.Series(rates, dtype="int32"),
                    "feature": pd.Series(feats, dtype="object"),
                }
            )

    out_schema = T.StructType(
        [
            T.StructField("asset_id", T.LongType(), False),
            T.StructField("sample_rate", T.IntegerType(), False),
            T.StructField("feature", T.ArrayType(T.FloatType()), False),
        ]
    )
    return _asset_rows(assets, "audio", ("asset_id", "kind", "payload")).mapInPandas(
        run, out_schema
    )


def frame_sample(
    assets: DataFrame, every_n: int = 10, frame_bytes: int = 64
) -> DataFrame:
    """Video frame sampling (stub codec): emit every n-th 'frame' as a
    binary slice with its index — the real shape of a frame-extraction
    operator (1 video row -> many frame rows), exercising the
    row-expanding mapInPandas contract."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, idxs, frames = [], [], []
            for r in pdf.itertuples(index=False):
                if r.kind != "video" or r.payload is None:
                    continue
                buf = bytes(r.payload)
                n_frames = int(r.meta["n_frames"])
                for fi in range(0, n_frames, every_n):
                    start = (fi * frame_bytes) % max(len(buf) - frame_bytes, 1)
                    ids.append(r.asset_id)
                    idxs.append(fi)
                    frames.append(buf[start : start + frame_bytes])
            yield pd.DataFrame(
                {
                    "asset_id": pd.Series(ids, dtype="int64"),
                    "frame_idx": pd.Series(idxs, dtype="int32"),
                    "frame": pd.Series(frames, dtype="object"),
                }
            )

    out_schema = T.StructType(
        [
            T.StructField("asset_id", T.LongType(), False),
            T.StructField("frame_idx", T.IntegerType(), False),
            T.StructField("frame", T.BinaryType(), False),
        ]
    )
    return _asset_rows(assets, "video", ("asset_id", "kind", "payload", "meta")).mapInPandas(
        run, out_schema
    )


def synthetic_assets(spark, n: int = 64, seed: int = 42) -> DataFrame:
    """Deterministic asset table for tests/benches. Image payloads are
    REAL PNG bytes (pure-stdlib encoder, rotating through all five PNG
    filter types so the decoder branches all run); audio payloads are
    REAL 16-bit PCM WAV bytes (pure-stdlib encoder, alternating mono /
    stereo); only video stays opaque bytes for the stub-codec path."""
    from .audiocodec import encode_wav
    from .imagecodec import encode_png

    rng = np.random.default_rng(seed)
    rows = []
    for i in range(n):
        kind = ["image", "video", "audio"][i % 3]
        if kind == "image":
            pixels = rng.integers(0, 256, (16, 32, 3), dtype=np.uint8)
            payload = encode_png(pixels, filter_type=i % 5)
            codec_name = "png"
        elif kind == "audio":
            n_ch = 1 + (i // 3) % 2
            samples = rng.integers(
                -32768, 32768, (800, n_ch), dtype=np.int64
            ).astype(np.int16)
            payload = encode_wav(samples, sample_rate=16000)
            codec_name = "pcm_s16le"
        else:
            payload = bytes(rng.integers(0, 256, 256, dtype=np.uint8).tolist())
            codec_name = "fake"
        meta = {
            "width": 32,
            "height": 16,
            "sample_rate": 16000,
            "n_frames": 50,
            "codec": codec_name,
        }
        rows.append((i, kind, payload, meta))
    return spark.createDataFrame(rows, ASSET_SCHEMA)
