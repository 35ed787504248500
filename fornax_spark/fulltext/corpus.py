"""Deterministic synthetic Common-Crawl-style corpus (FIXTURES.md §1-2).

Schema mandated by BASELINE.json input_hint:
    pages(url string, warc_ts timestamp, html binary, text string, lang string)

`text` is the ground-truth extraction of `html` — generated THROUGH the
shared extractor (textproc.extract_text) so the per-row invariant
"byte-identical extracted text per url" is well-defined and testable.

Zipfian vocabulary with deliberate head-term skew (top terms appear in
most documents) so the term-salting / skew-handling paths are exercised
even at small scale — mirroring how the reference's tests reconstruct a
known-hard scenario (NeMa figure 4, /root/reference/test/test_opt.py:69).
"""

from __future__ import annotations

from dataclasses import dataclass
from datetime import datetime, timedelta, timezone

import numpy as np
import pandas as pd

from .textproc import extract_text

VOCAB_SIZE = 5000
_EPOCH = datetime(2024, 1, 1, tzinfo=timezone.utc)

# A sprinkle of non-ASCII NFC words + entity-bearing fragments to exercise
# extraction edge cases (entities, nested tags, non-ASCII).
_FANCY_WORDS = ["café", "über", "naïve", "zürich", "élève"]


def vocabulary() -> list[str]:
    return [f"term{i:05d}" for i in range(VOCAB_SIZE)]


def _zipf_probs(n: int, s: float = 1.07) -> np.ndarray:
    ranks = np.arange(1, n + 1, dtype=np.float64)
    p = 1.0 / np.power(ranks, s)
    return p / p.sum()


@dataclass
class PageBatch:
    pdf: pd.DataFrame  # columns: url, warc_ts, html, text, lang


CHUNK = 1000  # generation chunk: doc i lives in chunk i // CHUNK


def _generate_chunk(chunk_id: int, seed: int) -> pd.DataFrame:
    """Generate the full CHUNK docs of one chunk, deterministically from
    (seed, chunk_id) — so generation is order- and partition-independent
    and can run distributed (generate_pages_spark) with identical output
    to the driver-side path (generate_pages)."""
    rng = np.random.default_rng([seed, chunk_id])
    base = chunk_id * CHUNK
    n_docs = CHUNK
    vocab = np.asarray(vocabulary())
    probs = _zipf_probs(VOCAB_SIZE)

    # document lengths ~ lognormal, mean ~120 tokens, clipped [5, 2000]
    lengths = np.clip(
        rng.lognormal(mean=np.log(110.0), sigma=0.7, size=n_docs), 5, 2000
    ).astype(np.int64)
    total = int(lengths.sum())
    flat = rng.choice(VOCAB_SIZE, size=total, p=probs)
    offsets = np.concatenate([[0], np.cumsum(lengths)])

    langs = rng.choice(
        np.asarray(["en", "de", "fr", "und"]), size=n_docs, p=[0.9, 0.04, 0.04, 0.02]
    )
    fancy_mask = rng.random(n_docs) < 0.05
    entity_mask = rng.random(n_docs) < 0.05
    # head-term injection: top-10 terms into ~55% of docs each (skew)
    head_inject = rng.random((n_docs, 10)) < 0.55

    urls, tss, htmls, texts = [], [], [], []
    for j in range(n_docs):
        i = base + j
        toks = list(vocab[flat[offsets[j] : offsets[j + 1]]])
        for h in range(10):
            if head_inject[j, h]:
                toks.append(vocab[h])
        if fancy_mask[j]:
            toks.append(_FANCY_WORDS[i % len(_FANCY_WORDS)])
        title = f"doc {i:08d}"
        body = " ".join(toks)
        if entity_mask[j]:
            body += " fish &amp; chips <b>bold <i>nested</i></b> &lt;tag&gt;"
        html = (
            f"<html><head><title>{title}</title>"
            f"<style>p {{margin: 0}}</style></head>"
            f"<body><p>{body}</p></body></html>"
        ).encode("utf-8")
        urls.append(f"https://site{i % 997}.example/{i:08d}")
        tss.append(_EPOCH + timedelta(seconds=int(i) * 137))
        htmls.append(html)
        texts.append(extract_text(html))

    return pd.DataFrame(
        {
            "url": urls,
            "warc_ts": [t.replace(tzinfo=None) for t in tss],  # Spark naive-UTC
            "html": htmls,
            "text": texts,
            "lang": langs,
        }
    )


def generate_pages(n_docs: int, seed: int = 42) -> pd.DataFrame:
    """Generate n_docs synthetic pages as a pandas DataFrame (driver-side).

    Deterministic for a given (n_docs, seed); doc i is identical for any
    n_docs >= i (chunked seeding). Head-term skew: the top 10 vocabulary
    terms are force-injected into >50% of documents.
    """
    chunks = []
    for cid in range((n_docs + CHUNK - 1) // CHUNK):
        pdf = _generate_chunk(cid, seed)
        hi = min(n_docs - cid * CHUNK, CHUNK)
        chunks.append(pdf.iloc[:hi])
    return pd.concat(chunks, ignore_index=True)


def generate_pages_spark(spark, n_docs: int, seed: int = 42, partitions: int | None = None):
    """Distributed generator: identical rows to generate_pages, produced
    in parallel via mapInPandas over chunk ids (the corpus-generation
    analogue of a distributed WARC ingest)."""
    from pyspark.sql import functions as F
    from pyspark.sql import types as T

    n_chunks = (n_docs + CHUNK - 1) // CHUNK
    parts = partitions or max(32, n_chunks // 4)
    cids = spark.range(n_chunks).repartition(parts)

    schema = T.StructType(
        [
            T.StructField("url", T.StringType(), False),
            T.StructField("warc_ts", T.TimestampType(), True),
            T.StructField("html", T.BinaryType(), True),
            T.StructField("text", T.StringType(), True),
            T.StructField("lang", T.StringType(), True),
        ]
    )

    def gen(batches):
        for pdf in batches:
            for cid in pdf["id"].tolist():
                out = _generate_chunk(int(cid), seed)
                hi = min(n_docs - int(cid) * CHUNK, CHUNK)
                yield out.iloc[:hi]

    return cids.mapInPandas(gen, schema)


def reference_queries(seed: int = 42) -> pd.DataFrame:
    """The reference query set (FIXTURES.md §2): 50 seeded queries.

    Mix of head/mid/tail single terms, 2-term, 3-5 term, one
    out-of-vocabulary term (empty result), duplicated-term queries, and
    k in {1, 10, 100}.
    """
    rng = np.random.default_rng(seed + 1)
    vocab = vocabulary()
    rows = []
    qid = 0

    def add(text: str, k: int = 10) -> None:
        nonlocal qid
        rows.append({"query_id": qid, "query_text": text, "k": k})
        qid += 1

    # single terms: head, mid, tail
    for t in [0, 1, 2, 5, 9]:
        add(vocab[t])
    for t in [50, 200, 800]:
        add(vocab[t])
    for t in [3000, 4500, 4999]:
        add(vocab[t])
    # 2-term
    for _ in range(12):
        a, b = rng.integers(0, VOCAB_SIZE, 2)
        add(f"{vocab[a]} {vocab[b]}")
    # 3-5 term
    for _ in range(15):
        n = int(rng.integers(3, 6))
        ts = rng.integers(0, VOCAB_SIZE, n)
        add(" ".join(vocab[t] for t in ts))
    # head+tail co-occurrence stress
    add(f"{vocab[0]} {vocab[4999]}")
    add(f"{vocab[1]} {vocab[4500]} {vocab[3]}")
    # out-of-vocabulary -> empty result
    add("zzzznotaterm")
    add(f"{vocab[2]} zzzznotaterm")
    # duplicated terms (scored once per distinct term, like SQL DISTINCT)
    add(f"{vocab[7]} {vocab[7]} {vocab[7]}")
    # k variants
    add(vocab[3], k=1)
    add(vocab[4], k=100)
    add(f"{vocab[10]} {vocab[20]} {vocab[30]}", k=100)
    while qid < 50:
        a, b = rng.integers(0, VOCAB_SIZE, 2)
        add(f"{vocab[a]} {vocab[b]}")
    return pd.DataFrame(rows)


def pages_to_spark(spark, pdf: pd.DataFrame, partitions: int | None = None):
    """pandas pages -> Spark DataFrame with the mandated schema."""
    from pyspark.sql import types as T

    schema = T.StructType(
        [
            T.StructField("url", T.StringType(), False),
            T.StructField("warc_ts", T.TimestampType(), True),
            T.StructField("html", T.BinaryType(), True),
            T.StructField("text", T.StringType(), True),
            T.StructField("lang", T.StringType(), True),
        ]
    )
    df = spark.createDataFrame(pdf, schema=schema)
    if partitions:
        df = df.repartition(partitions)
    return df
