"""Kernel unit tests: xxh64 parity with Spark, extraction, tokenizer.

Mirrors the reference's kernel-level unit testing with hand-computed
golden values (/root/reference/test/test_opt.py:6-46).
"""

from __future__ import annotations

from pyspark.sql import functions as F

from fornax_spark.fulltext.textproc import (
    doc_id_of_url,
    extract_text,
    tokenize,
    xxh64,
)


def test_xxh64_known_vectors():
    # Public xxHash64 reference vectors (seed 0): xxh64(b"") = 0xEF46DB3751D8E999
    assert xxh64(b"", 0) % (1 << 64) == 0xEF46DB3751D8E999


def test_xxh64_matches_spark(spark):
    urls = [
        "",
        "a",
        "abc",
        "https://site0.example/00000000",
        "https://site996.example/00009999",
        "exactly-32-bytes-string-aaaaaaaa",
        "x" * 31,
        "x" * 33,
        "unicode-café-über-漢字",
    ]
    df = spark.createDataFrame([(u,) for u in urls], ["url"])
    got = {
        r["url"]: r["h"]
        for r in df.select("url", F.xxhash64("url").alias("h")).collect()
    }
    for u in urls:
        assert got[u] == doc_id_of_url(u), u


def test_extract_basic():
    html = b"<html><head><title>t</title><style>p {x}</style></head><body><p>hello &amp; goodbye <b>bold <i>nested</i></b></p></body></html>"
    assert extract_text(html) == "t hello & goodbye bold nested"


def test_extract_nonascii_nfc():
    # decomposed e + combining acute must normalize to NFC é
    html = "<p>café</p>".encode("utf-8")
    assert extract_text(html) == "café"


def test_tokenize():
    assert tokenize("Hello, WORLD 42 foo_bar") == ["hello", "world", "42", "foo", "bar"]
    assert tokenize("café") == ["caf"]  # ASCII tokenizer by contract
    assert tokenize("") == []


def test_extraction_matches_stored_text(spark, tiny_pages):
    """Per-row invariant from BASELINE.json input_hint: byte-identical
    extracted text per url, computed via the Arrow-vectorized UDF."""
    from fornax_spark.fulltext.build import extract_udf
    from fornax_spark.fulltext.corpus import pages_to_spark

    df = pages_to_spark(spark, tiny_pages, partitions=4)
    bad = df.filter(extract_udf(F.col("html")) != F.col("text")).count()
    assert bad == 0
