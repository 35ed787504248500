"""Query-string mini-language: parser unit tests (no Spark) plus
end-to-end parity of search_query against hand-composed verbs and a
pure-Python reference for the phrase-filter composition."""

from __future__ import annotations

import random

import pytest

from fornax_spark.fulltext.build import build_index_from_table
from fornax_spark.fulltext.positional import build_positional_postings
from fornax_spark.fulltext.qlang import (
    parse_query,
    search_query,
    search_query_segments,
)
from fornax_spark.fulltext.query import search_boolean
from fornax_spark.fulltext.textproc import tokenize

VOCAB = ["spark", "join", "window", "table", "hash", "scan", "agg", "row"]


def _mk_docs(n: int, seed: int):
    rng = random.Random(seed)
    return [
        (i, " ".join(rng.choice(VOCAB) for _ in range(rng.randint(2, 25))))
        for i in range(n)
    ]


# ---------------------------------------------------------------- parser


def test_parse_query_clauses():
    p = parse_query('spark +table -row "hash scan" -"agg window" join')
    assert p.should == ["join", "spark"]
    assert p.must == ["table"]
    assert p.must_not == ["row"]
    assert p.phrases == [["hash", "scan"]]
    assert p.neg_phrases == [["agg", "window"]]
    assert p.scored_terms == ["join", "spark", "table"]


def test_parse_query_edges():
    # one-word "phrase" degrades to a term clause; must beats should
    p = parse_query('"table" spark +spark -"row"')
    assert p.must == ["spark", "table"]
    assert p.should == []
    assert p.must_not == ["row"]
    assert not p.phrases and not p.neg_phrases
    # normalization: case, punctuation, empty clauses
    p2 = parse_query("SPARK +TaBle!! ...")
    assert p2.should == ["spark"] and p2.must == ["table"]
    with pytest.raises(ValueError, match="unbalanced"):
        parse_query('spark "hash scan')
    with pytest.raises(ValueError, match="scored and banned"):
        parse_query("spark -spark")


# ------------------------------------------------------------ end-to-end


@pytest.fixture(scope="module")
def qcorpus(spark):
    docs = _mk_docs(300, seed=29)
    df = spark.createDataFrame(docs, "doc_id long, text string")
    idx = build_index_from_table(df, "doc_id", "text").persist()
    pos = build_positional_postings(df).persist()
    yield docs, idx, pos
    idx.postings.unpersist()
    pos.unpersist()


def _has_phrase(text: str, terms: list[str]) -> bool:
    toks = tokenize(text)
    return any(
        toks[i : i + len(terms)] == terms
        for i in range(len(toks) - len(terms) + 1)
    )


def test_search_query_equals_boolean_when_no_phrases(spark, qcorpus):
    _, idx, _ = qcorpus
    a = search_query(spark, idx, "spark join +table -row", k=9).collect()
    b = search_boolean(
        spark, idx, should="spark join", must="table", must_not="row", k=9
    ).collect()
    assert [tuple(r) for r in a] == [tuple(r) for r in b]
    assert len(a) > 0


def test_search_query_phrase_filters_compose(spark, qcorpus):
    """+phrase keeps only phrase docs, -phrase drops them, both applied
    BEFORE the top-k cut (vs a reference built from search_boolean at
    corpus-size k + a python phrase filter)."""
    docs, idx, pos = qcorpus
    q = 'spark join "table hash"'
    got = [tuple(r) for r in search_query(
        spark, idx, q, k=6, positional_postings=pos
    ).collect()]
    full = search_boolean(spark, idx, should="spark join", k=10**6).collect()
    text = dict(docs)
    keep = [
        (r["doc_id"], r["score"])
        for r in full
        if _has_phrase(text[r["doc_id"]], ["table", "hash"])
    ][:6]
    assert [(d, s) for _, d, s in got] == keep
    assert got  # the corpus is dense enough that the phrase occurs

    neg = [tuple(r) for r in search_query(
        spark, idx, 'spark join -"table hash"', k=6,
        positional_postings=pos,
    ).collect()]
    keep_neg = [
        (r["doc_id"], r["score"])
        for r in full
        if not _has_phrase(text[r["doc_id"]], ["table", "hash"])
    ][:6]
    assert [(d, s) for _, d, s in neg] == keep_neg


def test_search_query_bare_phrase_dispatch(spark, qcorpus):
    """A query that is exactly one required phrase scores via
    phrase-as-virtual-term BM25."""
    from fornax_spark.fulltext.positional import phrase_bm25_topk

    _, idx, pos = qcorpus
    a = search_query(
        spark, idx, '"spark join"', k=5, positional_postings=pos
    ).collect()
    b = phrase_bm25_topk(
        spark, pos, "spark join",
        n_docs=idx.stats.n_docs, avgdl=idx.stats.avgdl, k=5,
    ).collect()
    assert [tuple(r) for r in a] == [tuple(r) for r in b]
    assert len(a) > 0


def test_search_query_errors(spark, qcorpus):
    _, idx, pos = qcorpus
    with pytest.raises(ValueError, match="positional"):
        search_query(spark, idx, 'spark "table hash"')
    with pytest.raises(ValueError, match="scoring"):
        search_query(spark, idx, "-row", positional_postings=pos)
    with pytest.raises(ValueError, match="scoring"):
        search_query(
            spark, idx, '"spark join" "table hash"',
            positional_postings=pos,
        )


def test_search_query_segments_matches_index(spark, qcorpus, tmp_path):
    from fornax_spark.fulltext.positional import write_positional_store
    from fornax_spark.fulltext.segments import build_segments

    docs, idx, pos = qcorpus
    store = build_segments(spark, idx, str(tmp_path / "ql"), n_buckets=8)
    df = spark.createDataFrame(docs, "doc_id long, text string")
    pstore = write_positional_store(
        spark, df, str(tmp_path / "qp"), n_partitions=4
    )
    q = 'spark +join -row "table hash"'
    a = search_query_segments(
        spark, store, q, k=7, positional=pstore
    ).collect()
    b = search_query(
        spark, idx, q, k=7, positional_postings=pos
    ).collect()
    assert [(r["rank"], r["doc_id"]) for r in a] == [
        (r["rank"], r["doc_id"]) for r in b
    ]
    for ra, rb in zip(a, b):
        assert abs(ra["score"] - rb["score"]) < 1e-9


def test_facade_positional_sidecar(spark, tmp_path):
    """build_positional registers a sidecar; search_query auto-uses it
    for phrase clauses; describe() reports store metadata; delete()
    cascades the sidecar row and files."""
    from fornax_spark import Connection

    conn = Connection(str(tmp_path / "fx"), spark)
    docs = _mk_docs(150, seed=31)
    df = spark.createDataFrame(docs, "doc_id long, text string")
    c = conn.create_corpus("pages").build(df, n_buckets=4)
    q = 'spark +join "table hash"'
    with pytest.raises(ValueError, match="positional"):
        c.search_query(q)  # phrase clause, no sidecar yet
    c.build_positional(df)
    got = c.search_query(q, k=6).collect()
    idx = build_index_from_table(df, "doc_id", "text")
    pos = build_positional_postings(df)
    want = search_query(spark, idx, q, k=6, positional_postings=pos).collect()
    assert [(r["rank"], r["doc_id"]) for r in got] == [
        (r["rank"], r["doc_id"]) for r in want
    ]
    assert len(got) > 0
    with pytest.raises(ValueError, match="already has"):
        c.build_positional(df)

    d = c.describe()
    assert d["built"] and d["has_positional"]
    assert d["n_docs"] == 150 and d["store_bytes"] > 0
    assert d["codec"] == "varint" and d["published_bucketed"] is False

    sidecar_path = c._registry().open("pages__positional").path
    import os as _os

    assert _os.path.exists(sidecar_path)
    c.delete()
    assert not _os.path.exists(sidecar_path)
    with pytest.raises(KeyError):
        conn._fulltext_registry().open("pages__positional")


def test_parse_query_properties():
    """Property test: for any clause soup the parser (a) never leaves a
    term both scored and banned without raising, (b) emits only
    tokenizer-normalized single terms, (c) is deterministic, and
    (d) round-trips a canonical rebuild of its own output."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    word = st.sampled_from(VOCAB + ["Zebra", "toK9", "a-b", "x!"])
    clause = st.one_of(
        word,
        word.map(lambda w: f"+{w}"),
        word.map(lambda w: f"-{w}"),
        st.tuples(word, word).map(lambda t: f'"{t[0]} {t[1]}"'),
        st.tuples(word, word).map(lambda t: f'-"{t[0]} {t[1]}"'),
    )

    @settings(max_examples=200, deadline=None)
    @given(st.lists(clause, min_size=0, max_size=8))
    def check(clauses):
        q = " ".join(clauses)
        try:
            p = parse_query(q)
        except ValueError:
            return  # scored-and-banned soup is allowed to raise
        for t in p.should + p.must + p.must_not:
            assert tokenize(t) == [t]
        assert not (set(p.should) | set(p.must)) & set(p.must_not)
        assert not set(p.should) & set(p.must)
        assert p.should == sorted(set(p.should))
        p2 = parse_query(q)
        assert (p2.should, p2.must, p2.must_not, p2.phrases,
                p2.neg_phrases) == (
            p.should, p.must, p.must_not, p.phrases, p.neg_phrases
        )
        # canonical rebuild of the parse re-parses to the same clauses
        rebuilt = " ".join(
            [f"+{t}" for t in p.must]
            + p.should
            + [f"-{t}" for t in p.must_not]
            + ['"%s"' % " ".join(ph) for ph in p.phrases]
            + ['-"%s"' % " ".join(ph) for ph in p.neg_phrases]
        )
        p3 = parse_query(rebuilt)
        assert (p3.should, p3.must, p3.must_not) == (
            p.should, p.must, p.must_not
        )
        assert sorted(map(tuple, p3.phrases)) == sorted(
            map(tuple, p.phrases)
        )
        assert sorted(map(tuple, p3.neg_phrases)) == sorted(
            map(tuple, p.neg_phrases)
        )

    check()


def test_facade_serp(spark, tmp_path):
    """serp() == search() + snippets_for_docs composition; snippet NULL
    for hits missing a query term; raises without a sidecar."""
    from fornax_spark import Connection
    from fornax_spark.fulltext.positional import snippets_for_docs

    conn = Connection(str(tmp_path / "fx"), spark)
    docs = _mk_docs(120, seed=37)
    df = spark.createDataFrame(docs, "doc_id long, text string")
    c = conn.create_corpus("serp").build(df, n_buckets=4)
    with pytest.raises(ValueError, match="positional sidecar"):
        c.serp("spark join", df)
    c.build_positional(df)

    q = "spark join"
    out = c.serp(q, df, k=6, pad=2).collect()
    hits = c.search(q, k=6).collect()
    assert [(r["rank"], r["doc_id"], r["score"]) for r in out] == [
        (r["rank"], r["doc_id"], r["score"]) for r in hits
    ]
    pos = c._positional()
    want = {
        r["doc_id"]: r["snippet"]
        for r in snippets_for_docs(
            spark, pos.postings(spark), df, q,
            [r["doc_id"] for r in hits], pad=2,
        ).collect()
    }
    text = dict(docs)
    for r in out:
        assert r["snippet"] == want.get(r["doc_id"])
        toks = tokenize(text[r["doc_id"]])
        if r["snippet"] is not None:
            # snippet is a contiguous token slice of the doc
            st = r["snippet"].split(" ")
            assert any(
                toks[i : i + len(st)] == st
                for i in range(len(toks) - len(st) + 1)
            )
        else:
            # NULL only when some query term is absent from the doc
            assert not set(tokenize(q)) <= set(toks)
