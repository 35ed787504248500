"""Positional postings + phrase/proximity search vs an independent
pure-Python reference (shared tokenizer only — the matching logic is
re-derived here from the definition, not imported)."""

from __future__ import annotations

import random

import pytest
from pyspark.sql import functions as F

from fornax_spark.fulltext.positional import (
    build_positional_postings,
    phrase_match,
    phrase_topk,
)
from fornax_spark.fulltext.textproc import tokenize

VOCAB = ["spark", "join", "window", "table", "hash", "scan", "agg", "row"]


def _mk_docs(n: int, seed: int) -> list[tuple[int, str]]:
    rng = random.Random(seed)
    return [
        (i, " ".join(rng.choice(VOCAB) for _ in range(rng.randint(0, 40))))
        for i in range(n)
    ]


def _ref_phrase(docs, terms, max_gap):
    """Independent oracle: literal transcription of the definition."""
    out = {}
    for doc_id, text in docs:
        toks = tokenize(text)
        pos = {
            t: [i for i, x in enumerate(toks, 1) if x == t]
            for t in set(terms)
        }
        acc = pos.get(terms[0], [])
        for t in terms[1:]:
            prev = acc
            acc = [
                p for p in pos.get(t, []) if any(1 <= p - q <= max_gap for q in prev)
            ]
        if acc:
            out[doc_id] = len(acc)
    return out


def _postings(spark, docs):
    df = spark.createDataFrame(docs, "doc_id long, text string")
    return build_positional_postings(df)


@pytest.mark.parametrize(
    "terms,max_gap",
    [
        (["spark", "join"], 1),
        (["spark", "join"], 3),
        (["table", "hash", "scan"], 1),
        (["table", "hash", "scan"], 4),
        (["spark"], 1),
        (["spark", "spark"], 1),
        (["join", "spark", "join"], 2),
    ],
)
def test_phrase_match_equals_reference(spark, terms, max_gap):
    docs = _mk_docs(400, seed=7)
    got = {
        r["doc_id"]: r["phrase_tf"]
        for r in phrase_match(_postings(spark, docs), terms, max_gap).collect()
    }
    assert got == _ref_phrase(docs, terms, max_gap)


def test_single_term_phrase_tf_equals_tf(spark):
    docs = _mk_docs(200, seed=11)
    p = _postings(spark, docs)
    got = {
        r["doc_id"]: r["phrase_tf"]
        for r in phrase_match(p, ["window"], 1).collect()
    }
    want = {
        r["doc_id"]: r["tf"]
        for r in p.filter(F.col("term") == "window").collect()
    }
    assert got == want


def test_positional_postings_agree_with_tf_index(spark):
    """tf and dl derived from positions must equal build.py's tf-only
    pipeline on the same docs (two independent one-pass tokenizer UDFs)."""
    from fornax_spark.fulltext.build import build_postings, docs_with_tokens

    docs = _mk_docs(150, seed=3)
    df = spark.createDataFrame(docs, "doc_id long, text string")
    # build.py hashes url -> doc_id, so doc ids differ; compare the
    # id-independent per-term aggregates (sum tf, df) exactly.
    a = (
        build_positional_postings(df)
        .groupBy("term")
        .agg(F.sum("tf").alias("stf"), F.count("*").alias("df"))
    )
    b = (
        build_postings(
            docs_with_tokens(
                df.select(F.col("doc_id").cast("string").alias("url"), "text"),
                from_html=False,
            )
        )
        .groupBy("term")
        .agg(F.sum("tf").alias("stf"), F.count("*").alias("df"))
    )
    assert {tuple(r) for r in a.collect()} == {tuple(r) for r in b.collect()}


def test_phrase_topk_rank_contract(spark):
    docs = _mk_docs(400, seed=7)
    out = phrase_topk(spark, _postings(spark, docs), "spark join", k=5).collect()
    assert [r["rank"] for r in out] == list(range(1, len(out) + 1))
    keys = [(-r["phrase_tf"], r["doc_id"]) for r in out]
    assert keys == sorted(keys)
    ref = _ref_phrase(docs, ["spark", "join"], 1)
    want = sorted(((-tf, d) for d, tf in ref.items()))[: len(out)]
    assert keys == want


def test_phrase_bm25_topk_equals_reference(spark):
    import math

    from fornax_spark.fulltext.positional import phrase_bm25_topk

    docs = _mk_docs(400, seed=7)
    dls = {d: len(tokenize(t)) for d, t in docs}
    n = len(docs)
    avgdl = sum(dls.values()) / n
    ref = _ref_phrase(docs, ["spark", "join"], 1)
    dfp = len(ref)
    k1, b = 1.2, 0.75

    def score(d, tf):
        idf = math.log(1 + (n - dfp + 0.5) / (dfp + 0.5))
        return idf * tf * (k1 + 1) / (tf + k1 * (1 - b + b * dls[d] / avgdl))

    want = sorted(
        ((d, score(d, tf)) for d, tf in ref.items()),
        key=lambda x: (-x[1], x[0]),
    )[:10]
    got = phrase_bm25_topk(
        spark, _postings(spark, docs), "spark join", n_docs=n, avgdl=avgdl, k=10
    ).collect()
    assert [r["doc_id"] for r in got] == [d for d, _ in want]
    for r, (_, s) in zip(got, want):
        assert abs(r["score"] - s) < 1e-9
    assert [r["rank"] for r in got] == list(range(1, len(got) + 1))


def test_phrase_errors(spark):
    docs = _mk_docs(10, seed=1)
    p = _postings(spark, docs)
    with pytest.raises(ValueError):
        phrase_match(p, [], 1)
    with pytest.raises(ValueError):
        phrase_match(p, ["spark"], 0)
    assert phrase_topk(spark, p, "", k=3).count() == 0


def test_phrase_absent_term_empty(spark):
    docs = _mk_docs(50, seed=2)
    assert phrase_match(_postings(spark, docs), ["spark", "zzz"], 3).count() == 0


def test_phrase_batch_equals_per_phrase(spark):
    from fornax_spark.fulltext.positional import (
        phrase_match_batch,
        phrase_topk_batch,
    )

    docs = _mk_docs(300, seed=19)
    p = _postings(spark, docs)
    phrases = [
        "spark join",
        "table hash scan",
        "window",
        "zzz spark",  # absent term -> no hits
        "join join",
        "",  # empty -> skipped query_id entirely
    ]
    for gap in (1, 3):
        got = {
            (r["query_id"], r["doc_id"]): r["phrase_tf"]
            for r in phrase_match_batch(spark, p, phrases, max_gap=gap).collect()
        }
        want = {}
        for qid, ph in enumerate(phrases):
            terms = tokenize(ph)
            if not terms:
                continue
            for d, tf in _ref_phrase(docs, terms, gap).items():
                want[(qid, d)] = tf
        assert got == want

    # batched top-k == single-phrase top-k per query
    from fornax_spark.fulltext.positional import phrase_topk

    out = phrase_topk_batch(spark, p, phrases, k=5, max_gap=2).collect()
    by_qid: dict[int, list] = {}
    for r in out:
        by_qid.setdefault(r["query_id"], []).append(
            (r["rank"], r["doc_id"], r["phrase_tf"])
        )
    for qid, ph in enumerate(phrases):
        single = [
            (r["rank"], r["doc_id"], r["phrase_tf"])
            for r in phrase_topk(spark, p, ph, k=5, max_gap=2).collect()
        ]
        assert by_qid.get(qid, []) == single


def test_positional_store_roundtrip(spark, tmp_path):
    from fornax_spark.fulltext.positional import (
        open_positional_store,
        write_positional_store,
    )

    docs = _mk_docs(300, seed=13)
    df = spark.createDataFrame(docs, "doc_id long, text string")
    store = write_positional_store(spark, df, str(tmp_path / "pos"))
    opened = open_positional_store(str(tmp_path / "pos"))
    assert (opened.n_docs, opened.avgdl) == (store.n_docs, store.avgdl)

    # store-served phrase results == in-memory DataFrame path, both kinds
    mem = build_positional_postings(df)
    for phrase, gap in (("table hash", 1), ("spark join", 4)):
        a = opened.phrase_topk(spark, phrase, k=10, max_gap=gap).collect()
        b = phrase_topk(spark, mem, phrase, k=10, max_gap=gap).collect()
        assert [tuple(r) for r in a] == [tuple(r) for r in b]
    s = opened.phrase_bm25_topk(spark, "table hash", k=10).collect()
    from fornax_spark.fulltext.positional import phrase_bm25_topk

    t = phrase_bm25_topk(
        spark, mem, "table hash", n_docs=store.n_docs, avgdl=store.avgdl, k=10
    ).collect()
    assert [(r["rank"], r["doc_id"]) for r in s] == [
        (r["rank"], r["doc_id"]) for r in t
    ]
    for x, y in zip(s, t):
        assert abs(x["score"] - y["score"]) < 1e-12

    # the phrase's term filter reaches the parquet scan (row-group
    # pruning is what makes the store cheap at scale)
    plan = (
        opened.postings(spark)
        .filter(F.col("term").isin(["table", "hash"]))
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "PushedFilters" in plan and "In(term" in plan


def test_positional_store_in_registry(spark, tmp_path):
    """Positional stores live in the same typed registry namespace as
    segment/ANN stores and reopen through Registry.open (no spark= needed
    — the ledger is fs-only)."""
    from fornax_spark.fulltext.positional import write_positional_store
    from fornax_spark.fulltext.registry import Registry

    reg = Registry(str(tmp_path / "reg"))
    _cid, path = reg.create("docs-pos", kind="positional")
    docs = _mk_docs(100, seed=23)
    df = spark.createDataFrame(docs, "doc_id long, text string")
    built = write_positional_store(spark, df, path)

    assert {r["name"]: r["kind"] for r in reg.list()} == {
        "docs-pos": "positional"
    }
    opened = reg.open("docs-pos")
    assert (opened.n_docs, opened.avgdl) == (built.n_docs, built.avgdl)
    a = opened.phrase_topk(spark, "spark join", k=5, max_gap=3).collect()
    b = built.phrase_topk(spark, "spark join", k=5, max_gap=3).collect()
    assert [tuple(r) for r in a] == [tuple(r) for r in b]

    reg.delete("docs-pos")
    import os

    assert not os.path.exists(path)


def test_positional_store_format_guard(spark, tmp_path):
    import json

    from fornax_spark.fulltext.positional import (
        open_positional_store,
        write_positional_store,
    )

    docs = _mk_docs(20, seed=5)
    df = spark.createDataFrame(docs, "doc_id long, text string")
    write_positional_store(spark, df, str(tmp_path / "pos2"))
    ledger_path = tmp_path / "pos2" / "ledger.json"
    ledger = json.loads(ledger_path.read_text())
    ledger["format"] = 999
    ledger_path.write_text(json.dumps(ledger))
    with pytest.raises(ValueError, match="format"):
        open_positional_store(str(tmp_path / "pos2"))


def _df(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_positional_lifecycle_equals_clean_rebuild(spark, tmp_path):
    """build(half) -> add_docs(rest + junk) -> delete_docs(junk) ->
    compact: stats and every query form equal a clean rebuild over the
    surviving docs (the segment store's LSM invariant, on the
    positional store)."""
    from fornax_spark.fulltext.positional import (
        open_positional_store,
        write_positional_store,
    )

    docs = _mk_docs(400, seed=31)
    junk = [(10_000 + i, "spark join spark join") for i in range(7)]
    st = write_positional_store(
        spark, _df(spark, docs[:250]), str(tmp_path / "st"), n_partitions=4
    )
    st.add_docs(spark, _df(spark, docs[250:] + junk))
    st.delete_docs(spark, [j for j, _ in junk])
    clean = write_positional_store(
        spark, _df(spark, docs), str(tmp_path / "clean"), n_partitions=4
    )
    assert (st.n_docs, st.total_dl) == (clean.n_docs, clean.total_dl)
    assert st.avgdl == clean.avgdl  # same ints, same division
    for q, g in [("spark join", 2), ("table hash scan", 1), ("window", 1)]:
        a = st.phrase_topk(spark, q, k=8, max_gap=g).collect()
        b = clean.phrase_topk(spark, q, k=8, max_gap=g).collect()
        assert [tuple(r) for r in a] == [tuple(r) for r in b]
        a2 = st.phrase_bm25_topk(spark, q, k=8, max_gap=g).collect()
        b2 = clean.phrase_bm25_topk(spark, q, k=8, max_gap=g).collect()
        assert [(r["rank"], r["doc_id"]) for r in a2] == [
            (r["rank"], r["doc_id"]) for r in b2
        ]
        for ra, rb in zip(a2, b2):
            assert abs(ra["score"] - rb["score"]) < 1e-9
    # compact folds to one tombstone-free generation; results unchanged
    # and durable across a reopen
    before = [tuple(r) for r in st.phrase_topk(spark, "spark join", 8, 2).collect()]
    st.compact(spark)
    assert len(st.generations) == 1 and st.tombstones == []
    import os

    assert sorted(
        d for d in os.listdir(st.path) if d.startswith("postings")
    ) == st.generations
    re = open_positional_store(str(tmp_path / "st"))
    assert (re.n_docs, re.avgdl, re.generations, re.tombstones) == (
        st.n_docs,
        st.avgdl,
        st.generations,
        st.tombstones,
    )
    after = [tuple(r) for r in re.phrase_topk(spark, "spark join", 8, 2).collect()]
    assert before == after


def test_positional_add_docs_validation(spark, tmp_path):
    """Duplicate-in-batch, already-live, and tombstoned doc_ids all
    raise; re-adding a tombstoned id works after compact()."""
    from fornax_spark.fulltext.positional import write_positional_store

    st = write_positional_store(
        spark,
        _df(spark, [(1, "spark join table"), (2, "hash scan row")]),
        str(tmp_path / "st"),
        n_partitions=2,
    )
    with pytest.raises(ValueError, match="duplicated within"):
        st.add_docs(spark, _df(spark, [(9, "agg"), (9, "row")]))
    with pytest.raises(ValueError, match="already live"):
        st.add_docs(spark, _df(spark, [(1, "spark")]))
    st.delete_docs(spark, [1])
    assert st.n_docs == 1
    with pytest.raises(ValueError, match="tombstoned"):
        st.add_docs(spark, _df(spark, [(1, "spark")]))
    st.compact(spark)
    st.add_docs(spark, _df(spark, [(1, "join join join")]))
    got = {
        r["doc_id"]: r["phrase_tf"]
        for r in st.phrase_topk(spark, "join", k=5).collect()
    }
    assert got == {1: 3}
    # idempotent/no-op deletes: absent ids and re-deletes change nothing
    st.delete_docs(spark, [999])
    st.delete_docs(spark, [])
    assert st.n_docs == 2


def test_streamed_positional_equals_batch(spark, tmp_path):
    """Structured Streaming -> positional store: a readStream over the
    pages directory feeds foreachBatch, whose sink creates the store on
    the first non-empty batch and add_docs()es every later one. The
    resulting store must equal a batch-built store over the same pages
    (stats exactly, phrase/proximity/BM25 results bit-for-bit)."""
    from pyspark.sql import functions as SF

    from fornax_spark.fulltext.corpus import generate_pages, pages_to_spark
    from fornax_spark.fulltext.positional import (
        open_positional_store,
        write_positional_store,
    )

    pages = generate_pages(200, seed=53)
    full = pages_to_spark(spark, pages, partitions=4)
    pdir = str(tmp_path / "pages")
    spath = str(tmp_path / "stream_store")
    bpath = str(tmp_path / "batch_store")

    state: dict = {}

    def sink(batch_df, batch_id):
        docs = batch_df.select(
            SF.xxhash64("url").alias("doc_id"), "text"
        )
        if docs.isEmpty():
            return
        if "store" not in state:
            state["store"] = write_positional_store(
                spark, docs, spath, n_partitions=4
            )
        else:
            state["store"].add_docs(spark, docs)

    def run_stream():
        q = (
            spark.readStream.schema(full.schema)
            .option("maxFilesPerTrigger", 1)
            .parquet(pdir)
            .writeStream.foreachBatch(sink)
            .option("checkpointLocation", str(tmp_path / "ckpt"))
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)

    pages_to_spark(spark, pages[:120], partitions=2).write.mode(
        "append"
    ).parquet(pdir)
    run_stream()
    pages_to_spark(spark, pages[120:], partitions=2).write.mode(
        "append"
    ).parquet(pdir)
    run_stream()

    assert len(state["store"].generations) > 1  # really incremental
    streamed = open_positional_store(spath)
    batch = write_positional_store(
        spark,
        full.select(SF.xxhash64("url").alias("doc_id"), "text"),
        bpath,
        n_partitions=4,
    )
    assert (streamed.n_docs, streamed.total_dl) == (
        batch.n_docs,
        batch.total_dl,
    )
    assert streamed.avgdl == batch.avgdl
    for q, g in [("term00001 term00500", 3), ("term00002", 1)]:
        a = streamed.phrase_topk(spark, q, k=8, max_gap=g).collect()
        b = batch.phrase_topk(spark, q, k=8, max_gap=g).collect()
        assert [tuple(r) for r in a] == [tuple(r) for r in b]
        a2 = streamed.phrase_bm25_topk(spark, q, k=8, max_gap=g).collect()
        b2 = batch.phrase_bm25_topk(spark, q, k=8, max_gap=g).collect()
        assert [tuple(r) for r in a2] == [tuple(r) for r in b2]


def _ref_min_window(docs, terms):
    """Literal transcription: smallest window covering all terms; ties
    keep the earliest endpoint."""
    tset = sorted(set(terms))
    res = {}
    for doc_id, text in docs:
        toks = tokenize(text)
        pos = {t: [i for i, x in enumerate(toks, 1) if x == t] for t in tset}
        if any(not v for v in pos.values()):
            continue
        merged = sorted(
            (p, i) for i, t in enumerate(tset) for p in pos[t]
        )
        last = [-1] * len(tset)
        best = (1 << 30, -1, -1)
        for p, tid in merged:
            last[tid] = p
            if -1 not in last:
                s = min(last)
                ln = p - s + 1
                if ln < best[0]:
                    best = (ln, s, p)
        res[doc_id] = best
    return res


@pytest.mark.parametrize(
    "query", ["spark join", "table hash scan", "window", "join join spark"]
)
def test_min_window_equals_reference(spark, query):
    from fornax_spark.fulltext.positional import min_window_topk

    docs = _mk_docs(350, seed=67)
    ref = _ref_min_window(docs, tokenize(query))
    want = sorted(
        ((ln, d, s, e) for d, (ln, s, e) in ref.items())
    )[:15]
    got = [
        (r["win_len"], r["doc_id"], r["win_start"], r["win_end"])
        for r in min_window_topk(
            spark, _postings(spark, docs), query, k=15
        ).collect()
    ]
    assert got == [(ln, d, s, e) for ln, d, s, e in want]


def test_min_window_store_and_edge_cases(spark, tmp_path):
    from fornax_spark.fulltext.positional import (
        min_window_topk,
        write_positional_store,
    )

    docs = [(1, "spark a b join"), (2, "join spark"), (3, "spark only")]
    p = _postings(spark, docs)
    rows = {r["doc_id"]: tuple(r) for r in min_window_topk(spark, p, "spark join", k=5).collect()}
    # doc 2: [join, spark] covers both in 2 tokens; doc 1 needs 4
    assert rows[2][2:] == (1, 2, 2) and rows[1][2:] == (1, 4, 4)
    assert 3 not in rows  # missing a term
    assert min_window_topk(spark, p, "", k=5).count() == 0
    assert min_window_topk(spark, p, "zzz spark", k=5).count() == 0
    st = write_positional_store(
        spark, spark.createDataFrame(docs, "doc_id long, text string"),
        str(tmp_path / "st"), n_partitions=2,
    )
    a = [tuple(r) for r in st.min_window_topk(spark, "spark join", k=5).collect()]
    b = [tuple(r) for r in min_window_topk(spark, p, "spark join", k=5).collect()]
    assert a == b


def test_min_window_for_docs_matches_topk(spark, tmp_path):
    """Page-scoped snippets == the corpus-wide sweep restricted to the
    same doc_ids; unknown ids and docs missing a term are absent."""
    from fornax_spark.fulltext.positional import (
        min_window_for_docs,
        min_window_topk,
        write_positional_store,
    )

    docs = _mk_docs(300, seed=71)
    p = _postings(spark, docs)
    top = min_window_topk(spark, p, "spark join", k=8).collect()
    ids = [r["doc_id"] for r in top]
    page = min_window_for_docs(
        spark, p, "spark join", ids + [999_999]
    ).collect()
    assert sorted(
        (r["doc_id"], r["win_start"], r["win_end"], r["win_len"])
        for r in page
    ) == sorted(
        (r["doc_id"], r["win_start"], r["win_end"], r["win_len"])
        for r in top
    )
    assert min_window_for_docs(spark, p, "spark join", []).count() == 0
    # store method parity
    st = write_positional_store(
        spark, spark.createDataFrame(docs, "doc_id long, text string"),
        str(tmp_path / "st"), n_partitions=2,
    )
    a = [tuple(r) for r in st.min_window_for_docs(spark, "spark join", ids).collect()]
    b = [tuple(r) for r in min_window_for_docs(spark, p, "spark join", ids).collect()]
    assert a == b


def test_snippets_for_docs_equals_reference(spark):
    """Snippet text == the padded token slice of the reference min
    window, for the page's docs only."""
    from fornax_spark.fulltext.positional import (
        min_window_topk,
        snippets_for_docs,
    )

    docs = _mk_docs(250, seed=73)
    p = _postings(spark, docs)
    q = "spark join"
    top = min_window_topk(spark, p, q, k=6).collect()
    ids = [r["doc_id"] for r in top]
    df = spark.createDataFrame(docs, "doc_id long, text string")
    got = {
        r["doc_id"]: (r["win_start"], r["win_end"], r["snippet"])
        for r in snippets_for_docs(spark, p, df, q, ids, pad=2).collect()
    }
    ref = _ref_min_window(docs, tokenize(q))
    text_by_id = dict(docs)
    want = {}
    for d in ids:
        ln, s, e = ref[d]
        toks = tokenize(text_by_id[d])
        s2, e2 = max(1, s - 2), min(len(toks), e + 2)
        want[d] = (s, e, " ".join(toks[s2 - 1 : e2]))
    assert got == want
    assert snippets_for_docs(spark, p, df, q, [], pad=2).count() == 0
