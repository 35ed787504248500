"""Lucene-style query-string mini-language over the engine's verbs.

Grammar (whitespace-separated clauses; `+`/`-` prefixes bind to the
clause that follows them):

    term          SHOULD  — scores, optional
    +term         MUST    — required, scores
    -term         MUST_NOT — excluded, never scored
    "a b c"       required exact phrase (in-order, gap 1)
    +"a b c"      same as "a b c"
    -"a b c"      excluded phrase — docs containing it are dropped

Terms are tokenizer-normalized ([a-z0-9]+, lowercase); a clause that
normalizes to nothing is dropped. Phrases FILTER the candidate set
(semi/anti join on the positional index's match set, applied before
the top-k cut so ranking over the composed set stays exact); scoring
is BM25 over the must ∪ should terms, the same contract as
search_boolean. A query that is exactly one required phrase and
nothing else dispatches to phrase-as-virtual-term BM25
(`positional.phrase_bm25_topk`) so it still returns scored results.

Reference parity: the reference's query surface is programmatic
(query graph + matches, api.py:940-952); this string form is the
conventional search-box front end to the same MUST/SHOULD/exclude
semantics its match weights express.
"""

from __future__ import annotations

import re
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .textproc import tokenize

_CLAUSE = re.compile(r'([+-]?)"([^"]*)"|([+-]?)(\S+)')


@dataclass
class ParsedQuery:
    should: list[str] = field(default_factory=list)
    must: list[str] = field(default_factory=list)
    must_not: list[str] = field(default_factory=list)
    phrases: list[list[str]] = field(default_factory=list)
    neg_phrases: list[list[str]] = field(default_factory=list)

    @property
    def scored_terms(self) -> list[str]:
        return sorted(set(self.should) | set(self.must))


def parse_query(q: str) -> ParsedQuery:
    """Parse the mini-language; raises ValueError on unbalanced quotes
    or a term that is both scored and banned."""
    if q.count('"') % 2:
        raise ValueError(f"parse_query: unbalanced quotes in {q!r}")
    out = ParsedQuery()
    for m in _CLAUSE.finditer(q):
        if m.group(2) is not None:
            sign, body, is_phrase = m.group(1), m.group(2), True
        else:
            sign, body, is_phrase = m.group(3), m.group(4), False
        toks = tokenize(body)
        if not toks:
            continue
        if is_phrase and len(toks) > 1:
            (out.neg_phrases if sign == "-" else out.phrases).append(toks)
        elif is_phrase:
            # one-word "phrase" degrades to the equivalent term clause
            (out.must_not if sign == "-" else out.must).extend(toks)
        elif sign == "+":
            out.must.extend(toks)
        elif sign == "-":
            out.must_not.extend(toks)
        else:
            out.should.extend(toks)
    out.should = sorted(set(out.should) - set(out.must))
    out.must = sorted(set(out.must))
    out.must_not = sorted(set(out.must_not))
    if (set(out.should) | set(out.must)) & set(out.must_not):
        raise ValueError("parse_query: a term is both scored and banned")
    return out


def _phrase_docs(
    positional_postings: DataFrame, phrases: list[list[str]], intersect: bool
) -> DataFrame | None:
    """doc_ids matching ALL (intersect=True) or ANY of `phrases`."""
    from .positional import phrase_match

    if not phrases:
        return None
    sets = [
        phrase_match(positional_postings, terms).select("doc_id")
        for terms in phrases
    ]
    acc = sets[0]
    for s in sets[1:]:
        acc = (
            acc.join(s, "doc_id", "left_semi")
            if intersect
            else acc.unionByName(s)
        )
    return acc


def search_query(
    spark: SparkSession,
    idx,
    q: str,
    k: int = 10,
    positional_postings: DataFrame | None = None,
) -> DataFrame:
    """Run a mini-language query -> (rank, doc_id, score).

    `idx` is an InvertedIndex (or the store-backed view); queries with
    phrase clauses additionally need `positional_postings`
    (positional-index rows: doc_id, term, positions, dl)."""
    from .query import search_boolean

    p = parse_query(q)
    if (p.phrases or p.neg_phrases) and positional_postings is None:
        raise ValueError(
            "search_query: phrase clauses need positional_postings"
        )
    if not p.scored_terms:
        if (
            len(p.phrases) == 1
            and not p.neg_phrases
            and not p.must_not
        ):
            from .positional import phrase_bm25_topk

            return phrase_bm25_topk(
                spark,
                positional_postings,
                " ".join(p.phrases[0]),
                n_docs=idx.stats.n_docs,
                avgdl=idx.stats.avgdl,
                k=k,
            ).select("rank", "doc_id", "score")
        raise ValueError(
            "search_query: no scoring terms (only exclusions or "
            "multiple bare phrases) — add at least one scored term"
        )
    return search_boolean(
        spark,
        idx,
        should=" ".join(p.should),
        must=" ".join(p.must),
        must_not=" ".join(p.must_not),
        k=k,
        require_docs=_phrase_docs(
            positional_postings, p.phrases, intersect=True
        ),
        exclude_docs=_phrase_docs(
            positional_postings, p.neg_phrases, intersect=False
        ),
    )


def search_query_segments(
    spark: SparkSession,
    store,
    q: str,
    k: int = 10,
    positional=None,
) -> DataFrame:
    """search_query served from durable stores: `store` is a
    SegmentStore (lexical legs via the decoded pushed-filter view,
    tombstone-shifted stats); `positional` is a PositionalStore for
    phrase clauses. The positional sidecar is an independent store not
    rewritten by corpus delete_docs, so its postings are anti-joined
    against the segment store's tombstone set here — phrase-only
    results honour the same tombstone-shifted serving guarantee as
    every other store-backed verb (stats are already shifted via
    _store_as_index)."""
    from .wand import _store_as_index, _store_tombstones

    p = parse_query(q)
    terms = sorted(set(p.scored_terms) | set(p.must_not))
    idx = _store_as_index(spark, store, terms or ["\x00none"])
    pos_postings = (
        positional.postings(spark) if positional is not None else None
    )
    if pos_postings is not None:
        tomb, _, _ = _store_tombstones(store)
        if tomb is not None:
            deleted = spark.createDataFrame(
                [(int(d),) for d in tomb.doc_ids], "doc_id long"
            )
            pos_postings = pos_postings.join(
                F.broadcast(deleted), "doc_id", "left_anti"
            )
    return search_query(
        spark,
        idx,
        q,
        k=k,
        positional_postings=pos_postings,
    )
