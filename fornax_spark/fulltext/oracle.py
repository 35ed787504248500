"""Single-process pure-Python oracle engine: dict inverted index + exact BM25.

Plays the role the NeMa paper's figure-4 golden values play for the
reference (/root/reference/test/test_opt.py:69, test_select.py:10,
golden JSON payloads test_api.py:462-671): an externally-derived gold
standard the distributed engine must match rank-identically.

Shares textproc (extract/tokenize/doc-id) and bm25 kernels with the
Spark engine — one code path, two execution substrates.
"""

from __future__ import annotations

from collections import Counter
from dataclasses import dataclass, field

import numpy as np
import pandas as pd

from . import bm25
from .textproc import doc_id_of_url, extract_text, tokenize


@dataclass
class OracleIndex:
    n_docs: int = 0
    avgdl: float = 0.0
    doc_len: dict[int, int] = field(default_factory=dict)
    # term -> {doc_id: tf}
    postings: dict[str, dict[int, int]] = field(default_factory=dict)


def build_index(pages: pd.DataFrame, use_html: bool = True) -> OracleIndex:
    """Index pages(url, html|text). Extraction goes through the shared
    extractor when use_html, otherwise indexes the text column directly."""
    idx = OracleIndex()
    total_len = 0
    for row in pages.itertuples(index=False):
        text = extract_text(bytes(row.html)) if use_html else row.text
        did = doc_id_of_url(row.url)
        toks = tokenize(text)
        idx.doc_len[did] = len(toks)
        total_len += len(toks)
        for term, tf in Counter(toks).items():
            idx.postings.setdefault(term, {})[did] = tf
    idx.n_docs = len(idx.doc_len)
    idx.avgdl = total_len / idx.n_docs if idx.n_docs else 0.0
    return idx


def query_topk(idx: OracleIndex, query_text: str, k: int = 10) -> list[tuple[int, float]]:
    """Exhaustive BM25 top-k: [(doc_id, score)] ordered (score DESC, doc_id ASC).

    Distinct query terms, accumulated in ascending term order (the
    engine-wide float determinism contract in bm25.py).
    """
    terms = sorted(set(tokenize(query_text)))
    scores: dict[int, float] = {}
    for term in terms:  # ascending term order -> fixed summation order
        plist = idx.postings.get(term)
        if not plist:
            continue
        df = len(plist)
        for did, tf in plist.items():
            s = float(
                bm25.term_score(
                    np.array([tf]), np.array([idx.doc_len[did]]), np.array([df]),
                    idx.n_docs, idx.avgdl,
                )[0]
            )
            scores[did] = scores.get(did, 0.0) + s
    ranked = sorted(scores.items(), key=lambda kv: (-kv[1], kv[0]))
    return ranked[:k]


def golden_results(idx: OracleIndex, queries: pd.DataFrame) -> pd.DataFrame:
    """(query_id, rank, doc_id, score) for every query — the golden table."""
    rows = []
    for q in queries.itertuples(index=False):
        for rank, (did, score) in enumerate(query_topk(idx, q.query_text, q.k), 1):
            rows.append(
                {"query_id": q.query_id, "rank": rank, "doc_id": did, "score": score}
            )
    return pd.DataFrame(rows, columns=["query_id", "rank", "doc_id", "score"])
