"""BM25 scoring kernel — shared by the Spark engine and the oracle.

k1=1.2, b=0.75 (BASELINE.json). idf is the Lucene-style non-negative
variant: idf(t) = ln(1 + (N - df + 0.5)/(df + 0.5)).

Determinism contract (SURVEY.md §7.0/§7.4, the analogue of the
reference's hash tie-break /root/reference/fornax/api.py:973-977):
  - float64 everywhere, numpy kernels on both sides;
  - per-document score = sum of per-term contributions accumulated in
    ASCENDING TERM ORDER (fixes float summation order);
  - final ranking (score DESC, doc_id ASC).
"""

from __future__ import annotations

import numpy as np

K1 = 1.2
B = 0.75


def idf(df: np.ndarray, n_docs: int) -> np.ndarray:
    """Vectorized idf over document frequencies (float64)."""
    df = np.asarray(df, dtype=np.float64)
    return np.log1p((float(n_docs) - df + 0.5) / (df + 0.5))


def tf_component(tf: np.ndarray, doc_len: np.ndarray, avgdl: float) -> np.ndarray:
    """tf*(k1+1) / (tf + k1*(1 - b + b*dl/avgdl)), float64 vectorized."""
    tf = np.asarray(tf, dtype=np.float64)
    dl = np.asarray(doc_len, dtype=np.float64)
    return tf * (K1 + 1.0) / (tf + K1 * (1.0 - B + B * dl / float(avgdl)))


def term_score(
    tf: np.ndarray, doc_len: np.ndarray, df: np.ndarray, n_docs: int, avgdl: float
) -> np.ndarray:
    """Per-(term,doc) BM25 contribution."""
    return idf(df, n_docs) * tf_component(tf, doc_len, avgdl)
