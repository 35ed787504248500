"""Text analysis operators: token counting, quality scoring, language ID,
document fingerprinting.

All hot-path math is JVM-side column expressions (regexp_extract_all,
aggregate/transform lambdas -> whole-stage codegen, no Python in the
loop), so each operator is both 100TB-scalable and ANSI-SQL mirrorable
for the DuckDB oracle.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

TOKEN_PATTERN = "[a-z0-9]+"

# tiny fixed marker-word lists for the language-ID heuristic (public
# stopword knowledge; deterministic, shared with the SQL oracle)
LANG_MARKERS = {
    "en": ["the", "and", "of", "to", "a"],
    "de": ["der", "die", "das", "und", "ist"],
    "fr": ["le", "la", "les", "et", "est"],
    "es": ["el", "los", "las", "y", "es"],
}
STOPWORDS = ["the", "a", "and", "of", "to", "in", "is"]


def tokens_col(text_col: str = "text") -> Column:
    """JVM-side tokenizer equivalent to textproc.tokenize for ASCII text."""
    return F.regexp_extract_all(F.lower(F.col(text_col)), F.lit(TOKEN_PATTERN), 0)


def token_counts(df: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """(id, n_tokens) — whitespace/alnum token count, codegen only."""
    return df.select(
        F.col(id_col), F.size(tokens_col(text_col)).alias("n_tokens")
    )


def quality_scores(df: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """Deterministic quality score in [0,1]:
    0.5*min(1, n_tokens/100) + 0.3*(distinct tokens / tokens)
    + 0.2*(1 - stopword_ratio). Rounded to 6dp for oracle comparison."""
    toks = tokens_col(text_col)
    n = F.size(toks).cast("double")
    n_distinct = F.size(F.array_distinct(toks)).cast("double")
    n_stop = F.size(
        F.filter(toks, lambda t: t.isin(STOPWORDS))
    ).cast("double")
    score = (
        F.lit(0.5) * F.least(F.lit(1.0), n / F.lit(100.0))
        + F.lit(0.3) * F.when(n > 0, n_distinct / n).otherwise(F.lit(0.0))
        + F.lit(0.2) * (F.lit(1.0) - F.when(n > 0, n_stop / n).otherwise(F.lit(0.0)))
    )
    return df.select(F.col(id_col), F.round(score, 6).alias("quality"))


def lang_id(df: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """Marker-word language heuristic with deterministic tie-break
    (first language in en>de>fr>es order wins ties; 'und' if all zero)."""
    toks = tokens_col(text_col)

    def _in_list(words):
        # NB: F.filter dispatches on lambda arity — a 2-arg lambda would be
        # treated as (element, index); keep it unary via a closure factory.
        return lambda t: t.isin(words)

    counts = {
        lang: F.size(F.filter(toks, _in_list(words)))
        for lang, words in LANG_MARKERS.items()
    }
    pred = F.lit("und")
    best = F.lit(0)
    # iterate in fixed priority order; strictly-greater keeps first-wins
    for lang in ["en", "de", "fr", "es"]:
        c = counts[lang]
        pred = F.when(c > best, F.lit(lang)).otherwise(pred)
        best = F.when(c > best, c).otherwise(best)
    return df.select(F.col(id_col), pred.alias("pred_lang"))


def fingerprints(df: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """Rolling polynomial fingerprint over tokens (order-sensitive):
    h = fold(h * 1000003 + (len(tok)*131 + ascii(tok[0]))) mod 2^31.
    Pure integer column math — identical in Spark and ANSI SQL."""
    toks = tokens_col(text_col)
    fp = F.aggregate(
        toks,
        F.lit(0).cast("long"),
        lambda acc, t: (
            acc * F.lit(1000003) + F.length(t) * F.lit(131) + F.ascii(t)
        ) % F.lit(2147483647),
    )
    return df.select(F.col(id_col), fp.alias("fingerprint"))
