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
    + 0.2*(1 - stopword_ratio). Rounded to 6dp for oracle comparison.

    Tokens are bound once per row (functions.bind) — ProjectCollapse
    would otherwise re-run the regexp tokenizer per reference."""
    from ..functions import bind

    def score_of(toks):
        n = F.size(toks).cast("double")
        n_distinct = F.size(F.array_distinct(toks)).cast("double")
        n_stop = F.size(F.filter(toks, lambda t: t.isin(STOPWORDS))).cast("double")
        return (
            F.lit(0.5) * F.least(F.lit(1.0), n / F.lit(100.0))
            + F.lit(0.3) * F.when(n > 0, n_distinct / n).otherwise(F.lit(0.0))
            + F.lit(0.2)
            * (F.lit(1.0) - F.when(n > 0, n_stop / n).otherwise(F.lit(0.0)))
        )

    score = bind(tokens_col(text_col), score_of)
    return df.select(F.col(id_col), F.round(score, 6).alias("quality"))


def lang_id(df: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """Marker-word language heuristic with deterministic tie-break
    (priority en>de>fr>es: a later language must be strictly greater
    than every earlier one; 'und' if all zero)."""
    from ..functions import bind

    def _in_list(words):
        # NB: F.filter dispatches on lambda arity — a 2-arg lambda would be
        # treated as (element, index); keep it unary via a closure factory.
        return lambda t: t.isin(words)

    order = ["en", "de", "fr", "es"]

    def counts_of(toks):
        return F.array(
            *[
                F.size(F.filter(toks, _in_list(LANG_MARKERS[lang])))
                for lang in order
            ]
        )

    def pred_of(cs):
        en, de, fr, es = (F.element_at(cs, i + 1) for i in range(4))
        return (
            F.when((es > fr) & (es > de) & (es > en), F.lit("es"))
            .when((fr > de) & (fr > en), F.lit("fr"))
            .when(de > en, F.lit("de"))
            .when(en > 0, F.lit("en"))
            .otherwise(F.lit("und"))
        )

    # double bind: tokens once, then the 4 counts once (the when-chain
    # references each count multiple times)
    pred = bind(tokens_col(text_col), lambda toks: bind(counts_of(toks), pred_of))
    return df.select(F.col(id_col), pred.alias("pred_lang"))


def fingerprints(df: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """Rolling polynomial fingerprint over tokens (order-sensitive):
    h = fold(h * 1000003 + (len(tok)*131 + ascii(tok[0]))) mod 2^31.
    Pure integer column math — identical in Spark and ANSI SQL."""
    fp = F.aggregate(
        tokens_col(text_col),
        F.lit(0).cast("long"),
        lambda acc, t: (
            acc * F.lit(1000003) + F.length(t) * F.lit(131) + F.ascii(t)
        ) % F.lit(2147483647),
    )
    return df.select(F.col(id_col), fp.alias("fingerprint"))
