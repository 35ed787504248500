"""JSON metadata columns (F2): encode/decode `meta`-style JSON payloads
as native column ops.

The reference round-trips a JSON `meta` column on every node/edge
(/root/reference/fornax/api.py:410,476-483,805-867 — json.loads per
row). Spark-first, that's `to_json`/`from_json`/`get_json_object` —
whole-stage-codegen JVM expressions, no Python in the loop:

  * pack_meta    -> build the JSON column from typed columns (to_json)
  * unpack_meta  -> typed columns back out of the JSON (from_json)
  * meta_field   -> single-field extraction by JSONPath (get_json_object)

pack -> unpack is a lossless round-trip for the declared schema
(tests/test_operators.py); the driver entry `json_meta_extract` checks
the decode path against DuckDB's json_extract on an identically built
props string.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def pack_meta(df: DataFrame, cols: list[str], out: str = "meta") -> DataFrame:
    """Serialize `cols` into a JSON string column `out` (keeps the
    original columns)."""
    return df.withColumn(out, F.to_json(F.struct(*[F.col(c) for c in cols])))


def unpack_meta(
    df: DataFrame, schema: str, meta_col: str = "meta", prefix: str = ""
) -> DataFrame:
    """Parse the JSON column with an explicit DDL `schema` (e.g.
    "lang string, n_chars long") and expand each field as a column
    (optionally prefixed). Malformed JSON yields NULLs, the from_json
    contract."""
    parsed = F.from_json(F.col(meta_col), schema)
    out = df.withColumn("__m", parsed)
    for field in out.schema["__m"].dataType.fieldNames():
        out = out.withColumn(prefix + field, F.col("__m." + field))
    return out.drop("__m")


def meta_field(meta_col: str | Column, path: str) -> Column:
    """One field by JSONPath, as a string column (reference analogue:
    meta['key'] after json.loads)."""
    col = F.col(meta_col) if isinstance(meta_col, str) else meta_col
    return F.get_json_object(col, path)
