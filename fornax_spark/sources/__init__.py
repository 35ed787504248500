"""Table sources.

Parquet-directory layout is the hermetic test substrate; the same
loaders would point at an Iceberg catalog in production (Iceberg jars
are not in this environment — gated behind a try-import, same layout).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession

TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return spark.read.parquet(os.path.join(sf_dir, f"{name}.parquet"))


def register_views(spark: SparkSession, sf_dir: str) -> None:
    for t in TABLES:
        path = os.path.join(sf_dir, f"{t}.parquet")
        if os.path.exists(path):
            spark.read.parquet(path).createOrReplaceTempView(t)


def load_csv(
    spark: SparkSession, path: str, schema: str | None = None
) -> DataFrame:
    """CSV ingest (the reference's tutorial ingest path reads node/edge
    CSVs, /root/reference/docs/tutorial/tutorial2.py:80-95). Explicit
    schema strongly preferred — inferSchema is a full extra pass."""
    reader = spark.read.option("header", True)
    if schema:
        reader = reader.schema(schema)
    else:
        reader = reader.option("inferSchema", True)
    return reader.csv(path)


def iceberg_available(spark: SparkSession) -> bool:
    """True when an Iceberg catalog is on the classpath."""
    try:
        spark._jvm.org.apache.iceberg.Schema  # type: ignore[attr-defined]
        return True
    except Exception:
        return False
