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
    """True when the Iceberg runtime is actually on the classpath.

    Must use Class.forName: py4j's `spark._jvm.org.apache.iceberg...`
    attribute access returns a lazy JavaPackage object WITHOUT raising
    for classes that don't exist, so probing by attribute is a false
    positive on every jar-less cluster."""
    try:
        spark._jvm.java.lang.Class.forName(  # type: ignore[attr-defined]
            "org.apache.iceberg.Schema"
        )
        return True
    except Exception:
        return False


class IcebergUnavailableError(RuntimeError):
    """Raised when an Iceberg operation is requested without an Iceberg
    catalog on the classpath (this sandbox ships no Iceberg jars)."""


def _require_iceberg(spark: SparkSession) -> None:
    if not iceberg_available(spark):
        raise IcebergUnavailableError(
            "Iceberg catalog not on the classpath; configure "
            "spark.sql.catalog.<name>=org.apache.iceberg.spark.SparkCatalog "
            "and ship the iceberg-spark-runtime jar (spark-submit "
            "--packages) to enable snapshot-managed tables"
        )


def write_table_iceberg(
    df: DataFrame, table: str, mode: str = "append",
    partition_by: list[str] | None = None,
) -> None:
    """Write a DataFrame to an Iceberg table via the DataFrameWriterV2
    API — `createOrReplace` for full rewrites, `append` for incremental
    loads. Iceberg gives the production posture SURVEY §7.0 promises:
    atomic snapshot commits (a failed segment write never surfaces
    partial files) and time-travel reads for resume/audit. Gated: raises
    IcebergUnavailableError in jar-less environments (the parquet-dir
    layout in this module is the hermetic equivalent)."""
    _require_iceberg(df.sparkSession)
    writer = df.writeTo(table)
    if partition_by:
        from pyspark.sql import functions as F

        writer = writer.partitionedBy(*[F.col(c) for c in partition_by])
    if mode == "append":
        writer.append()
    elif mode in ("create", "createOrReplace"):
        writer.createOrReplace()
    else:
        raise ValueError(f"unknown mode {mode!r}: append|create|createOrReplace")


def iceberg_snapshots(spark: SparkSession, table: str) -> DataFrame:
    """The table's snapshot log (committed_at, snapshot_id, operation) —
    the lineage record an Iceberg-backed segment store exposes."""
    _require_iceberg(spark)
    return spark.sql(f"SELECT * FROM {table}.snapshots")  # metadata table


def read_snapshot(
    spark: SparkSession, table: str, snapshot_id: int | None = None
) -> DataFrame:
    """Time-travel read: the table as of `snapshot_id` (None = current).
    Resume-from-checkpoint at the storage layer: a build that died
    mid-commit reads the last complete snapshot, never partial files."""
    _require_iceberg(spark)
    reader = spark.read
    if snapshot_id is not None:
        reader = reader.option("snapshot-id", str(snapshot_id))
    return reader.table(table)
