"""Catalog: the driver's parquet tables (TESTDATA.md) and load helpers.

Mirrors the reference's catalog role (`files` table,
/root/reference/lib/deduplicator/files.ex:15-23) — schema/config travels
through a catalog, not the data files.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import LongType

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


def table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Load one driver table. Parquet scan → column pruning and predicate
    pushdown reach the file reader for free once filters/selects are applied."""
    if name not in TABLES:
        raise KeyError(f"unknown table {name!r}; expected one of {TABLES}")
    if name == "events":
        # events.ts is parquet TIMESTAMP(NANOS) which Spark 4 rejects outright
        # (PARQUET_TYPE_ILLEGAL). Read nanos as long, truncate to micros —
        # the same truncation DuckDB applies, so oracles agree.
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
        df = spark.read.parquet(f"{sf_dir}/{name}.parquet")
        if isinstance(df.schema["ts"].dataType, LongType):
            df = df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
        return df
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


def load_all(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    return {name: table(spark, sf_dir, name) for name in TABLES}
