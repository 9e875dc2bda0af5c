"""Parquet table loaders for the driver's synthetic testdata
(TESTDATA.md): TPC-H-ish star schema + events/documents/embeddings.

``spark.read.parquet`` gives vectorized scans, predicate pushdown and
column pruning for free; at 100 TB these tables would be partitioned
(e.g. orders by month of o_orderdate) and the same code applies —
partition pruning kicks in on the date filters.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession

TABLE_NAMES = [
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
]

DEFAULT_SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    df = spark.read.parquet(os.path.join(sf_dir, f"{name}.parquet"))
    if name == "events":
        # events.ts is TIMESTAMP(NANOS) in parquet; the session reads it as
        # long nanos (spark.sql.legacy.parquet.nanosAsLong) — convert to a
        # proper timestamp (microsecond precision, matching DuckDB's python
        # fetch precision; the generator emits only micros so it's lossless).
        from pyspark.sql import functions as F

        df = df.withColumn(
            "ts", F.timestamp_micros((F.col("ts") / 1000).cast("long"))
        )
    return df


def load_tables(spark: SparkSession, sf_dir: str = DEFAULT_SF_DIR) -> dict[str, DataFrame]:
    return {name: load_table(spark, sf_dir, name) for name in TABLE_NAMES}


def register_temp_views(spark: SparkSession, sf_dir: str = DEFAULT_SF_DIR) -> None:
    """Expose every table as a temp view so ``spark.sql`` queries run
    against the same data the DuckDB oracle sees."""
    for name, df in load_tables(spark, sf_dir).items():
        df.createOrReplaceTempView(name)
