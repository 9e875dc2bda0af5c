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
from pyspark.sql import functions as F
from pyspark.sql.types import (
    DoubleType,
    LongType,
    StringType,
    StructField,
    StructType,
)

# events.parquet carries INT64 TIMESTAMP(NANOS), which Spark 4 rejects
# under schema inference unless spark.sql.legacy.parquet.nanosAsLong is
# set.  An explicit LongType schema sidesteps inference entirely, so the
# read works under ANY SparkSession (the verification driver builds its
# own, without our session.py conf).  ts is then long epoch-nanos.
EVENTS_RAW_SCHEMA = StructType(
    [
        StructField("event_id", LongType()),
        StructField("ts", LongType()),
        StructField("user_id", LongType()),
        StructField("event_type", StringType()),
        StructField("value", DoubleType()),
        StructField("props", StringType()),
    ]
)

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


def ensure_utc(spark: SparkSession) -> None:
    """Pin the session timezone to UTC (runtime-settable).  Every
    epoch/date_trunc comparison against the DuckDB oracle (UTC-naive
    timestamps) depends on it; our session factory sets it, but the
    verification driver builds its own session — set it defensively at
    every table load."""
    spark.conf.set("spark.sql.session.timeZone", "UTC")


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    ensure_utc(spark)
    path = os.path.join(sf_dir, f"{name}.parquet")
    if name == "events":
        # Explicit schema (no inference) → readable under any session; then
        # convert long nanos → timestamp.  `ts div 1000` is exact integer
        # division — (ts/1000).cast("long") would round-trip through double,
        # whose 2^53 mantissa cannot represent ~1.7e18 nanos exactly and
        # silently shifts ~1.5% of values by 1µs.  The generator emits only
        # microsecond timestamps, so truncation to micros is lossless.
        df = spark.read.schema(EVENTS_RAW_SCHEMA).parquet(path)
        return df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
    return spark.read.parquet(path)


def load_tables(spark: SparkSession, sf_dir: str = DEFAULT_SF_DIR) -> dict[str, DataFrame]:
    return {name: load_table(spark, sf_dir, name) for name in TABLE_NAMES}


def register_temp_views(spark: SparkSession, sf_dir: str = DEFAULT_SF_DIR) -> None:
    """Expose every table as a temp view so ``spark.sql`` queries run
    against the same data the DuckDB oracle sees."""
    for name, df in load_tables(spark, sf_dir).items():
        df.createOrReplaceTempView(name)
