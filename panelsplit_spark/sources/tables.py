"""Parquet table sources for the engine's test/bench corpus.

Thin, declarative readers: `spark.read.parquet` so Catalyst owns pushdown,
column pruning and partition discovery. The one piece of real logic is
timestamp normalization — the driver-generated ``events`` table stores
nanosecond INT64 timestamps, which Spark's parquet reader rejects by
default; we flip the legacy nanos-as-long conf and rebuild a microsecond
timestamp column (lossless at the granularities the engine uses).
"""

from __future__ import annotations

import os
from typing import Dict

from pyspark.sql import DataFrame, SparkSession, functions as F

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

__all__ = ["TABLE_NAMES", "configure", "load_table", "load_all"]


def configure(spark: SparkSession) -> SparkSession:
    """Session conf for deterministic, scale-ready execution.

    All runtime-settable; safe to call on a driver-provided session.
    """
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    try:
        spark.conf.set("spark.sql.adaptive.enabled", "true")
    except Exception:
        pass
    return spark


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Load one corpus table; normalizes ``events.ts`` to a timestamp."""
    configure(spark)
    df = spark.read.parquet(os.path.join(sf_dir, f"{name}.parquet"))
    if name == "events" and dict(df.dtypes).get("ts") == "bigint":
        df = df.withColumn(
            "ts", F.timestamp_micros((F.col("ts") / F.lit(1000)).cast("long"))
        )
    return df


def load_all(spark: SparkSession, sf_dir: str) -> Dict[str, DataFrame]:
    return {n: load_table(spark, sf_dir, n) for n in TABLE_NAMES}
