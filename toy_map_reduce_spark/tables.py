"""Table loaders for the driver-generated parquet fixtures.

Replaces the reference's hard-coded input catalog (reference
``master/data/MapTask.scala:19-87`` — a literal ``Map[String, MapTask]`` of
13 file paths) with ``spark.read.parquet``: Catalyst gets column pruning,
predicate pushdown, and split-based parallelism for free, none of which the
reference's whole-file-per-task model had.
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

DEFAULT_SF_DIR = "/root/testdata/sf0.001"


def table_path(sf_dir: str, name: str) -> str:
    return os.path.join(sf_dir, f"{name}.parquet")


def load(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Load one fixture table.

    ``events`` needs special handling: its ``ts`` column has shipped as
    TIMESTAMP(NANOS) in some fixture generations (readable only as a raw
    nanos long via ``spark.sql.legacy.parquet.nanosAsLong``) and as
    TIMESTAMP(MICROS) in others (read natively — as ``timestamp_ntz`` on
    Spark ≥ 4.1, where the legacy conf no longer forces a long read). The
    loader normalizes every variant to a session-UTC ``TimestampType``
    column so query code never sees the difference.
    """
    if name not in TABLES:
        raise KeyError(f"unknown table {name!r}; known: {TABLES}")
    # the external driver supplies its own session; timestamps must be
    # interpreted as UTC (parquet stores naive micros, DuckDB reads naive)
    # or every timestamp-bearing query shifts by the host timezone
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    if name == "events":
        from pyspark.sql import functions as F

        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
        ev = spark.read.parquet(table_path(sf_dir, name))
        ts_type = dict(ev.dtypes)["ts"]
        if ts_type == "bigint":  # TIMESTAMP(NANOS) read as raw nanos long
            return ev.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
        # native timestamp/timestamp_ntz read (micros fixtures, Spark ≥ 4.1
        # nanos): cast to TimestampType under the UTC session tz
        return ev.withColumn("ts", F.col("ts").cast("timestamp"))
    return spark.read.parquet(table_path(sf_dir, name))
