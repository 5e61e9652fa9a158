"""Lakehouse table-format connectors (Delta Lake / Iceberg / Hudi), gated
behind import-try: the execution image carries none of their jars, so these
surface a clear, actionable error instead of a py4j class-not-found at
execution time. The reader/writer call shapes are the real public APIs —
drop the jar on the classpath and they work unchanged.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


class ConnectorUnavailable(RuntimeError):
    def __init__(self, fmt: str, package: str):
        super().__init__(
            f"{fmt} support needs its jar on the Spark classpath "
            f"(--packages {package}); not present in this image"
        )


def _jvm_class_exists(spark: SparkSession, cls: str) -> bool:
    try:
        spark._jvm.java.lang.Class.forName(cls)  # type: ignore[union-attr]
        return True
    except Exception:
        return False


def read_delta(spark: SparkSession, path: str) -> DataFrame:
    if not _jvm_class_exists(spark, "org.apache.spark.sql.delta.DeltaLog"):
        raise ConnectorUnavailable("Delta Lake", "io.delta:delta-spark_2.13:<ver>")
    return spark.read.format("delta").load(path)


def write_delta(df: DataFrame, path: str, mode: str = "overwrite") -> None:
    if not _jvm_class_exists(df.sparkSession, "org.apache.spark.sql.delta.DeltaLog"):
        raise ConnectorUnavailable("Delta Lake", "io.delta:delta-spark_2.13:<ver>")
    df.write.format("delta").mode(mode).save(path)


def read_iceberg(spark: SparkSession, table: str) -> DataFrame:
    if not _jvm_class_exists(spark, "org.apache.iceberg.spark.source.IcebergSource"):
        raise ConnectorUnavailable(
            "Iceberg", "org.apache.iceberg:iceberg-spark-runtime-4.0_2.13:<ver>"
        )
    return spark.read.format("iceberg").load(table)


def read_jdbc(spark: SparkSession, url: str, table: str, **options: str) -> DataFrame:
    """JDBC source (built into Spark; needs only the vendor driver jar).
    Predicate pushdown and partitioned reads via the standard options
    (partitionColumn/lowerBound/upperBound/numPartitions)."""
    reader = spark.read.format("jdbc").option("url", url).option("dbtable", table)
    for k, v in options.items():
        reader = reader.option(k, v)
    return reader.load()
