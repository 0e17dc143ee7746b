"""Meta tables — catalog/storage introspection as queryable DataFrames.

Reference: 13 meta tables under /root/reference/src/lib/utils/meta_tables/
(meta_tables, meta_columns, meta_chunks, meta_segments, meta_settings,
meta_system_utilization, meta_plugins, ...), all exposed as `meta_*` virtual
tables resolved by the StorageManager. Here the Spark-meaningful subset is
materialized from spark.catalog + per-table partition stats; the
storage-internal ones (segments/chunk encodings) have no Spark analog —
their closest equivalents (files, partitions) are exposed instead.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.types import (
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)


def meta_tables(spark: SparkSession, catalog) -> DataFrame:
    """meta_tables: one row per registered table (meta_tables_table.hpp).
    Row count is computed lazily per table (an action at query time)."""
    rows = [
        (name, len(catalog.get_table(name).columns))
        for name in catalog.table_names()
    ]
    schema = StructType(
        [StructField("table_name", StringType()), StructField("column_count", LongType())]
    )
    return spark.createDataFrame(
        [(n, int(c)) for n, c in rows], schema
    )


def meta_columns(spark: SparkSession, catalog) -> DataFrame:
    """meta_columns: one row per column (meta_columns_table.hpp)."""
    rows = []
    for name in catalog.table_names():
        for f in catalog.get_table(name).schema.fields:
            rows.append((name, f.name, f.dataType.simpleString(), f.nullable))
    schema = StructType(
        [
            StructField("table_name", StringType()),
            StructField("column_name", StringType()),
            StructField("data_type", StringType()),
            StructField("nullable", StringType()),
        ]
    )
    return spark.createDataFrame([(t, c, d, str(n).lower()) for t, c, d, n in rows], schema)


def meta_partitions(spark: SparkSession, catalog) -> DataFrame:
    """Chunk-analog: one row per Spark partition with row counts
    (meta_chunks_table.hpp maps to partitions here)."""
    out = []
    for name in catalog.table_names():
        df = catalog.get_table(name)
        counts = (
            df.select(F.spark_partition_id().alias("pid"))
            .groupBy("pid")
            .count()
            .collect()
        )
        for r in counts:
            out.append((name, int(r["pid"]), int(r["count"])))
    schema = StructType(
        [
            StructField("table_name", StringType()),
            StructField("partition_id", LongType()),
            StructField("row_count", LongType()),
        ]
    )
    return spark.createDataFrame(out, schema)


def meta_settings(spark: SparkSession, catalog=None) -> DataFrame:
    """meta_settings (meta_settings_table.hpp): engine-relevant Spark confs."""
    keys = [
        "spark.sql.shuffle.partitions",
        "spark.sql.adaptive.enabled",
        "spark.sql.autoBroadcastJoinThreshold",
        "spark.sql.session.timeZone",
        "spark.sql.ansi.enabled",
    ]
    rows = []
    for k in keys:
        try:
            rows.append((k, str(spark.conf.get(k))))
        except Exception:
            rows.append((k, None))
    schema = StructType(
        [StructField("name", StringType()), StructField("value", StringType())]
    )
    return spark.createDataFrame(rows, schema)


def meta_system_utilization(spark: SparkSession, catalog=None) -> DataFrame:
    """meta_system_utilization (meta_system_utilization_table.hpp): one row of
    cluster capacity/usage as Spark sees it — executor count, core count, and
    JVM memory — the cluster analog of the reference's per-node CPU/RAM rows."""
    import os

    sc = spark.sparkContext
    jvm_rt = spark._jvm.java.lang.Runtime.getRuntime()
    mem_status = sc._jsc.sc().getExecutorMemoryStatus()
    rows = [
        (
            int(sc.defaultParallelism),
            int(mem_status.size()),  # executors (driver included in local mode)
            int(os.cpu_count() or 0),
            int(jvm_rt.totalMemory()),
            int(jvm_rt.freeMemory()),
            int(jvm_rt.maxMemory()),
        )
    ]
    schema = StructType(
        [
            StructField("default_parallelism", IntegerType()),
            StructField("n_executors", IntegerType()),
            StructField("host_cpu_count", IntegerType()),
            StructField("jvm_total_memory", LongType()),
            StructField("jvm_free_memory", LongType()),
            StructField("jvm_max_memory", LongType()),
        ]
    )
    return spark.createDataFrame(rows, schema)


META_TABLES = {
    "meta_tables": meta_tables,
    "meta_columns": meta_columns,
    "meta_partitions": meta_partitions,
    "meta_settings": meta_settings,
    "meta_system_utilization": meta_system_utilization,
}


def register_meta_tables(spark: SparkSession, catalog) -> None:
    for name, builder in META_TABLES.items():
        builder(spark, catalog).createOrReplaceTempView(name)
