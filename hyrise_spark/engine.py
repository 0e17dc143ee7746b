"""Engine — SQL front door + statement router.

Reference pipeline: SQLPipeline -> SQLTranslator -> Optimizer -> LQPTranslator
-> scheduler (/root/reference/src/lib/sql/sql_pipeline_statement.hpp:50-52).
On Spark the parse/optimize/execute stages ARE `spark.sql`; the engine adds
what Spark's dialect doesn't route natively for the reference surface:

- multi-statement strings (SQLPipeline splits on ';', sql_pipeline.cpp)
- IMPORT/EXPORT statements (operators/import.hpp:23, export.hpp:24) over
  csv / tbl / parquet / binary-as-parquet
- CREATE/DROP VIEW against the Catalog (maintenance/create_view.hpp)
- meta-table queries (utils/meta_tables/*): `meta_tables`, `meta_columns`, ...
- prepared statements (storage/prepared_plan.hpp) via parameterized spark.sql
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame, SparkSession

from hyrise_spark.catalog import Catalog

_IMPORT_RE = re.compile(
    r"^\s*IMPORT\s+FROM\s+'(?P<path>[^']+)'\s+INTO\s+(?P<table>\w+)\s*$", re.I
)
_EXPORT_RE = re.compile(
    r"^\s*EXPORT\s+(?P<table>\w+)\s+TO\s+'(?P<path>[^']+)'\s*$", re.I
)
_CREATE_VIEW_RE = re.compile(
    r"^\s*CREATE\s+VIEW\s+(?P<name>\w+)\s+AS\s+(?P<sql>.+)$", re.I | re.S
)
_DROP_VIEW_RE = re.compile(r"^\s*DROP\s+VIEW\s+(?P<name>\w+)\s*$", re.I)
_DROP_TABLE_RE = re.compile(r"^\s*DROP\s+TABLE\s+(?P<name>\w+)\s*$", re.I)


class Engine:
    """`execute(sql)` -> last statement's DataFrame (or None for DDL)."""

    def __init__(self, spark: SparkSession):
        self.spark = spark
        self.catalog = Catalog(spark)
        self._prepared: dict[str, str] = {}

    # -- statement routing --------------------------------------------------
    def execute(self, sql: str, args: dict | list | None = None) -> DataFrame | None:
        result: DataFrame | None = None
        for stmt in self._split(sql):
            result = self._execute_one(stmt, args)
        return result

    @staticmethod
    def _split(sql: str) -> list[str]:
        # Split on ';' outside quotes (SQLPipeline's multi-statement handling).
        parts, buf, quote = [], [], None
        for ch in sql:
            if quote:
                buf.append(ch)
                if ch == quote:
                    quote = None
            elif ch in ("'", '"'):
                quote = ch
                buf.append(ch)
            elif ch == ";":
                parts.append("".join(buf))
                buf = []
            else:
                buf.append(ch)
        parts.append("".join(buf))
        return [p.strip() for p in parts if p.strip()]

    def _execute_one(self, stmt: str, args) -> DataFrame | None:
        m = _IMPORT_RE.match(stmt)
        if m:
            return self.import_table(m["path"], m["table"])
        m = _EXPORT_RE.match(stmt)
        if m:
            self.export_table(m["table"], m["path"])
            return None
        m = _CREATE_VIEW_RE.match(stmt)
        if m:
            self.catalog.add_view(m["name"], m["sql"])
            return None
        m = _DROP_VIEW_RE.match(stmt)
        if m:
            self.catalog.drop_view(m["name"])
            return None
        m = _DROP_TABLE_RE.match(stmt)
        if m:
            self.catalog.drop_table(m["name"])
            return None
        if stmt.lower().startswith("select") and "meta_" in stmt:
            self._materialize_meta_tables(stmt)
        if args is not None:
            return self.spark.sql(stmt, args=args)
        return self.spark.sql(stmt)

    # -- prepared statements (prepared_plan.hpp) ----------------------------
    def prepare(self, name: str, sql: str) -> None:
        self._prepared[name] = sql

    def execute_prepared(self, name: str, args: dict | list) -> DataFrame:
        return self.spark.sql(self._prepared[name], args=args)

    # -- import/export (operators/import.hpp, export.hpp) -------------------
    def import_table(self, path: str, name: str) -> DataFrame:
        from hyrise_spark.sources import read_any

        df = read_any(self.spark, path)
        if self.catalog.has_table(name):
            self.catalog.replace_table(name, df)
        else:
            self.catalog.add_table(name, df)
        return df

    def export_table(self, name: str, path: str) -> None:
        from hyrise_spark.sources import write_any

        write_any(self.spark.table(name), path)

    # -- meta tables --------------------------------------------------------
    def _materialize_meta_tables(self, stmt: str) -> None:
        from hyrise_spark.meta.tables import register_meta_tables

        register_meta_tables(self.spark, self.catalog)
