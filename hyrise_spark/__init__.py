"""hyrise_spark — a PySpark-native OLAP engine with hyrise/hyrise's capabilities.

A re-conception of the reference single-node columnar SQL database
(/root/reference, hyrise/hyrise) on Spark SQL + Catalyst. The reference's
storage chunks / encodings / PosLists / NUMA scheduler / rule optimizer are
subsumed by Spark's Parquet reader, Tungsten codegen, AQE and Catalyst
(SURVEY.md §4.3); this package delivers the *semantics*: the full relational
surface (src/lib/operators/*), the SQL dialect quirks, `.tbl`/CSV-with-meta
import-export (src/lib/import_export/*), meta-table introspection
(src/lib/utils/meta_tables/*), the window-function surface the reference
declares but cannot execute (src/lib/logical_query_plan/lqp_translator.cpp:523),
plus large-scale data-pipeline operators (dedup / similarity / text / multimodal)
that are net-new, Spark-first features.
"""

from hyrise_spark.session import get_spark
from hyrise_spark.catalog import Catalog, load_tables
from hyrise_spark.engine import Engine

__all__ = ["get_spark", "Catalog", "load_tables", "Engine"]
__version__ = "0.1.0"
