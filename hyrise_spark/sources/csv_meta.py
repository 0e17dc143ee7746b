"""CSV import with JSON side-car meta file.

Reference: CSV files are described by a `<file>.json` meta file with column
names/types and parse config (/root/reference/src/lib/import_export/csv/
csv_meta.hpp — fields: chunk_size, config{delimiter, separator, quote,
escape, ...}, columns[{name, type, nullable}]). The Spark reader maps the
config onto spark.read.csv options; the explicit schema means no inference
scan (SURVEY.md §1.3: "never rely on inference for correctness").
"""

from __future__ import annotations

import json
import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.types import StructField, StructType

from hyrise_spark.sources.tbl import _REVERSE_TYPE_MAP, _TYPE_MAP

META_SUFFIX = ".json"


def read_csv_with_meta(spark: SparkSession, path: str, meta_path: str | None = None) -> DataFrame:
    meta_path = meta_path or path + META_SUFFIX
    with open(meta_path) as fh:
        meta = json.load(fh)
    fields = [
        StructField(c["name"], _TYPE_MAP[c["type"]], bool(c.get("nullable", False)))
        for c in meta["columns"]
    ]
    cfg = meta.get("config", {})
    return spark.read.csv(
        path,
        schema=StructType(fields),
        sep=cfg.get("separator", ","),
        quote=cfg.get("quote", '"'),
        escape=cfg.get("escape", '"'),
        header=False,
        nullValue=cfg.get("null_string", ""),
        mode="FAILFAST",
    )


def write_csv_with_meta(df: DataFrame, path: str) -> None:
    """Single-file CSV + side-car meta (Export operator analog)."""
    import glob
    import shutil

    tmp = path + ".spark_tmp"
    df.coalesce(1).write.mode("overwrite").csv(tmp, header=False)
    part = sorted(glob.glob(os.path.join(tmp, "part-*")))[0]
    shutil.move(part, path)
    shutil.rmtree(tmp)
    meta = {
        "chunk_size": 65535,
        "config": {"separator": ",", "quote": '"', "escape": '"'},
        "columns": [
            {
                "name": f.name,
                "type": _REVERSE_TYPE_MAP[type(f.dataType).__name__],
                "nullable": f.nullable,
            }
            for f in df.schema.fields
        ],
    }
    with open(path + META_SUFFIX, "w") as fh:
        json.dump(meta, fh, indent=2)
