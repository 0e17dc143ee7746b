"""`.tbl` reader/writer — the reference's native test/data format.

Format (/root/reference/src/lib/utils/load_table.hpp; FIXTURES.md): pipe-
separated text, row 1 = column names, row 2 = column types from the 5-type
system (`int long float double string`, `_null` suffix = nullable), literal
token `null` = NULL cell. TPC-H dbgen `.tbl` files (trailing `|`, no header)
are handled by passing an explicit schema.

Scale notes: the two header lines are read driver-side (open the file once,
2 lines); the data scan is a standard distributed spark.read.csv with an
explicit schema — no inference pass over the data.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.types import (
    DataType,
    DoubleType,
    FloatType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

# The reference's 5-type system (all_type_variant.hpp:34-40) -> Spark types.
_TYPE_MAP: dict[str, DataType] = {
    "int": IntegerType(),
    "long": LongType(),
    "float": FloatType(),
    "double": DoubleType(),
    "string": StringType(),
}
_REVERSE_TYPE_MAP = {
    "IntegerType": "int",
    "LongType": "long",
    "FloatType": "float",
    "DoubleType": "double",
    "StringType": "string",
}


def parse_tbl_header(name_line: str, type_line: str) -> StructType:
    names = name_line.rstrip("\n").split("|")
    types = type_line.rstrip("\n").split("|")
    if len(names) != len(types):
        raise ValueError(f".tbl header mismatch: {len(names)} names vs {len(types)} types")
    fields = []
    for name, t in zip(names, types):
        t = t.strip()
        nullable = t.endswith("_null")
        base = t[:-5] if nullable else t
        if base not in _TYPE_MAP:
            raise ValueError(f"unknown .tbl type {t!r} for column {name!r}")
        fields.append(StructField(name.strip(), _TYPE_MAP[base], nullable))
    return StructType(fields)


def read_tbl(spark: SparkSession, path: str, schema: StructType | None = None) -> DataFrame:
    """Load a `.tbl` file. Without an explicit schema, the embedded
    name/type header rows are parsed (reference load_table semantics)."""
    if schema is not None:
        return spark.read.csv(
            path, sep="|", schema=schema, nullValue="null", header=False, mode="FAILFAST"
        )
    with open(path) as fh:
        name_line = fh.readline().rstrip("\n")
        type_line = fh.readline().rstrip("\n")
    schema = parse_tbl_header(name_line, type_line)
    # Filter the two header lines BEFORE parsing. (DROPMALFORMED can't be
    # trusted here: CSV column pruning skips parsing unprojected columns, so
    # a count()-style query would never detect the malformed header rows.)
    import pyspark.sql.functions as F

    text = spark.read.text(path).filter(
        ~F.col("value").isin(name_line, type_line)
    )
    parsed = text.select(
        F.from_csv(
            "value",
            schema.simpleString(),
            {"sep": "|", "nullValue": "null", "mode": "FAILFAST"},
        ).alias("r")
    ).select("r.*")
    return parsed


def write_tbl(df: DataFrame, path: str) -> None:
    """Export with the reference's header convention (Export operator,
    /root/reference/src/lib/operators/export.hpp:24). Collect-free: each
    partition writes pipe-separated text; headers prepended driver-side."""
    import glob
    import os
    import shutil

    names = df.columns
    types = []
    for f in df.schema.fields:
        t = _REVERSE_TYPE_MAP.get(type(f.dataType).__name__)
        if t is None:
            raise ValueError(f"type {f.dataType} not representable in .tbl")
        types.append(t + ("_null" if f.nullable else ""))

    tmp = path + ".spark_tmp"
    import pyspark.sql.functions as F

    cols = [
        F.when(F.col(c).isNull(), "null").otherwise(F.col(c).cast("string"))
        for c in names
    ]
    df.select(F.concat_ws("|", *cols).alias("line")).write.mode("overwrite").text(tmp)
    with open(path, "w") as out:
        out.write("|".join(names) + "\n")
        out.write("|".join(types) + "\n")
        for part in sorted(glob.glob(os.path.join(tmp, "part-*"))):
            with open(part) as fh:
                shutil.copyfileobj(fh, out)
    shutil.rmtree(tmp)
