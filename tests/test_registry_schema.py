"""Registry-wide lint: registered query OUTPUTS must be scalar-typed.

The driver's correctness harness canonicalizes each result with pandas
(sort_values over every column, then value-hash); ArrayType / MapType /
StructType columns arrive as Python lists/dicts, which are unhashable and
break that sort (`TypeError: unhashable type: 'list'` — the one red row in
CORRECTNESS_r09). Complex types are fine INSIDE a plan (collect_set,
sort_array, UNNEST, sketch state); at the output boundary they must be
reduced to scalars (array_join / to_json / element extraction) so every
differential harness — driver, local sweep, DuckDB oracle — can sort and
hash the frame.

Schema inspection is analysis-only (no job runs for pure-DataFrame
builders); a handful of builders execute bounded driver-side work at build
time (recursive-CTE fixpoint probes, BPE merge loop) — the same cost the
oracle sweep already pays.
"""

from __future__ import annotations

import pytest

from pyspark.sql import types as T

from hyrise_spark.registry import all_queries
from tests.conftest import SF_DIR

COMPLEX = (T.ArrayType, T.MapType, T.StructType)


@pytest.mark.slow  # full-registry output sweep; full run only (HYRISE_SPARK_FULL_TESTS=1)
def test_no_complex_types_in_registered_outputs(spark):
    offenders = []
    for name, qd in sorted(all_queries().items()):
        df = qd.builder(spark, SF_DIR)
        bad = [
            f"{f.name}: {f.dataType.simpleString()}"
            for f in df.schema.fields
            if isinstance(f.dataType, COMPLEX)
        ]
        if bad:
            offenders.append(f"{name}: {', '.join(bad)}")
    assert not offenders, (
        "registered queries with complex-typed output columns "
        "(stringify with array_join/to_json at the boundary):\n"
        + "\n".join(offenders)
    )
