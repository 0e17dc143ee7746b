"""Back-compat shim: comparison helpers live in hyrise_spark.oracle."""
from hyrise_spark.oracle import assert_matches_oracle, canon, normalize  # noqa: F401
