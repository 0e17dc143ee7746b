"""Catalog — named-table registry over Spark's catalog.

Reference: StorageManager (/root/reference/src/lib/storage/storage_manager.hpp)
keeps named tables, LQP views (lqp_view.hpp) and prepared plans
(prepared_plan.hpp). Here the same roles map onto `spark.catalog` temp views;
tables are parquet-backed DataFrames so Catalyst gets column pruning,
predicate pushdown and partition pruning for free (the reference's GetTable
chunk/column pruning, get_table.hpp:23).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession

# The driver's synthetic star schema (TESTDATA.md).
TESTDATA_TABLES = (
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


# Opt-in exact-decimal session mode (SCALE.md §9 honest-limits follow-up).
# The driver's parquet carries monetary columns as DOUBLE; the default
# engine mode keeps them double with cents-lattice rounding. Flipping this
# flag (or exporting HYRISE_SPARK_DECIMAL=1) loads the TPC-H monetary
# columns as DECIMAL(15,2) — the spec's type — so every price aggregate is
# EXACT rather than correctly-rounded. Beyond-reference robustness: hyrise
# itself has no decimal type at all (all_type_variant.hpp:34-40). Kept
# opt-in because the driver's oracle gate runs the double path.
DECIMAL_MODE: bool = os.environ.get("HYRISE_SPARK_DECIMAL", "") == "1"

# TPC-H spec: every monetary/rate column is DECIMAL(15,2)
MONEY_COLS: dict[str, tuple[str, ...]] = {
    "lineitem": ("l_extendedprice", "l_discount", "l_tax"),
    "orders": ("o_totalprice",),
    "part": ("p_retailprice",),
    "customer": ("c_acctbal",),
    "supplier": ("s_acctbal",),
}


def load_tables(
    spark: SparkSession,
    sf_dir: str,
    names: tuple[str, ...] = TESTDATA_TABLES,
    decimal: bool | None = None,
) -> dict[str, DataFrame]:
    """Load parquet tables from a scale-factor directory and register temp views.

    Lazy: nothing is scanned until an action; filters/projections written
    against these DataFrames push down into the parquet scan. With
    `decimal=True` (default: the session-wide DECIMAL_MODE flag), monetary
    columns are cast to DECIMAL(15,2) right above the scan — the cast is a
    projection, so pushdown/pruning on the other columns is unaffected.
    """
    use_dec = DECIMAL_MODE if decimal is None else decimal
    out: dict[str, DataFrame] = {}
    for name in names:
        path = os.path.join(sf_dir, f"{name}.parquet")
        if os.path.exists(path):
            df = _cached_read(spark, path)
            if use_dec and name in MONEY_COLS:
                from pyspark.sql import functions as F

                for c in MONEY_COLS[name]:
                    if c in df.columns:
                        df = df.withColumn(c, F.col(c).cast("decimal(15,2)"))
            df.createOrReplaceTempView(name)
            out[name] = df
    return out


# Plan-level cache: repeated loads of the same path reuse the analyzed
# DataFrame (skips parquet footer/schema resolution per query — measurable
# when a bench run builds hundreds of plans). Nothing is materialized; keyed
# per SparkSession so a restarted session re-resolves.
_READ_CACHE: dict[tuple[int, str], DataFrame] = {}


def _cached_read(spark: SparkSession, path: str) -> DataFrame:
    key = (id(spark), path)
    df = _READ_CACHE.get(key)
    if df is None:
        df = _read_parquet(spark, path)
        _READ_CACHE[key] = df
    return df


def _read_parquet(spark: SparkSession, path: str) -> DataFrame:
    """Parquet read that tolerates TIMESTAMP(NANOS) columns.

    Spark rejects nanosecond parquet timestamps outright; the fallback reads
    them as raw nanos (legacy conf) and rebuilds a proper timestamp with
    integer division (double division would lose ~2^10 ns of precision at
    2024-era epochs).

    NOTE: `spark.sql.legacy.parquet.nanosAsLong` is a SESSION-WIDE mutation
    and stays set once a nanos file has been read (it must still be true when
    the lazy plan executes, so a save/restore around construction would be
    unsound). Consequence: a later direct `spark.read.parquet` of a nanos
    file that bypasses this function silently yields LONG columns instead of
    failing loudly — always read through the catalog (load_tables/_read_parquet).
    """
    import glob

    import pyarrow.parquet as pq
    import pyspark.sql.functions as F

    # Spark-written tables are DIRECTORIES of part files (the normal layout
    # at scale); pyarrow's read_schema wants a single file — any part file's
    # footer carries the table schema.
    schema_path = path
    if os.path.isdir(path):
        # recursive: partitioned layouts nest part files under key=val dirs —
        # a top-level-only glob would silently skip the nanos guard below
        parts = sorted(glob.glob(os.path.join(path, "**", "*.parquet"), recursive=True))
        if not parts:
            return spark.read.parquet(path)
        schema_path = parts[0]
    nano_cols = [
        f.name for f in pq.read_schema(schema_path) if str(f.type).startswith("timestamp[ns")
    ]
    if not nano_cols:
        return spark.read.parquet(path)
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    df = spark.read.parquet(path)
    for c in nano_cols:
        df = df.withColumn(c, F.timestamp_micros(F.expr(f"`{c}` div 1000")))
    return df


# MvccDeletePlugin analog (mvcc_delete_plugin.hpp:21-32, thresholds at
# :53-54): the reference's insert-only storage accumulates INVALIDATED ROWS
# that every transaction must filter past, so a plugin physically rewrites
# chunks once 60% of a chunk is invalidated. In this engine's snapshot-DML
# model the same pathology is accumulated PLAN LINEAGE — each
# INSERT/UPDATE/DELETE/MERGE wraps the table in another CASE-projection /
# filter / union layer, so analysis and execution cost grow per statement
# exactly as the reference's scan cost grows per invalidated row. The
# compaction analog rewrites the LIVE rows to parquet and re-registers a
# clean scan, cutting the lineage. Trigger: DML-chain depth (the snapshot
# equivalent of the invalidation ratio) — inline on the commit path rather
# than a background thread (no threads in this engine by design).
COMPACT_THRESHOLD_DML_DEPTH = 16
# compaction output bin-packing target (the ~128 MB file every production
# table-format compaction job aims for); module-level so tests can shrink it
COMPACT_TARGET_FILE_BYTES = 128 * 1024 * 1024


class Catalog:
    """Named tables + views, mirroring StorageManager's add/drop/has surface
    (storage_manager.hpp: add_table/drop_table/get_table/has_table and the
    *_view equivalents)."""

    def __init__(self, spark: SparkSession):
        self.spark = spark
        self._tables: dict[str, DataFrame] = {}
        self._views: dict[str, str] = {}  # name -> SQL text (LQP view analog)
        # driver-side statement ring buffer surfaced as meta_log
        self.statement_log: list[dict] = []
        # validated unique column combinations {(table, column), ...} — the
        # ucc_discovery_plugin state (hyrise_spark/ucc.py); any write to a
        # table drops its entries (uniqueness is a snapshot property)
        self.validated_uccs: set[tuple[str, str]] = set()
        # per-table DML-chain depth since the last compaction / (re)create
        self.dml_depth: dict[str, int] = {}
        self._compact_dir: str | None = None
        self._compact_version = 0
        # MVCC-visibility analog: bounded ring of past snapshots per table
        # (mvcc_data.hpp keeps begin/end commit-ids so old transactions see
        # old row versions; here each committed write appends the PREVIOUS
        # DataFrame — a lazy plan, no materialization — queryable via
        # `<table> VERSION AS OF <n>`). Version 0 = state at (re)creation.
        self.history: dict[str, list[DataFrame]] = {}
        self.history_base: dict[str, int] = {}  # version number of history[0]
        # per-table compacted-file dirs, oldest first; bounded (see
        # compact_table). Evicted/dropped paths are NOT deleted eagerly —
        # another table's lazy plan may still read them (CREATE TABLE b AS
        # SELECT FROM a captures a's compact file) — they queue in
        # `_compact_trash` for the explicit purge_compaction_trail admin
        # function: the MvccDeletePlugin's physical delete fires only when
        # no transaction references a chunk (mvcc_delete_plugin.hpp:30-32),
        # and with lazy cross-plan references the "no references" assertion
        # here must come from the operator, not the engine.
        self.compact_paths: dict[str, list[str]] = {}
        self._compact_trash: list[str] = []
        # bumped on EVERY catalog mutation; the engine's statement cache
        # keys entry validity on it (plan_cache.py — an entry stored under
        # an older epoch can never be served)
        self.mutation_counter: int = 0

    # -- tables ------------------------------------------------------------
    _HISTORY_CAP = 8  # snapshots kept per table (lazy plans, not data)

    def add_table(self, name: str, df: DataFrame) -> None:
        if name in self._tables:
            raise ValueError(f"table {name!r} already exists")
        self.mutation_counter += 1
        self._tables[name] = df
        self.history[name] = [df]
        self.history_base[name] = 0
        df.createOrReplaceTempView(name)

    def replace_table(self, name: str, df: DataFrame) -> None:
        self.mutation_counter += 1
        self._tables[name] = df
        hist = self.history.setdefault(name, [])
        if name not in self.history_base:
            self.history_base[name] = 0
        hist.append(df)
        overflow = len(hist) - self._HISTORY_CAP
        if overflow > 0:
            del hist[:overflow]
            self.history_base[name] += overflow
        df.createOrReplaceTempView(name)
        self.validated_uccs = {
            (t, c) for (t, c) in self.validated_uccs if t != name.lower()
        }
        # SQL views re-resolve against CURRENT table state (lqp_view analog:
        # the reference stores the view's LQP and re-instantiates per query).
        # Temp views captured the old plan eagerly — re-register the views
        # that (transitively) reference the replaced table, in creation order
        # so views-over-views resolve. Name-mention is the dependency test:
        # cheap, and a false positive only costs one extra re-plan. A dangling
        # view (its base table was dropped) must not fail UNRELATED DML: it
        # keeps its stale registration and errors only when actually queried.
        import re

        dirty = {name}
        for vname, vsql in self._views.items():
            if not any(re.search(rf"\b{re.escape(d)}\b", vsql, re.I) for d in dirty):
                continue
            dirty.add(vname)
            try:
                self.spark.sql(vsql).createOrReplaceTempView(vname)
            except Exception:  # noqa: BLE001 — dangling view, surfaced on use
                pass

    def current_version(self, name: str) -> int:
        return self.history_base.get(name, 0) + len(self.history.get(name, [1])) - 1

    def get_version(self, name: str, version: int) -> DataFrame:
        """Snapshot of `name` as of write-version `version` (0 = creation).
        Raises if the version is newer than the table or already evicted
        from the bounded history ring."""
        if name not in self._tables:
            raise KeyError(f"table {name!r} does not exist")
        base = self.history_base.get(name, 0)
        hist = self.history.get(name, [])
        if version > base + len(hist) - 1:
            raise ValueError(
                f"table {name!r} has no version {version} yet "
                f"(current is {base + len(hist) - 1})"
            )
        if version < base:
            raise ValueError(
                f"version {version} of {name!r} was evicted from the "
                f"history ring (oldest kept: {base})"
            )
        return hist[version - base]

    def rename_table(self, name: str, new: str) -> None:
        """ALTER TABLE ... RENAME TO: re-key ALL per-table state (history,
        depth, compaction trail). A drop+add would physically delete the
        compaction files the renamed table's plan still reads."""
        if name not in self._tables:
            raise KeyError(f"table {name!r} does not exist")
        self.mutation_counter += 1
        self._tables[new] = self._tables.pop(name)
        for d in (self.history, self.history_base, self.dml_depth, self.compact_paths):
            if name in d:
                d[new] = d.pop(name)
        self.validated_uccs = {
            (new.lower() if t == name.lower() else t, c)
            for (t, c) in self.validated_uccs
        }
        self.spark.catalog.dropTempView(name)
        self._tables[new].createOrReplaceTempView(new)

    def purge_compaction_trail(self) -> int:
        """Physically delete every evicted/dropped compaction file. The
        caller asserts no live plan still reads them (the reference's
        no-active-transaction precondition, operator-asserted here).
        Returns the number of directories removed."""
        import shutil

        self.mutation_counter += 1

        n = len(self._compact_trash)
        for old in self._compact_trash:
            shutil.rmtree(old, ignore_errors=True)
        self._compact_trash.clear()
        return n

    def drop_table(self, name: str) -> None:
        if name not in self._tables:
            raise KeyError(f"table {name!r} does not exist")
        self.mutation_counter += 1
        del self._tables[name]
        self.dml_depth.pop(name, None)
        self.history.pop(name, None)
        self.history_base.pop(name, None)
        # the dropped table's compaction trail queues for the explicit
        # purge — another plan may still read those files
        self._compact_trash.extend(self.compact_paths.pop(name, []))
        self.validated_uccs = {
            (t, c) for (t, c) in self.validated_uccs if t != name.lower()
        }
        self.spark.catalog.dropTempView(name)

    # -- MVCC-GC analog (mvcc_delete_plugin.hpp, see module note above) ------
    def note_dml(self, name: str) -> int:
        """Record one DML statement against `name`; returns the new depth."""
        self.dml_depth[name] = self.dml_depth.get(name, 0) + 1
        return self.dml_depth[name]

    def compact_table(self, name: str) -> None:
        """Physically rewrite `name`'s LIVE rows to parquet and re-register a
        clean scan (the plugin's physical-delete step: invalidated rows no
        longer exist anywhere, and every later query plans against a flat
        FileScan instead of the accumulated DML lineage). Distributed write —
        no driver-side collect; at warehouse scale this is the same rewrite
        a table format's compaction job performs."""
        self.mutation_counter += 1
        df = self._tables[name]
        if self._compact_dir is None:
            # rewrite under the session's warehouse dir (repo-local) — the
            # place a real deployment's compaction job writes, too
            wh = self.spark.conf.get(
                "spark.sql.warehouse.dir", "spark-warehouse"
            ).removeprefix("file:")
            self._compact_dir = os.path.join(wh, "__compact")
        self._compact_version += 1
        path = os.path.join(self._compact_dir, f"{name}_v{self._compact_version}")
        # Output sizing — the bin-packing every real table-format compaction
        # job does (target file size, ~128 MB): a DML chain accumulates one
        # single-row partition PER INSERT (union of LocalRelations), so an
        # OLTP-shaped table would otherwise write one task + one file-commit
        # per historical statement (measured: ~90-task writes of a 200-row
        # table dominated TPC-C wall time at 0.8 s per compaction). The last
        # Size signals, both driver-side with no job: the previous trail
        # entry's on-disk bytes AND Catalyst's logical-stats estimate of the
        # CURRENT plan (which sees data added since — a bulk INSERT..SELECT
        # between compactions must not funnel a grown table through one
        # task because the last file was small). Take the max; with neither
        # signal, fall back to the session's parallelism. coalesce never
        # INCREASES partition count, so no partition probe is needed (and
        # none is affordable: df.rdd forces eager physical planning).
        prev = self.compact_paths.get(name) or None
        sz = 0
        if prev:
            sz = sum(
                os.path.getsize(os.path.join(r, f))
                for r, _, fs in os.walk(prev[-1]) for f in fs
            )
        try:
            est = int(df._jdf.queryExecution().optimizedPlan()
                      .stats().sizeInBytes())
            # logical estimates are uncompressed-row-width based; parquet on
            # disk is typically several x smaller — scale so the two
            # signals are comparable before taking the max. Estimates above
            # ~16 TB are Catalyst's unknown/blow-up sentinels (deep DML
            # CASE chains can compound width guesses multiplicatively),
            # not size signals — using one overflowed coalesce(want) past
            # Integer.MAX and killed the calling thread MID-TRANSACTION
            # (observed under the TPC-C mix), so they are ignored.
            if est < (1 << 44):
                sz = max(sz, est // 4)
        except Exception:  # noqa: BLE001 — stats unavailable: trail only
            pass
        if sz > 0:
            # cap: coalesce takes a JVM int, and >64k output files means
            # the size signal is garbage anyway
            want = max(1, min(int(sz) // COMPACT_TARGET_FILE_BYTES + 1,
                              1 << 16))
        else:
            want = self.spark.sparkContext.defaultParallelism
        df = df.coalesce(want)
        df.write.mode("overwrite").parquet(path)
        # schema is already known — pinning it skips the read-back
        # footer-inference job
        self._tables[name] = self.spark.read.schema(df.schema).parquet(path)
        self._tables[name].createOrReplaceTempView(name)
        self.dml_depth[name] = 0
        # same logical state, flat plan: current version now reads the
        # compacted file (older versions keep their lazy pre-compaction plans)
        hist = self.history.get(name)
        if hist:
            hist[-1] = self._tables[name]
        # bound the ACTIVE trail at _HISTORY_CAP files per table; evicted
        # paths queue for the explicit purge (see _compact_trash note)
        trail = self.compact_paths.setdefault(name, [])
        trail.append(path)
        while len(trail) > self._HISTORY_CAP:
            self._compact_trash.append(trail.pop(0))

    def get_table(self, name: str) -> DataFrame:
        return self._tables[name]

    def has_table(self, name: str) -> bool:
        return name in self._tables

    def table_names(self) -> list[str]:
        return sorted(self._tables)

    # -- views (stored logical plans) --------------------------------------
    def add_view(self, name: str, sql: str) -> None:
        if name in self._views or name in self._tables:
            raise ValueError(f"view/table {name!r} already exists")
        self.mutation_counter += 1
        self._views[name] = sql
        self.spark.sql(sql).createOrReplaceTempView(name)

    def drop_view(self, name: str) -> None:
        if name not in self._views:
            raise KeyError(f"view {name!r} does not exist")
        self.mutation_counter += 1
        del self._views[name]
        self.spark.catalog.dropTempView(name)

    def has_view(self, name: str) -> bool:
        return name in self._views

    def view_names(self) -> list[str]:
        return sorted(self._views)
