"""Round-12 frame-exclusion extensions: MIN/MAX segmentation and DISTINCT
composition (engine.py::_minmax_exclusion_expr / _distinct_exclusion_expr;
VERDICT r11 #2/#6) — deterministic small-fixture differentials vs DuckDB,
plus the error paths and the literal-mask regression (ADVICE r11).

The fixture is hand-built so every tricky shape exists BY CONSTRUCTION:
NULL values inside frames, peer groups partially inside ROWS frames, and a
value that occurs both inside AND outside a peer group (the case where the
set-level ARRAY_EXCEPT sketched in VERDICT r11 #6 would be wrong and only
the per-value multiset count comparison is correct).
"""

from __future__ import annotations

import duckdb
import pytest

from hyrise_spark.oracle import canon

ROWS = [
    # (id, g, x) — g partitions; within g='a', x=10 occurs at ORDER
    # positions with DIFFERENT order keys (inside and outside peer groups)
    (1, "a", 10),
    (2, "a", 10),
    (3, "a", 20),
    (4, "a", 20),
    (5, "a", 10),   # same VALUE as ids 1-2, different order position
    (6, "a", None),
    (7, "a", 5),
    (8, "b", 30),
    (9, "b", 10),
    (10, "b", 10),
    (11, "b", None),
]


@pytest.fixture(scope="module")
def fixture(spark):
    df = spark.createDataFrame(ROWS, "id INT, g STRING, x INT")
    df.createOrReplaceTempView("fx")
    con = duckdb.connect()
    con.execute("CREATE TABLE fx(id INT, g VARCHAR, x INT)")
    con.executemany("INSERT INTO fx VALUES (?, ?, ?)", ROWS)
    from hyrise_spark.engine import Engine

    return Engine(spark), con


def _both(fixture, sql: str):
    eng, con = fixture
    sdf = eng.execute(sql)
    scols = [c.lower() for c in sdf.columns]
    srows = [tuple(r) for r in sdf.collect()]
    res = con.execute(sql)
    ocols = [d[0].lower() for d in res.description]
    orows = res.fetchall()
    assert len(srows) == len(orows), f"rowcount {len(srows)} vs {len(orows)}"
    assert canon(scols, srows) == canon(ocols, orows), sql
    return srows


# -- MIN/MAX EXCLUDE ---------------------------------------------------------

@pytest.mark.parametrize("fn", ["MIN", "MAX"])
@pytest.mark.parametrize("frame,excl", [
    ("ROWS BETWEEN 2 PRECEDING AND 2 FOLLOWING", "CURRENT ROW"),
    ("ROWS BETWEEN UNBOUNDED PRECEDING AND 1 FOLLOWING", "CURRENT ROW"),
    ("ROWS BETWEEN CURRENT ROW AND 3 FOLLOWING", "CURRENT ROW"),
    ("ROWS BETWEEN CURRENT ROW AND CURRENT ROW", "CURRENT ROW"),  # empty
    ("RANGE BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW", "CURRENT ROW"),
    ("RANGE BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW", "GROUP"),
    ("RANGE BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING", "GROUP"),
    ("RANGE BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING", "TIES"),
    ("RANGE BETWEEN 10 PRECEDING AND 10 FOLLOWING", "TIES"),
])
def test_minmax_exclude_unique_order(fixture, fn, frame, excl):
    # ORDER BY the unique id: ROWS frames are tie-free, RANGE excludes are
    # value-set-deterministic anyway
    _both(fixture, f"""
        SELECT id, {fn}(x) OVER (PARTITION BY g ORDER BY id
               {frame} EXCLUDE {excl}) AS m
        FROM fx ORDER BY id""")


@pytest.mark.parametrize("fn", ["MIN", "MAX"])
@pytest.mark.parametrize("excl", ["GROUP", "TIES"])
def test_minmax_exclude_rows_group_partial_peers(fixture, fn, excl):
    """ROWS frames ordered by the NON-unique value: peer groups really do
    straddle the frame edges, exercising the position-slice path. Only the
    per-(g, x) result multiset is deterministic under tie permutation, so
    the aggregated value is the order key itself and no id is projected
    (same determinism argument as window_frame_exclude_rows_group).
    NULLS FIRST is explicit: Spark and DuckDB default NULL placement
    differently, and ROWS-frame positions depend on it."""
    _both(fixture, f"""
        SELECT g, x, {fn}(x * 7 + 1) OVER (PARTITION BY g
               ORDER BY x NULLS FIRST
               ROWS BETWEEN 2 PRECEDING AND 1 FOLLOWING
               EXCLUDE {excl}) AS m
        FROM fx ORDER BY g, x""")


def test_minmax_exclude_group_multiset_collision(fixture):
    """The VERDICT-sketch counterexample: within g='a' ordered by x, value
    x=10 occupies one peer GROUP of three rows (ids 1, 2, 5). Under
    EXCLUDE GROUP over the whole partition, 10 must vanish for its own
    peers (all occurrences are peers) yet SURVIVE for other rows — and
    with the frame UNBOUNDED..CURRENT at x=20, value 10 occurs only as
    non-peers and must remain the MIN."""
    rows = _both(fixture, """
        SELECT g, x, MIN(x) OVER (PARTITION BY g ORDER BY x NULLS FIRST
               RANGE BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
               EXCLUDE GROUP) AS m
        FROM fx WHERE g = 'a' ORDER BY x""")
    by_x = {r[1]: r[2] for r in rows}
    assert by_x[5] is None          # frame = {NULL, 5} minus own peers: empty
    assert by_x[10] == 5            # 10s excluded, 5 remains
    assert by_x[20] == 5            # MIN keeps 5; the 10s are NOT peers here


@pytest.mark.parametrize("fn", ["MIN", "MAX"])
@pytest.mark.parametrize("frame,excl", [
    ("RANGE BETWEEN 10 PRECEDING AND CURRENT ROW", "GROUP"),
    ("RANGE BETWEEN 10 PRECEDING AND 10 FOLLOWING", "GROUP"),
    ("RANGE BETWEEN CURRENT ROW AND 10 FOLLOWING", "TIES"),
    ("RANGE BETWEEN 5 PRECEDING AND 15 FOLLOWING", "TIES"),
])
def test_minmax_exclude_range_offset_peers(fixture, fn, frame, excl):
    """Value-offset RANGE frames ordered by the NON-unique value: real
    multi-row peer groups exercise the round-12 position-slice fstart
    arithmetic (fstart = last_peer + 1 - count over [lo..CURRENT ROW]).
    The aggregated value is a function of the order key, so the result
    multiset is deterministic under tie permutation."""
    _both(fixture, f"""
        SELECT g, x, {fn}(x * 3 + 1) OVER (PARTITION BY g
               ORDER BY x NULLS FIRST {frame} EXCLUDE {excl}) AS m
        FROM fx ORDER BY g, x""")


@pytest.mark.parametrize("agg,cast", [
    ("MAX(x * 2)", "INT"),
    ("SUM(x * 2)", "BIGINT"),
    ("COUNT(DISTINCT x % 3)", "BIGINT"),
])
def test_minmax_exclude_range_shorthand(fixture, agg, cast):
    """Shorthand `RANGE 10 PRECEDING` (= BETWEEN 10 PRECEDING AND CURRENT
    ROW) with EXCLUDE GROUP — safe shorthand (all peers inside the frame).
    Round-12 fix: `po` previously kept the shorthand frame clause for ALL
    exclusion rewrites (minmax, additive, DISTINCT), so every derived
    window parsed as `... RANGE 10 PRECEDING RANGE BETWEEN ...`."""
    _both(fixture, f"""
        SELECT g, x, CAST({agg} OVER (PARTITION BY g ORDER BY x NULLS FIRST
               RANGE 10 PRECEDING EXCLUDE GROUP) AS {cast}) AS m
        FROM fx ORDER BY g, x""")


def test_minmax_exclude_rows_group_unbounded_raises(fixture):
    eng, _ = fixture
    with pytest.raises(ValueError, match="FINITE integer bounds"):
        eng.execute("""
            SELECT MIN(x) OVER (PARTITION BY g ORDER BY x
                   ROWS BETWEEN UNBOUNDED PRECEDING AND 1 FOLLOWING
                   EXCLUDE GROUP) AS m FROM fx""")


# -- DISTINCT aggregates composed with EXCLUDE -------------------------------

@pytest.mark.parametrize("fn,cast", [
    ("COUNT", "BIGINT"), ("SUM", "BIGINT"), ("MIN", "INT"), ("MAX", "INT"),
])
@pytest.mark.parametrize("excl", ["CURRENT ROW", "GROUP", "TIES",
                                  "NO OTHERS"])
def test_distinct_exclude_range(fixture, fn, cast, excl):
    _both(fixture, f"""
        SELECT id, CAST({fn}(DISTINCT x % 3) OVER (PARTITION BY g
               ORDER BY id
               RANGE BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
               EXCLUDE {excl}) AS {cast}) AS v
        FROM fx ORDER BY id""")


def test_distinct_exclude_group_multiset_collision(fixture):
    """COUNT(DISTINCT x) EXCLUDE GROUP where the current row's VALUE also
    occurs outside the peer group (ids 1/2/5 share x=10 but ids 1-2 and 5
    sit at different ORDER positions id): the value must still count.
    A set-level ARRAY_EXCEPT(frame_set, peer_set) would return 0 here."""
    rows = _both(fixture, """
        SELECT id, CAST(COUNT(DISTINCT x) OVER (PARTITION BY g ORDER BY id
               RANGE BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING
               EXCLUDE GROUP) AS BIGINT) AS v
        FROM fx WHERE g = 'a' ORDER BY id""")
    by_id = {r[0]: r[1] for r in rows}
    # id=1's peer group is just itself (unique id): frame holds x values
    # {10,10,20,20,10,5}; dropping ONE 10 leaves {10,20,5} -> 3 distinct
    assert by_id[1] == 3


@pytest.mark.parametrize("fn,cast", [("COUNT", "BIGINT"), ("SUM", "BIGINT")])
@pytest.mark.parametrize("excl", ["GROUP", "TIES"])
def test_distinct_exclude_range_offset_peers(fixture, fn, cast, excl):
    """DISTINCT + GROUP/TIES under a value-offset RANGE frame with real
    multi-row peer groups (round-12 second pass: position-slice kept
    multiset; x % 3 is a function of the order key, so the result
    multiset is tie-permutation deterministic)."""
    _both(fixture, f"""
        SELECT g, x, CAST({fn}(DISTINCT x % 3) OVER (PARTITION BY g
               ORDER BY x NULLS FIRST
               RANGE BETWEEN 10 PRECEDING AND 10 FOLLOWING
               EXCLUDE {excl}) AS {cast}) AS v
        FROM fx ORDER BY g, x""")


def test_range_group_rewrites_to_position_slice(fixture):
    """Round-12 second pass pin: provably RANGE-mode excludes (GROUP/
    TIES: the peer run; CURRENT ROW: the one-element self cut) rewrite
    to position slices (O(frame) per row) — no per-value `e <=> v`
    frame rescans; those remain only for unclassifiable frame shapes
    and ROWS-mode EXCLUDE CURRENT ROW with DISTINCT."""
    eng, _ = fixture
    for agg in ("MIN(x)", "COUNT(DISTINCT x)"):
        for excl in ("GROUP", "CURRENT ROW"):
            out = eng._rewrite_window_dialect(f"""
                SELECT {agg} OVER (PARTITION BY g ORDER BY x
                       RANGE BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
                       EXCLUDE {excl}) AS m FROM fx""")
            assert "SLICE(" in out.upper(), out
            assert "e <=> v" not in out, out


def test_distinct_exclude_rows_current(fixture):
    _both(fixture, """
        SELECT id, CAST(SUM(DISTINCT x) OVER (PARTITION BY g ORDER BY id
               ROWS BETWEEN 2 PRECEDING AND 2 FOLLOWING
               EXCLUDE CURRENT ROW) AS BIGINT) AS v
        FROM fx ORDER BY id""")


@pytest.mark.parametrize("lo", [
    "2 PRECEDING", "UNBOUNDED PRECEDING", "CURRENT ROW"])
def test_distinct_exclude_rows_current_slices(fixture, lo):
    """Round 13 (VERDICT r12 #5 residual): DISTINCT + EXCLUDE CURRENT ROW
    under a ROWS frame with a constant-offset lower bound takes the
    position-slice route — no per-value `e <=> v` frame rescans — and
    still matches DuckDB. (`CURRENT ROW` lower means the frame holds only
    rows at/after the current one; the cut removes its first element.)"""
    eng, _ = fixture
    q = f"""
        SELECT id, CAST(COUNT(DISTINCT x) OVER (PARTITION BY g ORDER BY id
               ROWS BETWEEN {lo} AND 2 FOLLOWING
               EXCLUDE CURRENT ROW) AS BIGINT) AS v
        FROM fx ORDER BY id"""
    out = eng._rewrite_window_dialect(q)
    assert "SLICE(" in out.upper(), out
    assert "e <=> v" not in out, out
    _both(fixture, q)


def test_distinct_exclude_rows_current_shorthand_slices(fixture):
    """Shorthand `ROWS 2 PRECEDING` + DISTINCT + EXCLUDE CURRENT ROW also
    classifies to the slice route via the shared anchored scanner."""
    eng, _ = fixture
    q = """
        SELECT id, CAST(COUNT(DISTINCT x) OVER (PARTITION BY g ORDER BY id
               ROWS 2 PRECEDING EXCLUDE CURRENT ROW) AS BIGINT) AS v
        FROM fx ORDER BY id"""
    out = eng._rewrite_window_dialect(q)
    assert "SLICE(" in out.upper(), out
    assert "e <=> v" not in out, out
    _both(fixture, q)


@pytest.mark.parametrize("fn,cast", [("COUNT", "BIGINT"), ("SUM", "BIGINT")])
@pytest.mark.parametrize("excl", ["GROUP", "TIES"])
def test_distinct_exclude_rows_group_bounded(fixture, fn, cast, excl):
    """Round-12 second wave: DISTINCT + EXCLUDE GROUP/TIES under a
    bounded ROWS frame via the shared position-slice kept-multiset
    (ordering by the unique id keeps peer groups trivial here; the
    straddling-peer-group case is fuzz-covered with key-functional
    args)."""
    _both(fixture, f"""
        SELECT id, CAST({fn}(DISTINCT x % 3) OVER (PARTITION BY g
               ORDER BY id
               ROWS BETWEEN 2 PRECEDING AND 2 FOLLOWING
               EXCLUDE {excl}) AS {cast}) AS v
        FROM fx ORDER BY id""")


def test_distinct_exclude_rows_group_unbounded_raises(fixture):
    eng, _ = fixture
    with pytest.raises(ValueError, match="FINITE integer bounds"):
        eng.execute("""
            SELECT COUNT(DISTINCT x) OVER (PARTITION BY g ORDER BY id
                   ROWS BETWEEN UNBOUNDED PRECEDING AND 2 FOLLOWING
                   EXCLUDE GROUP) AS v FROM fx""")


# -- guard rails from ADVICE r11 ---------------------------------------------

def test_exclude_inside_string_literal_untouched(fixture):
    """The scanner searches a length-preserving literal mask: aggregate
    names / EXCLUDE keywords inside a string literal must never be
    rewritten (ADVICE r11: the old scanner restructured literal text)."""
    eng, con = fixture
    lit = "SUM(x) OVER (ORDER BY id ROWS CURRENT ROW EXCLUDE GROUP)"
    sql = (f"SELECT id, '{lit}' AS note, "
           "CAST(SUM(x) OVER (PARTITION BY g ORDER BY id "
           "RANGE BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW "
           "EXCLUDE GROUP) AS BIGINT) AS s FROM fx ORDER BY id")
    sdf = eng.execute(sql)
    notes = {r["note"] for r in sdf.collect()}
    assert notes == {lit}
    rows = con.execute(sql).fetchall()
    assert {r[1] for r in rows} == {lit}


def test_decimal_fold_rejects_over_budget_scale(spark):
    from hyrise_spark.engine import Engine

    eng = Engine(spark)
    with pytest.raises(ValueError, match="exceeds the exact fold budget"):
        eng._decimal_fold(37)
    with pytest.raises(ValueError, match="precision"):
        eng._distinct_fold_acc0("CAST(x AS DECIMAL(38, 10))")


def test_expr_fold_sniffs_decimal_arithmetic(spark):
    """ADVICE r11: SUM(DISTINCT <decimal expr>) should fold in exact
    decimal when every named column resolves unanimously decimal."""
    from hyrise_spark.engine import Engine

    eng = Engine(spark)
    spark.createDataFrame(
        [(1,)], "k INT"
    ).selectExpr("CAST(k AS DECIMAL(15,2)) AS price_r12fx").createOrReplaceTempView(
        "fold_probe_r12")
    acc0, _ = eng._distinct_fold_acc0("price_r12fx * 2")
    assert "DECIMAL(37,2)" in acc0
    acc0, _ = eng._distinct_fold_acc0("price_r12fx * price_r12fx")
    assert "DECIMAL(37,4)" in acc0  # product scale = sum of factor scales
    acc0, _ = eng._distinct_fold_acc0("price_r12fx / 2")
    assert "DOUBLE" in acc0  # division is never exact-decimal folded
    spark.catalog.dropTempView("fold_probe_r12")


def test_shadowed_name_retries_with_double_fold(fixture):
    """ADVICE r11: a statement-local derived column shadowing a registered
    integral name must not fail with DATATYPE_MISMATCH — the engine
    retries the rewrite with the DOUBLE fold."""
    eng, _ = fixture
    # `id` is INT in the registered fx view; the derived table redefines it
    # as a DOUBLE expression — the BIGINT accumulator would type-clash
    sdf = eng.execute("""
        SELECT CAST(SUM(DISTINCT id) OVER (PARTITION BY g) AS BIGINT) AS s
        FROM (SELECT g, x, id * 0.5 + 0.5 AS id FROM fx) t""")
    assert sdf.count() == len(ROWS)


@pytest.mark.parametrize("fn", ["MIN", "MAX"])
@pytest.mark.parametrize("excl", ["GROUP", "CURRENT ROW", "TIES"])
def test_minmax_exclude_composes_with_groups_frames(fixture, fn, excl):
    """GROUPS frames + MIN/MAX EXCLUDE compose through the dialect chain:
    the engine first rewrites GROUPS to dense-rank RANGE
    (_groups_frame_sql), whose output is a RANGE-mode frame the new
    MIN/MAX exclusion handles. DuckDB has no GROUPS mode at all, so the
    oracle text IS the rank rewrite (same derivation as
    test_fuzz_composed_window_specs)."""
    eng, con = fixture
    spark_q = f"""
        SELECT id, {fn}(x) OVER (PARTITION BY g ORDER BY x NULLS FIRST
               GROUPS BETWEEN 1 PRECEDING AND 1 FOLLOWING
               EXCLUDE {excl}) AS m
        FROM fx ORDER BY id"""
    duck_q = f"""
        SELECT id, {fn}(x) OVER (PARTITION BY g ORDER BY dr
               RANGE BETWEEN 1 PRECEDING AND 1 FOLLOWING
               EXCLUDE {excl}) AS m
        FROM (SELECT *, DENSE_RANK() OVER (PARTITION BY g
              ORDER BY x NULLS FIRST) AS dr FROM fx) t
        ORDER BY id"""
    got = [(r["id"], r["m"]) for r in eng.execute(spark_q).collect()]
    want = [tuple(r) for r in con.execute(duck_q).fetchall()]
    assert got == want, (got, want)


@pytest.mark.parametrize("agg", ["SUM(x)", "MIN(x)", "COUNT(DISTINCT x)"])
def test_shorthand_rows_frame_group_raises(fixture, agg):
    """Shorthand `ROWS k PRECEDING` with EXCLUDE GROUP/TIES (round-12
    review): peers can stick out above the frame's CURRENT ROW upper
    bound, which the peers-in-frame arithmetic does not model — every
    rewriter fails loud instead of over-subtracting."""
    eng, _ = fixture
    with pytest.raises(ValueError, match="shorthand ROWS"):
        eng.execute(f"""
            SELECT {agg} OVER (PARTITION BY g ORDER BY x
                   ROWS 2 PRECEDING EXCLUDE GROUP) AS v FROM fx""")


def test_shorthand_scanner_ignores_identifier_named_rows(fixture):
    """ADVICE r12 (fixed round 13): the shorthand-frame scan is anchored
    to a real frame-start token (UNBOUNDED/CURRENT/digit/INTERVAL), so an
    ORDER BY column literally named `rows` can no longer truncate the
    partition/order prefix mid-spec (which made every derived window
    malformed SQL)."""
    _both(fixture, """
        SELECT id, CAST(MIN(x) OVER (PARTITION BY g ORDER BY rows
               RANGE 1 PRECEDING EXCLUDE GROUP) AS INT) AS m
        FROM (SELECT id, g, x, id AS rows FROM fx) t ORDER BY id""")


def test_shorthand_range_bound_with_newline_classifies(fixture):
    """ADVICE r12 (fixed round 13): both helpers now share ONE re.S
    scanner, so a newline inside a shorthand RANGE bound still classifies
    to the position-slice path instead of silently dropping to the
    multiset fallback (correct either way — pin the classification)."""
    eng, _ = fixture
    q = ("SELECT id, MIN(x) OVER (PARTITION BY g ORDER BY id RANGE 1\n"
         "  PRECEDING EXCLUDE GROUP) AS m FROM fx ORDER BY id")
    out = eng._rewrite_window_dialect(q)
    assert "SLICE(" in out.upper(), out
    assert "e <=> v" not in out, out
    _both(fixture, q)


# -- named windows + exclusion (round-12 named-window normalization) ---------

@pytest.mark.parametrize("agg,cast", [
    ("SUM(x)", "BIGINT"),
    ("MIN(x)", "INT"),
    ("COUNT(DISTINCT x % 3)", "BIGINT"),
])
def test_named_window_with_exclude_inlines(fixture, agg, cast):
    """SQL:2011 lets EXCLUDE live inside `WINDOW w AS (...)`; the engine
    inlines every `OVER w` and drops the clause before the expression
    rewrites run (Spark's parser would reject the surviving clause).
    DuckDB runs the same text natively — including the WINDOW clause."""
    _both(fixture, f"""
        SELECT id, CAST({agg} OVER w AS {cast}) AS v
        FROM fx
        WINDOW w AS (PARTITION BY g ORDER BY id
                     RANGE BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
                     EXCLUDE GROUP)
        ORDER BY id""")


def test_named_window_two_specs_mixed_consumers(fixture):
    """Two named specs, one excluded and one plain, consumed by different
    aggregates in one statement — the inliner must rewrite both OVER
    references and leave no WINDOW clause behind."""
    _both(fixture, """
        SELECT id,
               CAST(SUM(x) OVER wex AS BIGINT) AS s_ex,
               CAST(COUNT(*) OVER wpl AS BIGINT) AS c_pl
        FROM fx
        WINDOW wex AS (PARTITION BY g ORDER BY id
                       ROWS BETWEEN 2 PRECEDING AND 2 FOLLOWING
                       EXCLUDE CURRENT ROW),
               wpl AS (PARTITION BY g)
        ORDER BY id""")


def test_named_window_without_markers_stays_native(fixture):
    """A marker-free WINDOW clause must NOT be inlined — Spark supports
    the clause natively and the text stays byte-identical through the
    dialect normalization."""
    eng, _ = fixture
    q = ("SELECT id, SUM(x) OVER w AS s FROM fx "
         "WINDOW w AS (PARTITION BY g ORDER BY id) ORDER BY id")
    assert eng._rewrite_window_dialect(q) == q
