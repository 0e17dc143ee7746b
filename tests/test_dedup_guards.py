"""Unit tests for the dedup pipeline's scale/correctness guards:

- short-document shingle guard: docs with fewer tokens than the shingle size
  yield an EMPTY shingle array (not a descending-sequence artifact);
- hot-shingle df cap: shingles shared by more than _NGRAM_MAX_DF docs are
  excluded from candidate generation (the k^2 all-pairs blowup guard).
"""

from __future__ import annotations

import pyspark.sql.functions as F

from hyrise_spark.pipeline.dedup import (
    _NGRAM_MAX_DF,
    _ngram_jaccard_pairs,
    _shingle_array,
)


def _toks(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string").select(
        "doc_id", F.split(F.trim(F.lower(F.col("text"))), r"\s+").alias("w")
    )


def test_short_docs_yield_empty_shingle_arrays(spark):
    rows = [(1, "one"), (2, "one two"), (3, "one two three"), (4, "a b c d")]
    got = {
        r["doc_id"]: r["sh"]
        for r in _toks(spark, rows).select("doc_id", _shingle_array(3).alias("sh")).collect()
    }
    assert got[1] == [] and got[2] == []
    assert got[3] == ["one two three"]
    assert got[4] == ["a b c", "b c d"]


def test_ngram_pairs_survive_short_docs(spark):
    # Without the guard this raises (slice with negative start) or emits
    # spurious shingles; with it, short docs simply contribute nothing.
    rows = [(1, "x"), (2, "a b"), (3, "p q r s t u v w"), (4, "p q r s t u v z")]
    pairs = _ngram_jaccard_pairs(_toks(spark, rows)).collect()
    assert {(r["d1"], r["d2"]) for r in pairs} == {(3, 4)}


def test_hot_shingle_dropped_from_candidates(spark):
    # 30 docs all ending in the same boilerplate: its shingles have df=30 >
    # cap and must NOT generate the ~30^2/2 candidate pairs. Docs 0/1 share
    # genuine (cold) content and must still pair.
    footer = "common footer shared by every document in this corpus"
    rows = [(0, "alpha beta gamma delta epsilon zeta " + footer),
            (1, "alpha beta gamma delta epsilon eta " + footer)] + [
        (i, f"unique{i} token{i} word{i} filler{i} " + footer) for i in range(2, 30)
    ]
    toks = _toks(spark, rows)
    pairs = _ngram_jaccard_pairs(toks).collect()
    assert {(r["d1"], r["d2"]) for r in pairs} == {(0, 1)}
    # And directly: no shingle entering the join exceeds the df cap.
    shingles = toks.select("doc_id", F.explode(_shingle_array(3)).alias("sh")).distinct()
    hot = (
        shingles.groupBy("sh").count().filter(F.col("count") > _NGRAM_MAX_DF).count()
    )
    assert hot > 0  # the fixture really does contain hot shingles


def test_cluster_canonical_transitive_chain(spark):
    """A~B, B~C, D~E: {A,B,C} collapse to A and {D,E} to D even though A~C
    was never an emitted pair — the transitive-closure contract."""
    from hyrise_spark.pipeline.dedup import cluster_canonical

    pairs = spark.createDataFrame(
        [(2, 1), (2, 3), (5, 4)], ["d1", "d2"]
    )
    got = {(r["doc_id"], r["canonical_id"]) for r in cluster_canonical(pairs).collect()}
    assert got == {(1, 1), (2, 1), (3, 1), (4, 4), (5, 4)}


def test_cluster_canonical_long_path_converges(spark):
    """A 12-node path graph needs multiple propagation rounds; the fixpoint
    loop must carry the min label end-to-end."""
    from hyrise_spark.pipeline.dedup import cluster_canonical

    pairs = spark.createDataFrame(
        [(i, i + 1) for i in range(1, 12)], ["d1", "d2"]
    )
    rows = cluster_canonical(pairs).collect()
    assert all(r["canonical_id"] == 1 for r in rows) and len(rows) == 12


def test_prefix_filter_is_lossless(spark):
    """AllPairs prefix pruning must be LOSSLESS: the registered query's
    output equals brute-force pairwise distinct-shingle overlap counting
    over the collected corpus (test-SF only; the query never collects)."""
    from tests.conftest import SF_DIR
    from hyrise_spark.pipeline.dedup import _OV_T, dedup_overlap_prefix_filter

    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet").select("doc_id", "text").collect()
    sets = {}
    for r in docs:
        ws = r.text.strip().lower().split()
        sets[r.doc_id] = {" ".join(ws[i : i + 3]) for i in range(len(ws) - 2)}
    ids = sorted(sets)
    expected = {
        (a, b, len(sets[a] & sets[b]))
        for i, a in enumerate(ids)
        for b in ids[i + 1 :]
        if len(sets[a] & sets[b]) >= _OV_T
    }
    got = {
        (r.d1, r.d2, r.overlap)
        for r in dedup_overlap_prefix_filter(spark, SF_DIR).collect()
    }
    assert got == expected
    assert got  # threshold leaves a non-trivial pair set on the test corpus
