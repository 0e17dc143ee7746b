"""Spherical k-means (Lloyd) — the unsupervised IVF build path.

`kmeans_iterate` is validated against an independent numpy implementation
with the identical deterministic init (first K vec_ids): after the same
number of rounds, cell populations and centroids must match.
"""
from __future__ import annotations

import numpy as np
import pytest

from hyrise_spark.pipeline.similarity import _KMEANS_K, kmeans_iterate

SF_DIR = "/root/testdata/sf0.001"


def _numpy_kmeans(vecs: np.ndarray, ids: np.ndarray, k: int, iters: int):
    def norm(m):
        return m / np.linalg.norm(m, axis=1, keepdims=True)

    all_n = norm(vecs)
    cents = all_n[ids < k]
    pts = all_n[ids >= k]
    for _ in range(iters):
        sims = pts @ cents.T  # (n, k)
        # argmax with cell-id tiebreak == numpy argmax (first max wins)
        assign = sims.argmax(axis=1)
        # same empty-cell policy as kmeans_iterate: carry the previous
        # centroid forward when a cell receives no points this round
        cents = norm(
            np.stack([
                pts[assign == c].mean(axis=0) if (assign == c).any() else cents[c]
                for c in range(k)
            ])
        )
    final_assign = (pts @ cents.T).argmax(axis=1)
    counts = np.bincount(final_assign, minlength=k)
    return cents, counts


@pytest.fixture(scope="module")
def emb(spark):
    rows = (
        spark.read.parquet(f"{SF_DIR}/embeddings.parquet")
        .select("vec_id", "embedding")
        .collect()
    )
    ids = np.array([r.vec_id for r in rows])
    vecs = np.array([r.embedding for r in rows], dtype=np.float64)
    order = np.argsort(ids)
    return ids[order], vecs[order]


def test_kmeans_matches_numpy(spark, emb):
    ids, vecs = emb
    want_cents, want_counts = _numpy_kmeans(vecs, ids, _KMEANS_K, iters=3)
    got = kmeans_iterate(spark, SF_DIR, k=_KMEANS_K, iters=3).collect()
    assert len(got) == _KMEANS_K
    got_counts = {r.cell: r.n_points for r in got}
    assert got_counts == {c: int(want_counts[c]) for c in range(_KMEANS_K)}
    for r in got:
        np.testing.assert_allclose(
            np.array(r.centv), want_cents[r.cell], rtol=1e-9, atol=1e-9
        )


def test_kmeans_empty_cell_carries_centroid_forward(spark, emb, tmp_path):
    """A cell whose population empties mid-run must keep its previous
    centroid (and stay in the result) — never silently vanish. Forced by
    duplicating seed 0 into seed 1: the round-1 tie-break sends every point
    to cell 0, emptying cell 1; parity with the numpy reference (same
    carry-forward policy) then pins the recovery behavior."""
    import pandas as pd

    ids, vecs = emb
    dup = vecs.copy()
    dup[1] = dup[0]  # vec_id 1 duplicates vec_id 0 -> cell 1 loses every tie

    # scenario precondition: round 1 really does empty cell 1
    def norm(m):
        return m / np.linalg.norm(m, axis=1, keepdims=True)

    r1_assign = (norm(dup)[ids >= _KMEANS_K] @ norm(dup)[ids < _KMEANS_K].T).argmax(axis=1)
    assert not (r1_assign == 1).any()

    pdf = pd.DataFrame({"vec_id": ids, "embedding": list(dup)})
    spark.createDataFrame(pdf).write.mode("overwrite").parquet(
        f"{tmp_path}/embeddings.parquet"
    )
    want_cents, want_counts = _numpy_kmeans(dup, ids, _KMEANS_K, iters=2)
    got = kmeans_iterate(spark, str(tmp_path), k=_KMEANS_K, iters=2).collect()
    assert len(got) == _KMEANS_K  # the emptied cell did not vanish
    assert {r.cell: r.n_points for r in got} == {
        c: int(want_counts[c]) for c in range(_KMEANS_K)
    }
    for r in got:
        np.testing.assert_allclose(np.array(r.centv), want_cents[r.cell], rtol=1e-9, atol=1e-9)


def test_kmeans_assignments_stabilize(spark):
    """More rounds must not produce an invalid partition: populations always
    sum to the corpus size and every cell stays non-empty on this data."""
    out = kmeans_iterate(spark, SF_DIR, k=_KMEANS_K, iters=1).collect()
    total = sum(r.n_points for r in out)
    n_corpus = (
        spark.read.parquet(f"{SF_DIR}/embeddings.parquet")
        .filter(f"vec_id >= {_KMEANS_K}")
        .count()
    )
    assert total == n_corpus
    assert all(r.n_points > 0 for r in out)
