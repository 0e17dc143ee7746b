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
        cents = norm(
            np.stack([pts[assign == c].mean(axis=0) for c in range(k)])
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
