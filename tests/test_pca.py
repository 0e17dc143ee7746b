"""Power-iteration PCA (pipeline/similarity.py): the matvec-formulated top
principal direction matches numpy on a planted-spike corpus (controlled
eigengap — the driver corpus's top eigenvalues are near-degenerate, where
NO power method separates in few iterations), plus Rayleigh-quotient and
norm sanity on the real corpus."""

import math

import pytest

import numpy as np

from hyrise_spark.pipeline.similarity import pca_power_iteration
from tests.conftest import SF_DIR


def _df(spark, vecs):
    return spark.createDataFrame(
        [(i, [float(x) for x in v]) for i, v in enumerate(vecs)],
        "vec_id long, embedding array<double>",
    )


@pytest.mark.slow  # heavyweight; full run only (HYRISE_SPARK_FULL_TESTS=1)
def test_power_iteration_matches_numpy_planted_spike(spark):
    rng = np.random.default_rng(7)
    dim, n = 16, 200
    u = rng.normal(size=dim)
    u /= np.linalg.norm(u)
    vecs = 3.0 * np.outer(rng.normal(size=n), u) + 0.3 * rng.normal(size=(n, dim))

    got = np.array(pca_power_iteration(_df(spark, vecs), iters=8).first().direction)

    m = vecs.T @ vecs
    w, v = np.linalg.eigh(m)
    assert w[-2] / w[-1] < 0.2  # the planted gap is real
    top = v[:, -1]
    for c in top:
        if abs(c) > 1e-12:
            if c < 0:
                top = -top
            break
    assert abs(float(got @ top)) > 0.9999
    assert abs(float(got @ got) - 1.0) < 1e-9


@pytest.mark.slow  # heavyweight; full run only (HYRISE_SPARK_FULL_TESTS=1)
def test_power_iteration_rayleigh_on_corpus(spark):
    """On the real (near-degenerate-spectrum) corpus the iterate must still
    be unit-norm and its Rayleigh quotient must land in the top of the
    spectrum — far above the average eigenvalue."""
    emb = spark.read.parquet(f"{SF_DIR}/embeddings.parquet")
    got = np.array(pca_power_iteration(emb, iters=8).first().direction)
    vecs = np.array([list(map(float, r.embedding)) for r in emb.select("embedding").collect()])
    m = vecs.T @ vecs
    w = np.linalg.eigvalsh(m)
    rayleigh = float(got @ m @ got)
    assert abs(float(got @ got) - 1.0) < 1e-9
    assert rayleigh > 0.85 * w[-1]  # inside the top eigen-cluster
    assert rayleigh > 1.5 * w.mean()
