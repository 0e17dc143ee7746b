"""Linear-probe sufficient statistics: the distributed Gram sums must equal
a numpy-built Gram EXACTLY (integer lattice), and the ridge readout solved
from them must actually predict the label better than the intercept-only
baseline — i.e. the statistics are sufficient, not just well-formed."""
from __future__ import annotations

import numpy as np
import pyarrow.parquet as pq

from hyrise_spark.pipeline.similarity import (
    _PROBE_D,
    _PROBE_Q,
    sim_linear_probe_gram,
)

SF_DIR = "/root/testdata/sf0.001"


def _numpy_extended(sf_dir: str) -> np.ndarray:
    tbl = pq.read_table(f"{sf_dir}/embeddings.parquet").to_pandas()
    x = np.stack(tbl.embedding.values)[:, :_PROBE_D].astype(np.float64)
    xq = np.floor(x * _PROBE_Q).astype(np.int64)
    ones = np.full((len(tbl), 1), _PROBE_Q, dtype=np.int64)
    yq = (tbl.label.values.astype(np.int64) * _PROBE_Q)[:, None]
    return np.hstack([xq, ones, yq])


def test_gram_matches_numpy_exactly(spark):
    z = _numpy_extended(SF_DIR)
    gram = z.T @ z  # exact: int64 sums, values far below 2^63
    got = {(r.i, r.j): r.s for r in sim_linear_probe_gram(spark, SF_DIR).collect()}
    d = _PROBE_D + 2
    assert len(got) == d * (d + 1) // 2
    for i in range(d):
        for j in range(i, d):
            assert got[(i, j)] == int(gram[i, j]), (i, j)


def test_ridge_readout_beats_intercept_baseline(spark):
    rows = sim_linear_probe_gram(spark, SF_DIR).collect()
    d = _PROBE_D + 2
    g = np.zeros((d, d))
    for r in rows:
        g[r.i, r.j] = g[r.j, r.i] = float(r.s)
    # split the extended Gram: A = [X 1]^T [X 1], b = [X 1]^T y, yty, n
    a = g[: d - 1, : d - 1]
    b = g[: d - 1, d - 1]
    yty = g[d - 1, d - 1]
    n = g[_PROBE_D, _PROBE_D] / (_PROBE_Q * _PROBE_Q)
    lam = 1e-6 * np.trace(a) / (d - 1)
    w = np.linalg.solve(a + lam * np.eye(d - 1), b)
    sse_model = yty - 2 * w @ b + w @ a @ w
    # intercept-only SSE on the quantized scale: yty - (sum y)^2 / n, via
    # the constant row's cells
    sse_base = yty - (g[_PROBE_D, d - 1] ** 2) / g[_PROBE_D, _PROBE_D]
    assert sse_model < sse_base  # the probe extracts signal from embeddings
    assert n == len(_numpy_extended(SF_DIR))
