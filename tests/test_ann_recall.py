"""ANN quality gate: recall@k against brute force on CLUSTERED data.

The driver's embeddings are near-uniform random (within-label cosine ~0.004
at sf0.001), so any bucketing scheme has data-inherently low recall there —
the oracle checks only prove the candidate-set arithmetic. This suite builds
a deterministic clustered corpus (10 sphere centers, tight noise) in the
same embeddings schema and asserts the approximate paths actually FIND the
true neighbors when structure exists — the property a user of an ANN index
is buying.
"""
from __future__ import annotations

import numpy as np
import pytest

# statistical recall gates over synthetic corpora — deselected from the driver-window default run (pytest.ini / conftest);
# runs under HYRISE_SPARK_FULL_TESTS=1.
pytestmark = pytest.mark.slow


from hyrise_spark.registry import all_queries

QUERIES = all_queries()
K = 10
DIM = 64
PER_CLUSTER = 50
SIGMA = 0.05
N_QUERIES = 10  # operator convention: vec_id < 10 are the query set


@pytest.fixture(scope="module")
def clustered_dir(spark, tmp_path_factory):
    rng = np.random.RandomState(42)
    centers = rng.randn(K, DIM)
    centers /= np.linalg.norm(centers, axis=1, keepdims=True)
    rows = []
    # queries: one noisy copy of each center, vec_id 0..9
    for i in range(N_QUERIES):
        v = centers[i] + SIGMA * rng.randn(DIM)
        rows.append((i, v.astype(np.float32).tolist(), i))
    vid = N_QUERIES
    for c in range(K):
        for _ in range(PER_CLUSTER):
            v = centers[c] + SIGMA * rng.randn(DIM)
            rows.append((vid, v.astype(np.float32).tolist(), c))
            vid += 1
    import pyarrow as pa
    import pyarrow.parquet as pq

    out = tmp_path_factory.mktemp("ann") / "clustered_sf"
    out.mkdir()
    table = pa.table(
        {
            "vec_id": pa.array([r[0] for r in rows], pa.int64()),
            "embedding": pa.array([r[1] for r in rows], pa.list_(pa.float32())),
            "label": pa.array([r[2] for r in rows], pa.int32()),
        }
    )
    # single FILE, matching the driver testdata layout load_tables expects
    pq.write_table(table, out / "embeddings.parquet")
    return str(out)


def _topk(name: str, spark, sf_dir: str) -> dict[int, set[int]]:
    out: dict[int, set[int]] = {}
    for r in QUERIES[name].builder(spark, sf_dir).collect():
        out.setdefault(r.qid, set()).add(r.cid)
    return out


def _recall(truth: dict, got: dict) -> float:
    per_q = [len(truth[q] & got.get(q, set())) / len(truth[q]) for q in truth]
    return sum(per_q) / len(per_q)


@pytest.fixture(scope="module")
def truth(spark, clustered_dir):
    t = _topk("sim_bruteforce_topk", spark, clustered_dir)
    assert len(t) == N_QUERIES
    return t


def test_ivf_recall_on_clustered_data(spark, clustered_dir, truth):
    """IVF probes the query's nearest cells; with real cluster structure the
    true neighbors live in the probed cell -> near-perfect recall@5."""
    got = _topk("sim_ivf_topk", spark, clustered_dir)
    assert _recall(truth, got) >= 0.95, got


def test_lsh_recall_single_vs_multitable(spark, clustered_dir, truth):
    """Single-table 8-bit LSH requires ALL planes to agree, so even a tight
    cluster split by one plane loses the neighbor — measured recall ~0.18
    here (well above the ~1/256 uniform-bucket baseline, but modest). The
    production lever is OR-amplification: sim_lsh_multitable's 4 independent
    tables lift recall to ~0.64 (1-(1-p)^L). Pin both levels and the
    ordering."""
    single = _recall(truth, _topk("sim_lsh_bucket_join", spark, clustered_dir))
    multi = _recall(truth, _topk("sim_lsh_multitable", spark, clustered_dir))
    assert single >= 0.1, single
    assert multi >= 0.5, multi
    assert multi > single


def test_kmeans_cells_recover_clusters(spark, clustered_dir):
    """Unsupervised k-means with k=10 on 10 true clusters: the final cells
    must reproduce the balanced 50-per-cluster populations (up to the seed
    vectors' own membership)."""
    from hyrise_spark.pipeline.similarity import kmeans_iterate

    out = kmeans_iterate(spark, clustered_dir, k=10, iters=3).collect()
    sizes = sorted(r.n_points for r in out)
    assert sum(sizes) == K * PER_CLUSTER
    # every recovered cell is one true cluster: all populations equal 50
    assert sizes == [PER_CLUSTER] * K, sizes


def test_pq_recall_on_clustered_data(spark, clustered_dir, truth):
    """PQ with sample-initialized codebooks + ADC shortlist + exact rerank:
    the 16 anchors land across the 10 clusters, so same-cluster vectors
    quantize to the same codewords and the true neighbors survive the
    shortlist. The exact rerank means every returned pair's cos_sim is
    EXACT — PQ error only affects which candidates reach the rerank."""
    got = _topk("sim_pq_topk", spark, clustered_dir)
    assert _recall(truth, got) >= 0.8, got
    # exactness of reranked scores: the (qid, cid) pairs PQ returns must
    # carry the same cos_sim brute force assigns them
    bf = {
        (r.qid, r.cid): r.cos_sim
        for r in QUERIES["sim_bruteforce_topk"].builder(spark, clustered_dir).collect()
    }
    for r in QUERIES["sim_pq_topk"].builder(spark, clustered_dir).collect():
        if (r.qid, r.cid) in bf:
            assert abs(r.cos_sim - bf[(r.qid, r.cid)]) < 1e-9


def test_bq_banded_recall_vs_lsh_baseline(spark, clustered_dir, truth):
    """sim_bq_banded (VERDICT r9 #7: the hamming-LSH banded shortlist that
    replaces the full-corpus BQ scan at 100 TB) must not pay for its
    bucket-join with recall: on clustered data it stays at-or-above the
    single-probe LSH baseline, and close to the full-scan BQ variant it
    approximates (8x8-bit bands keep near neighbors with prob
    1-(1-(1-h/64)^8)^8 — ~1 for the tight-cluster distances here)."""
    banded = _recall(truth, _topk("sim_bq_banded", spark, clustered_dir))
    fullscan = _recall(truth, _topk("sim_binary_quantization", spark, clustered_dir))
    single_lsh = _recall(truth, _topk("sim_lsh_bucket_join", spark, clustered_dir))
    assert banded >= single_lsh, (banded, single_lsh)
    # banding only ever DROPS candidates vs the full scan; on clustered
    # data it must drop (almost) none of the true neighbors
    assert banded >= fullscan - 0.1, (banded, fullscan)


def test_bq_banded_candidate_reduction(spark):
    """The banding's 100 TB claim, measured: on the driver's near-uniform
    embeddings (worst case for banding — random sign bits), the candidate
    set is a small fraction of the full query x corpus cross product
    (expected ~8/256 ~ 3% per band-OR; gate at 30% for slack), while every
    candidate pair shares at least one 8-bit band by construction."""
    from hyrise_spark.pipeline.similarity import _bq_banded_frames

    sf = "/root/testdata/sf0.01"
    q, c, cand = _bq_banded_frames(spark, sf)
    nq, nc, ncand = q.count(), c.count(), cand.count()
    assert ncand > 0
    assert ncand <= 0.3 * nq * nc, (ncand, nq * nc)
