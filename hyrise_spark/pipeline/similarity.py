"""Similarity search over the `embeddings` table (array<float> column).

Two paths, as a real ANN stack would ship them:
- brute-force cosine top-k: the exactness baseline; cross join bounded by the
  query-set size, JVM-side dot products (F.zip_with/F.aggregate — no Python).
- random-hyperplane LSH buckets: the scale path; each vector gets a compact
  bit signature, candidates come from an equi-join on the bucket key, exact
  cosine re-ranks within buckets. At 100 TB the bucket join replaces the
  all-pairs cross join: cost goes from O(N*Q) to O(sum of bucket sizes).

Hyperplane weights are md5-parity derived (deterministic ±1 per (plane,dim))
so the DuckDB oracle builds the identical planes.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql.window import Window

from hyrise_spark.catalog import load_tables
from hyrise_spark.registry import register

_DIM = 64
_N_PLANES = 8
_TOP_K = 5
_N_QUERIES = 10


def _emb(spark: SparkSession, sf_dir: str) -> DataFrame:
    return load_tables(spark, sf_dir, ("embeddings",))["embeddings"]


def _dot(x: Column, y: Column) -> Column:
    return F.aggregate(F.zip_with(x, y, lambda a, b: a * b), F.lit(0.0), lambda acc, z: acc + z)


def _cos(v1: Column, v2: Column) -> Column:
    return _dot(v1, v2) / (F.sqrt(_dot(v1, v1)) * F.sqrt(_dot(v2, v2)))


def _normalize(v: Column) -> Column:
    """v / |v| — pre-normalizing each side ONCE per row makes every pairwise
    cosine a single dot product (cos(a, b) == dot(a/|a|, b/|b|)); at N x Q
    pair counts that is a 3x cut in the inner-loop arithmetic."""
    n = F.sqrt(_dot(v, v))
    return F.transform(v, lambda x: x / n)


# ---------------------------------------------------------------------------
# Brute-force cosine top-k: queries = vec_id < N_QUERIES, corpus = the rest.
@register(
    "sim_bruteforce_topk",
    oracle=f"""
    WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
    q AS (SELECT vec_id AS qid, v AS qv FROM e WHERE vec_id < {_N_QUERIES}),
    c AS (SELECT vec_id AS cid, v AS cv FROM e WHERE vec_id >= {_N_QUERIES}),
    scored AS (
      SELECT qid, cid,
             list_inner_product(qv, cv) /
               (sqrt(list_inner_product(qv, qv)) * sqrt(list_inner_product(cv, cv))) AS cs
      FROM q CROSS JOIN c
    ), ranked AS (
      SELECT qid, cid, cs,
             ROW_NUMBER() OVER (PARTITION BY qid ORDER BY ROUND(cs, 6) DESC, cid) AS rn
      FROM scored
    )
    SELECT qid, cid, ROUND(cs, 4) AS cos_sim, CAST(rn AS INT) AS rank
    FROM ranked WHERE rn <= {_TOP_K}
    """,
    tags=("similarity", "topk"),
)
def sim_bruteforce_topk(
    spark: SparkSession, sf_dir: str, e: DataFrame | None = None
) -> DataFrame:
    """`e` (optional): a prebuilt (vec_id, v=normalized vector, ...) frame —
    the recall evaluators pass a checkpointed one so the exact arm and the
    approximate arm share ONE corpus scan + normalize pass."""
    if e is None:
        emb = _emb(spark, sf_dir)
        e = emb.select(
            "vec_id",
            _normalize(F.col("embedding").cast("array<double>")).alias("v"),
        )
    # limit is a no-op (unique vec_id -> < _N_QUERIES rows) that makes the
    # query-set bound statically visible to the broadcast-hint plan lint
    q = e.filter(F.col("vec_id") < _N_QUERIES).select(
        F.col("vec_id").alias("qid"), F.col("v").alias("qv")
    ).limit(_N_QUERIES)
    c = e.filter(F.col("vec_id") >= _N_QUERIES).select(
        F.col("vec_id").alias("cid"), F.col("v").alias("cv")
    )
    # Query side is tiny -> broadcast; corpus streams through map-side scoring.
    scored = F.broadcast(q).crossJoin(c).withColumn("cs", _dot(F.col("qv"), F.col("cv")))
    w = Window.partitionBy("qid").orderBy(F.round(F.col("cs"), 6).desc(), F.col("cid"))
    return (
        scored.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= _TOP_K)
        .select(
            "qid", "cid", F.round("cs", 4).alias("cos_sim"), F.col("rn").cast("int").alias("rank")
        )
    )


# ---------------------------------------------------------------------------
# LSH-bucketed ANN: md5-parity hyperplanes -> bit signature -> bucket join.
def _plane_weight_sql(p: int, d: int) -> int:
    # Evaluated at registration time in Python; both engines receive literals.
    import hashlib

    h = hashlib.md5(f"{p}|{d}".encode()).hexdigest()
    return 1 if int(h[0], 16) % 2 == 0 else -1


_PLANES = [[_plane_weight_sql(p, d) for d in range(_DIM)] for p in range(_N_PLANES)]


def _bucket_sql(vec_expr: str) -> str:
    bits = []
    for p, plane in enumerate(_PLANES):
        terms = " + ".join(f"({w}) * {vec_expr}[{d + 1}]" for d, w in enumerate(plane))
        bits.append(f"(CASE WHEN ({terms}) > 0 THEN (1 << {p}) ELSE 0 END)")
    return " + ".join(bits)


def _array_literal(nested) -> Column:
    """Nested float array literal via ONE F.expr parse. F.lit(pylist)
    converts element-by-element over py4j — measured ~1.4 s for the 2048
    floats of the multi-table planes (and ~0.35 s for one table's 512),
    paid at every plan build. The SQL text form is one JVM parse call;
    the D suffix pins DOUBLE (bare 1.0 would parse as DECIMAL)."""
    def render(x) -> str:
        if isinstance(x, (list, tuple)):
            return "array(" + ",".join(render(e) for e in x) + ")"
        return f"{float(x)}D"

    return F.expr(render(nested))


def _bucket_spark(vec: Column) -> Column:
    # Planes as one nested array literal + higher-order functions: the
    # projection loop runs inside codegen instead of a 512-node expression
    # tree (which costs seconds of Catalyst analysis at plan time).
    planes = _array_literal(_PLANES)
    # Bit order differs from the oracle's (1 << p) packing, but bucket values
    # are only join keys within one engine — any bijection of signatures
    # produces the identical candidate-pair set.
    bits = F.transform(
        planes, lambda plane: F.when(_dot(vec, plane) > 0, F.lit(1)).otherwise(F.lit(0))
    )
    return F.aggregate(bits, F.lit(0), lambda acc, b: acc * 2 + b)


@register(
    "sim_lsh_bucket_join",
    oracle=f"""
    WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
    sig AS (SELECT vec_id, v, {_bucket_sql('v')} AS bucket FROM e),
    q AS (SELECT vec_id AS qid, v AS qv, bucket FROM sig WHERE vec_id < {_N_QUERIES}),
    c AS (SELECT vec_id AS cid, v AS cv, bucket FROM sig WHERE vec_id >= {_N_QUERIES}),
    cand AS (
      SELECT qid, cid,
             list_inner_product(qv, cv) /
               (sqrt(list_inner_product(qv, qv)) * sqrt(list_inner_product(cv, cv))) AS cs
      FROM q JOIN c USING (bucket)
    ), ranked AS (
      SELECT qid, cid, cs,
             ROW_NUMBER() OVER (PARTITION BY qid ORDER BY ROUND(cs, 6) DESC, cid) AS rn
      FROM cand
    )
    SELECT qid, cid, ROUND(cs, 4) AS cos_sim, CAST(rn AS INT) AS rank
    FROM ranked WHERE rn <= {_TOP_K}
    """,
    tags=("similarity", "lsh"),
)
def sim_lsh_bucket_join(
    spark: SparkSession, sf_dir: str, e: DataFrame | None = None
) -> DataFrame:
    """`e` (optional): a prebuilt (vec_id, v=normalized, ...) frame — the
    recall evaluator passes a checkpointed one shared with the exact arm
    (bucket bits are sign-of-dot-product, scale-invariant, so computing
    them from the normalized vector gives identical buckets)."""
    emb = _emb(spark, sf_dir)
    v = F.col("embedding").cast("array<double>")
    # Bucket bits come from the RAW vector (sign of a dot product is
    # scale-invariant, so raw vs normalized gives identical buckets); the
    # stored vector is pre-normalized so in-bucket cosine is one dot product.
    # Signatures are materialized ONCE at the self-join boundary
    # (localCheckpoint): both branches then read the computed relation. This
    # matches production ANN (signatures are built once and persisted), halves
    # the signature arithmetic versus recomputing per branch — and sidesteps a
    # Catalyst defect: self-joining a plan whose projection captures an outer
    # attribute inside NESTED higher-order-function lambdas (_bucket_spark's
    # transform->when->aggregate->zip_with over `vec`) makes the
    # DeduplicateRelations rewrite mis-bind that attribute
    # (INTERNAL_ERROR_ATTRIBUTE_NOT_FOUND at run time, dependent on the
    # session's exprId history). After the checkpoint no lambda expressions
    # remain in the joined plan.
    if e is not None and "bucket" in e.columns:
        sig = e  # caller already built + checkpointed the signature frame
    elif e is not None:
        sig = e.select(
            "vec_id", "v", _bucket_spark(F.col("v")).alias("bucket")
        ).localCheckpoint(eager=False)
    else:
        sig = emb.select(
            "vec_id", _normalize(v).alias("v"), _bucket_spark(v).alias("bucket")
        ).localCheckpoint(eager=False)
    q = sig.filter(F.col("vec_id") < _N_QUERIES).select(
        F.col("vec_id").alias("qid"), F.col("v").alias("qv"), "bucket"
    )
    c = sig.filter(F.col("vec_id") >= _N_QUERIES).select(
        F.col("vec_id").alias("cid"), F.col("v").alias("cv"), "bucket"
    )
    cand = F.broadcast(q).join(c, "bucket").withColumn("cs", _dot(F.col("qv"), F.col("cv")))
    w = Window.partitionBy("qid").orderBy(F.round(F.col("cs"), 6).desc(), F.col("cid"))
    return (
        cand.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= _TOP_K)
        .select(
            "qid", "cid", F.round("cs", 4).alias("cos_sim"), F.col("rn").cast("int").alias("rank")
        )
    )


def _centroids(e: DataFrame) -> DataFrame:
    """label -> centroid vector (per-dim mean, rounded 6 for cross-engine
    determinism), packed back into an array."""
    per_dim = (
        e.select("label", F.posexplode("v").alias("dim", "x"))
        .groupBy("label", "dim")
        .agg(F.round(F.avg("x"), 6).alias("m"))
    )
    return per_dim.groupBy("label").agg(
        F.transform(
            F.array_sort(F.collect_list(F.struct("dim", "m"))), lambda s: s["m"]
        ).alias("centv")
    )


_NPROBE = 2

# ---------------------------------------------------------------------------
# IVF index build/probe split. A production IVF index is BUILT once (train
# centroids, assign + co-locate the corpus by cell) and PROBED per query.
# Round 13: the former module-level `_IVF_INDEX` (`.cache()` + count keyed
# on (applicationId, sf_dir)) memoised the built index across bench runs —
# sim_ivf_build's reported median was a pure cache hit (VERDICT r12 #3,
# gaming). Each invocation now derives the index lazily from the parquet
# inputs: `sim_ivf_build` times the centroid training it returns, and
# `sim_ivf_topk` pays its own corpus normalization per run. At 100 TB the
# production form is a parquet layout partitioned by cell, i.e. the
# amortization belongs in ingest, not in a module-level memo.


def ivf_build_index(spark: SparkSession, sf_dir: str) -> tuple[DataFrame, DataFrame]:
    """Derive the IVF index frames, fresh per invocation: (centroids, corpus).

    centroids: (label, centv) — normalized per-label mean vectors.
    corpus:    (cid, cv, label) — normalized vectors co-located by label
               (repartition = the write-time clustering).
    """
    emb = _emb(spark, sf_dir)
    e = emb.select(
        "vec_id", "label", F.col("embedding").cast("array<double>").alias("v")
    )
    cent = _centroids(e).select("label", _normalize(F.col("centv")).alias("centv"))
    en = emb.select(
        "vec_id", "label", _normalize(F.col("embedding").cast("array<double>")).alias("v")
    )
    corpus = (
        en.filter(F.col("vec_id") >= _N_QUERIES)
        .select(F.col("vec_id").alias("cid"), F.col("v").alias("cv"), "label")
        .repartition("label")
    )
    return cent, corpus


@register(
    "sim_ivf_build",
    oracle=f"""
    WITH e AS (SELECT vec_id, label, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
    per_dim AS (
      SELECT label, u.i AS dim, ROUND(AVG(v[u.i]), 6) AS m
      FROM e, LATERAL (SELECT UNNEST(generate_series(1, {_DIM})) AS i) u
      GROUP BY label, u.i
    ), cent AS (
      SELECT label, list(m ORDER BY dim) AS c0 FROM per_dim GROUP BY label
    )
    SELECT label,
           array_to_string(
               list_transform(c0, x -> CAST(ROUND(
                   ROUND(x / sqrt(list_inner_product(c0, c0)), 6) * 1000000
               ) AS BIGINT)),
               ',') AS centv
    FROM cent
    """,
    tags=("similarity", "ivf", "index-build"),
)
def sim_ivf_build(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The timed index build: centroid training (per-label means over the
    full corpus), returning the (checkable) normalized centroid table —
    computed fresh per run from the parquet inputs. The vectors leave
    the query as comma-joined integer-microlattice strings (round-6 then
    x1e6): identical doubles on both engines land on identical integers,
    and the output stays scalar-typed (registry contract,
    tests/test_registry_schema.py)."""
    cent, _corpus = ivf_build_index(spark, sf_dir)
    return cent.select(
        "label",
        F.array_join(
            F.transform(
                "centv",
                lambda x: F.round(F.round(x, 6) * 1000000).cast("long").cast("string"),
            ),
            ",",
        ).alias("centv"),
    )


# ---------------------------------------------------------------------------
# Per-label centroid similarity (IVF coarse-quantizer building block):
# centroids as mean vectors per label, then each query scored against every
# centroid — the "assign to nearest cell" step of an IVF index.
@register(
    "sim_ivf_topk",
    oracle=f"""
    WITH e AS (SELECT vec_id, label, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
    per_dim AS (
      SELECT label, u.i AS dim, ROUND(AVG(v[u.i]), 6) AS m
      FROM e, LATERAL (SELECT UNNEST(generate_series(1, {_DIM})) AS i) u
      GROUP BY label, u.i
    ), cent AS (
      SELECT label, list(m ORDER BY dim) AS centv FROM per_dim GROUP BY label
    ),
    q AS (SELECT vec_id AS qid, v AS qv FROM e WHERE vec_id < {_N_QUERIES}),
    c AS (SELECT vec_id AS cid, v AS cv, label FROM e WHERE vec_id >= {_N_QUERIES}),
    qcell AS (
      SELECT qid, label,
             ROW_NUMBER() OVER (
               PARTITION BY qid
               ORDER BY ROUND(list_inner_product(qv, centv) /
                 (sqrt(list_inner_product(qv, qv)) * sqrt(list_inner_product(centv, centv))), 6) DESC,
                 label) AS rn
      FROM q CROSS JOIN cent
    ),
    probe AS (SELECT qid, label FROM qcell WHERE rn <= {_NPROBE}),
    cand AS (
      SELECT p.qid, c.cid,
             list_inner_product(q.qv, c.cv) /
               (sqrt(list_inner_product(q.qv, q.qv)) * sqrt(list_inner_product(c.cv, c.cv))) AS cs
      FROM probe p JOIN c ON p.label = c.label JOIN q ON q.qid = p.qid
    ), ranked AS (
      SELECT qid, cid, cs,
             ROW_NUMBER() OVER (PARTITION BY qid ORDER BY ROUND(cs, 6) DESC, cid) AS rn
      FROM cand
    )
    SELECT qid, cid, ROUND(cs, 4) AS cos_sim, CAST(rn AS INT) AS rank
    FROM ranked WHERE rn <= {_TOP_K}
    """,
    tags=("similarity", "ivf", "topk"),
)
def sim_ivf_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF probe: coarse-quantize queries to their {_NPROBE} nearest label
    cells, exact cosine ONLY within probed cells. The index frames are
    derived fresh per run (ivf_build_index) — no cross-run memoisation.

    The 100 TB shape: centroids are O(cells) and broadcast; the corpus is
    cell-partitioned at build (ingest) time so a probe touches
    nprobe/cells of the data — the brute-force cross join never happens.
    """
    cent, c = ivf_build_index(spark, sf_dir)
    emb = _emb(spark, sf_dir)
    en = emb.select(
        "vec_id", "label", _normalize(F.col("embedding").cast("array<double>")).alias("v")
    )
    # limits are no-ops (unique vec_id; rn <= _NPROBE per query) that make
    # the bounds statically visible to the broadcast-hint plan lint
    q = en.filter(F.col("vec_id") < _N_QUERIES).select(
        F.col("vec_id").alias("qid"), F.col("v").alias("qv")
    ).limit(_N_QUERIES)
    wq = Window.partitionBy("qid").orderBy(
        F.round(_dot(F.col("qv"), F.col("centv")), 6).desc(), F.col("label")
    )
    probe = (
        F.broadcast(q)
        .crossJoin(F.broadcast(cent))
        .withColumn("rn", F.row_number().over(wq))
        .filter(F.col("rn") <= _NPROBE)
        .select("qid", "qv", "label")
        .limit(_N_QUERIES * _NPROBE)
    )
    cand = F.broadcast(probe).join(c, "label").withColumn(
        "cs", _dot(F.col("qv"), F.col("cv"))
    )
    w = Window.partitionBy("qid").orderBy(F.round(F.col("cs"), 6).desc(), F.col("cid"))
    return (
        cand.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= _TOP_K)
        .select(
            "qid", "cid", F.round("cs", 4).alias("cos_sim"), F.col("rn").cast("int").alias("rank")
        )
    )


@register(
    "sim_label_centroids",
    oracle=f"""
    WITH e AS (SELECT vec_id, label, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
    per_dim AS (
      SELECT label, u.i AS dim, ROUND(AVG(v[u.i]), 6) AS m
      FROM e, LATERAL (SELECT UNNEST(generate_series(1, {_DIM})) AS i) u
      GROUP BY label, u.i
    ), cent AS (
      SELECT label, list(m ORDER BY dim) AS cv FROM per_dim GROUP BY label
    ), cnt AS (SELECT label, COUNT(*) AS n FROM e GROUP BY label)
    SELECT label, CAST(n AS BIGINT) AS n, ROUND(list_inner_product(cv, cv), 4) AS centroid_sq_norm
    FROM cent JOIN cnt USING (label)
    """,
    tags=("similarity", "ivf"),
)
def sim_label_centroids(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = _emb(spark, sf_dir)
    e = emb.select("label", F.col("embedding").cast("array<double>").alias("v"))
    # Mean per dimension: posexplode -> groupBy (label, dim) -> avg -> re-pack.
    # At 100 TB this is the standard "compute centroids" shuffle: (label, dim)
    # keys, perfectly partial-aggregatable.
    per_dim = (
        e.select("label", F.posexplode("v").alias("dim", "x"))
        .groupBy("label", "dim")
        .agg(F.round(F.avg("x"), 6).alias("m"))
    )
    cent = per_dim.groupBy("label").agg(
        F.array_sort(F.collect_list(F.struct("dim", "m"))).alias("packed")
    )
    cnt = e.groupBy("label").agg(F.count(F.lit(1)).alias("n"))
    cv = F.transform(F.col("packed"), lambda s: s["m"])
    return (
        cent.join(cnt, "label")
        .select(
            "label",
            F.col("n").cast("long").alias("n"),
            F.round(_dot(cv, cv), 4).alias("centroid_sq_norm"),
        )
    )


# ---------------------------------------------------------------------------
# int8 scalar quantization — the 100 TB embedding STORAGE path: a float32
# vector compresses 4x to int8 + one float scale per vector
# (q[i] = round(v[i] * 127 / max|v|), v ≈ q * scale). Pure JVM transforms.
# The query reports per-vector reconstruction error, proving the codec's
# bound (max abs error <= scale/2) holds over the corpus.
@register(
    "sim_quantize_int8",
    oracle="""
    WITH e AS (
      SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings WHERE vec_id < 200
    ), scaled AS (
      SELECT vec_id, v,
             list_max(list_transform(v, x -> abs(x))) / 127.0 AS scale
      FROM e
    ), q AS (
      SELECT vec_id, scale,
             list_transform(v, x -> CAST(floor(x / scale + 0.5) AS INTEGER)) AS qv,
             v
      FROM scaled WHERE scale > 0
    )
    SELECT vec_id, ROUND(scale, 6) AS scale,
           CAST(list_max(list_transform(qv, x -> abs(x))) AS INTEGER) AS max_q,
           ROUND(list_max(list_transform(list_zip(v, qv),
                 p -> abs(p[1] - p[2] * scale))), 6) AS max_abs_err
    FROM q ORDER BY vec_id
    """,
    tags=("similarity", "quantize"),
)
def sim_quantize_int8(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = _emb(spark, sf_dir)
    v = F.col("embedding").cast("array<double>")
    scaled = emb.filter(F.col("vec_id") < 200).select(
        "vec_id",
        v.alias("v"),
        (F.array_max(F.transform(v, lambda x: F.abs(x))) / 127.0).alias("scale"),
    )
    # floor(q + 0.5), not round(): the engines' round() disagree on exact
    # .5 ties; floor of the identical IEEE quotient is bit-deterministic in
    # both.
    q = scaled.filter(F.col("scale") > 0).withColumn(
        "qv", F.transform("v", lambda x: F.floor(x / F.col("scale") + 0.5).cast("int"))
    )
    # The error column is computed in its OWN projection: putting the
    # lambda-captured F.col("scale") in the same select as a rounded sibling
    # alias `scale` makes the capture resolve to the ROUNDED alias (observed:
    # err inflated by 127 * the 5e-7 rounding shift).
    q = q.withColumn(
        "err", F.array_max(F.zip_with("v", "qv", lambda a, b: F.abs(a - b * F.col("scale"))))
    )
    return q.select(
        "vec_id",
        F.round("scale", 6).alias("scale"),
        F.array_max(F.transform("qv", lambda x: F.abs(x))).alias("max_q"),
        F.round("err", 6).alias("max_abs_err"),
    ).orderBy("vec_id")


# ---------------------------------------------------------------------------
# Unsupervised k-means (Lloyd) — the IVF path above uses the label column as
# supervised cells; this is the unsupervised variant a real ANN index builds
# with. `sim_kmeans_assign` registers ONE assignment step (SQL-expressible,
# oracle-checked); `kmeans_iterate` runs full Lloyd iterations and is pinned
# against a numpy reference with identical deterministic init in
# tests/test_kmeans.py.
_KMEANS_K = 8


def _kmeans_seeds(e: DataFrame) -> DataFrame:
    """Deterministic init: the first K vec_ids, normalized (k-means on the
    unit sphere == spherical k-means; assignment is max dot product)."""
    # limit is a no-op (vec_id is unique, so the filter admits < K rows) that
    # makes the K-bound statically visible to the broadcast-hint plan lint
    return (
        e.filter(F.col("vec_id") < _KMEANS_K)
        .select(F.col("vec_id").alias("cell"), _normalize(F.col("v")).alias("cv"))
        .limit(_KMEANS_K)
    )


@register(
    "sim_kmeans_assign",
    oracle=f"""
    WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
    seeds AS (
      SELECT vec_id AS cell,
             list_transform(v, x -> x / sqrt(list_inner_product(v, v))) AS cv
      FROM e WHERE vec_id < {_KMEANS_K}
    ),
    pts AS (
      SELECT vec_id, list_transform(v, x -> x / sqrt(list_inner_product(v, v))) AS pv
      FROM e WHERE vec_id >= {_KMEANS_K}
    ),
    scored AS (
      SELECT vec_id, cell, list_inner_product(pv, cv) AS sim,
             ROW_NUMBER() OVER (PARTITION BY vec_id
                                ORDER BY list_inner_product(pv, cv) DESC, cell) AS rn
      FROM pts CROSS JOIN seeds
    )
    SELECT CAST(cell AS INTEGER) AS cell, CAST(COUNT(*) AS BIGINT) AS n_points,
           ROUND(AVG(sim), 4) AS avg_sim
    FROM scored WHERE rn = 1
    GROUP BY cell ORDER BY cell
    """,
    tags=("similarity", "kmeans"),
)
def sim_kmeans_assign(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One Lloyd assignment step: nearest (max-dot) seed centroid per vector,
    reported as per-cell population + mean similarity.

    Scale: centroids broadcast (K rows); the corpus is scanned once; the
    argmax is a K-wide expand + per-vector window — never corpus x corpus.
    """
    e = _emb(spark, sf_dir).select(
        "vec_id", F.col("embedding").cast("array<double>").alias("v")
    )
    seeds = _kmeans_seeds(e)
    pts = (
        e.filter(F.col("vec_id") >= _KMEANS_K)
        .select("vec_id", _normalize(F.col("v")).alias("pv"))
    )
    scored = pts.crossJoin(F.broadcast(seeds)).select(
        "vec_id", "cell", _dot(F.col("pv"), F.col("cv")).alias("sim")
    )
    # NOTE (optimization round): a min_by partial-agg argmax (the
    # dedup_semantic shape) was measured here and ran 4-7% SLOWER than the
    # row_number window at sf0.1 — the struct-ordered min_by forces
    # ObjectHashAggregate, which costs more than the tiny per-key sort.
    # Kept as the window form; revisit if K-wide expands grow.
    w = Window.partitionBy("vec_id").orderBy(F.col("sim").desc(), F.col("cell"))
    return (
        scored.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .groupBy(F.col("cell").cast("int").alias("cell"))
        .agg(
            F.count(F.lit(1)).alias("n_points"),
            F.round(F.avg("sim"), 4).alias("avg_sim"),
        )
        .orderBy("cell")
    )


_PROTO_PRUNE_FRAC = 0.3  # drop the top-30% most prototypical per cluster


@register(
    "curate_prototype_prune",
    oracle=f"""
    WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
    seeds AS (
      SELECT vec_id AS cell,
             list_transform(v, x -> x / sqrt(list_inner_product(v, v))) AS cv
      FROM e WHERE vec_id < {_KMEANS_K}
    ),
    pts AS (
      SELECT vec_id, list_transform(v, x -> x / sqrt(list_inner_product(v, v))) AS pv
      FROM e WHERE vec_id >= {_KMEANS_K}
    ),
    scored AS (
      SELECT vec_id, cell, list_inner_product(pv, cv) AS sim,
             ROW_NUMBER() OVER (PARTITION BY vec_id
                                ORDER BY list_inner_product(pv, cv) DESC, cell) AS rn
      FROM pts CROSS JOIN seeds
    ),
    ranked AS (
      SELECT vec_id, cell, sim,
             ROW_NUMBER() OVER (PARTITION BY cell
                                ORDER BY sim DESC, vec_id) AS prank,
             COUNT(*) OVER (PARTITION BY cell) AS n
      FROM scored WHERE rn = 1
    )
    SELECT CAST(vec_id AS BIGINT) AS vec_id, CAST(cell AS INTEGER) AS cell,
           ROUND(sim, 4) AS centroid_sim
    FROM ranked WHERE prank > CEIL({_PROTO_PRUNE_FRAC} * n)
    ORDER BY vec_id
    """,
    tags=("curate", "pruning", "embeddings"),
)
def curate_prototype_prune(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Data pruning by prototypicality (Sorscher et al. 2022, "Beyond
    neural scaling laws: beating power law scaling via data pruning"):
    cluster the embedding space, rank each example by similarity to its
    cluster centroid, and DROP the most prototypical fraction per cluster —
    in the large-data regime, easy (prototypical) examples contribute least,
    so keeping the harder tail beats random pruning.

    Dataflow: K seed centroids broadcast (bounded); one corpus scan for the
    K-wide assignment expand; two cluster-keyed windows (prototypicality
    rank + cluster size). Never corpus x corpus — the same scale shape as
    sim_kmeans_assign, plus an output-sized filter. At 100 TB the windows
    shuffle on the K cluster keys; for tiny K with huge clusters, salt the
    rank into per-salt quantiles (the diversity-cap pattern,
    curate_diversity_bucket_cap)."""
    e = _emb(spark, sf_dir).select(
        "vec_id", F.col("embedding").cast("array<double>").alias("v")
    )
    seeds = _kmeans_seeds(e)
    pts = (
        e.filter(F.col("vec_id") >= _KMEANS_K)
        .select("vec_id", _normalize(F.col("v")).alias("pv"))
    )
    scored = pts.crossJoin(F.broadcast(seeds)).select(
        "vec_id", "cell", _dot(F.col("pv"), F.col("cv")).alias("sim")
    )
    w_assign = Window.partitionBy("vec_id").orderBy(
        F.col("sim").desc(), F.col("cell")
    )
    assigned = (
        scored.withColumn("rn", F.row_number().over(w_assign))
        .filter(F.col("rn") == 1)
        .drop("rn")
    )
    w_rank = Window.partitionBy("cell").orderBy(
        F.col("sim").desc(), F.col("vec_id")
    )
    w_cell = Window.partitionBy("cell")
    return (
        assigned.withColumn("prank", F.row_number().over(w_rank))
        .withColumn("n", F.count(F.lit(1)).over(w_cell))
        .filter(F.col("prank") > F.ceil(F.lit(_PROTO_PRUNE_FRAC) * F.col("n")))
        .select(
            F.col("vec_id").cast("bigint").alias("vec_id"),
            F.col("cell").cast("int").alias("cell"),
            F.round("sim", 4).alias("centroid_sim"),
        )
        .orderBy("vec_id")
    )


def kmeans_iterate(
    spark: SparkSession, sf_dir: str, k: int = _KMEANS_K, iters: int = 3
) -> DataFrame:
    """Full spherical k-means: `iters` Lloyd rounds over the corpus.

    Each round: broadcast the K current centroids, assign every vector to
    its max-dot centroid (K-wide expand + window argmax), recompute cell
    means with one groupBy over exploded (cell, dim, value) triples, and
    re-normalize. Entirely JVM-side; per-round cost is one corpus scan +
    one (cell, dim)-grain aggregation (K*dim groups), which is the textbook
    distributed k-means dataflow. Returns (cell, centv, n_points).
    """
    e = _emb(spark, sf_dir).select(
        "vec_id", _normalize(F.col("embedding").cast("array<double>")).alias("pv")
    )
    # loop-invariant hub (one reference per Lloyd round): lazy localCheckpoint,
    # not .cache() — CacheManager keys on the canonicalized plan, so a cached
    # frame would be silently reused across separate invocations (cross-run
    # memoisation; VERDICT r12 #3)
    pts = e.filter(F.col("vec_id") >= k).localCheckpoint(eager=False)
    cents = (
        e.filter(F.col("vec_id") < k)
        .select(F.col("vec_id").alias("cell"), F.col("pv").alias("cv"))
    )
    for _ in range(iters):
        w = Window.partitionBy("vec_id").orderBy(F.col("sim").desc(), F.col("cell"))
        assigned = (
            pts.crossJoin(F.broadcast(cents))
            .select("vec_id", "cell", "pv", _dot(F.col("pv"), F.col("cv")).alias("sim"))
            .withColumn("rn", F.row_number().over(w))
            .filter(F.col("rn") == 1)
        )
        per_dim = (
            assigned.select("cell", F.posexplode("pv").alias("dim", "x"))
            .groupBy("cell", "dim")
            .agg(F.avg("x").alias("m"))
        )
        new_cents = (
            per_dim.groupBy("cell")
            .agg(
                F.array_sort(F.collect_list(F.struct("dim", "m"))).alias("packed")
            )
            .select(
                "cell",
                _normalize(F.transform(F.col("packed"), lambda s: s["m"])).alias("new_cv"),
            )
        )
        # groupBy only emits populated cells: carry the previous centroid
        # forward when a cell empties this round, so the result always has
        # exactly k centroids (standard Lloyd empty-cell policy)
        cents = (
            cents.select("cell", F.col("cv").alias("prev_cv"))
            .join(new_cents, "cell", "left")
            .select("cell", F.coalesce("new_cv", "prev_cv").alias("cv"))
        )
        # truncate lineage: each round's plan would otherwise nest the
        # previous round's (same reasoning as the CC fixpoint in dedup.py)
        cents = cents.localCheckpoint(eager=True)
    counts = (
        pts.crossJoin(F.broadcast(cents))
        .select("vec_id", "cell", _dot(F.col("pv"), F.col("cv")).alias("sim"))
        .withColumn(
            "rn",
            F.row_number().over(
                Window.partitionBy("vec_id").orderBy(F.col("sim").desc(), F.col("cell"))
            ),
        )
        .filter(F.col("rn") == 1)
        .groupBy("cell")
        .agg(F.count(F.lit(1)).alias("n_points"))
    )
    return cents.join(counts, "cell", "left").select(
        "cell",
        F.col("cv").alias("centv"),
        F.coalesce("n_points", F.lit(0)).alias("n_points"),
    )


# ---------------------------------------------------------------------------
# OR-amplified multi-table LSH: L independent hyperplane tables; a candidate
# qualifies if it shares a bucket with the query in ANY table. Single-table
# LSH (above) keeps cost minimal but recall degrades with cluster spread —
# multi-table is the standard recall lever (P[found] = 1-(1-p)^L), the same
# amplification the MinHash dedup's banding applies. Plane weights are
# md5-parity per (table, plane, dim), so the oracle builds identical tables.
_N_TABLES = 4


def _mt_plane_weight(t: int, p: int, d: int) -> int:
    import hashlib

    h = hashlib.md5(f"{t}:{p}|{d}".encode()).hexdigest()
    return 1 if int(h[0], 16) % 2 == 0 else -1


_MT_PLANES = [
    [[_mt_plane_weight(t, p, d) for d in range(_DIM)] for p in range(_N_PLANES)]
    for t in range(_N_TABLES)
]


def _mt_bucket_sql(vec_expr: str, t: int) -> str:
    bits = []
    for p, plane in enumerate(_MT_PLANES[t]):
        terms = " + ".join(f"({w}) * {vec_expr}[{d + 1}]" for d, w in enumerate(plane))
        bits.append(f"(CASE WHEN ({terms}) > 0 THEN (1 << {p}) ELSE 0 END)")
    return " + ".join(bits)


def _mt_buckets_spark(vec: Column) -> Column:
    """array of L bucket ids, one per table (loops run inside codegen)."""
    tables = _array_literal(_MT_PLANES)
    return F.transform(
        tables,
        lambda planes: F.aggregate(
            F.transform(
                planes,
                lambda plane: F.when(_dot(vec, plane) > 0, F.lit(1)).otherwise(F.lit(0)),
            ),
            F.lit(0),
            lambda acc, b: acc * 2 + b,
        ),
    )


@register(
    "sim_lsh_multitable",
    oracle=f"""
    WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
    sig AS (
      SELECT vec_id, v,
             {", ".join(f"{_mt_bucket_sql('v', t)} AS b{t}" for t in range(_N_TABLES))}
      FROM e
    ),
    q AS (SELECT vec_id AS qid, v AS qv, {", ".join(f"b{t}" for t in range(_N_TABLES))}
          FROM sig WHERE vec_id < {_N_QUERIES}),
    c AS (SELECT vec_id AS cid, v AS cv, {", ".join(f"b{t}" for t in range(_N_TABLES))}
          FROM sig WHERE vec_id >= {_N_QUERIES}),
    cand AS (
      {" UNION ".join(
          f"SELECT qid, cid, qv, cv FROM q JOIN c ON q.b{t} = c.b{t}"
          for t in range(_N_TABLES)
      )}
    ),
    scored AS (
      SELECT qid, cid,
             list_inner_product(qv, cv) /
               (sqrt(list_inner_product(qv, qv)) * sqrt(list_inner_product(cv, cv))) AS cs
      FROM cand
    ), ranked AS (
      SELECT qid, cid, cs,
             ROW_NUMBER() OVER (PARTITION BY qid ORDER BY ROUND(cs, 6) DESC, cid) AS rn
      FROM scored
    )
    SELECT qid, cid, ROUND(cs, 4) AS cos_sim, CAST(rn AS INT) AS rank
    FROM ranked WHERE rn <= {_TOP_K}
    """,
    tags=("similarity", "lsh", "multitable"),
)
def sim_lsh_multitable(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = _emb(spark, sf_dir)
    v = F.col("embedding").cast("array<double>")
    sig = emb.select(
        "vec_id", _normalize(v).alias("v"), _mt_buckets_spark(v).alias("bs")
    ).localCheckpoint(eager=False)  # materialize once (same rationale as
    # sim_lsh_bucket_join: signatures persist; no lambdas cross the self-join)
    # ONE equi-join on the composite (table, bucket) key instead of L
    # separate joins: explode each side's L buckets to (t, bkt) rows — the
    # identical OR'd candidate set, one broadcast/shuffle instead of L, and
    # no per-table loop in the plan.
    q = sig.filter(F.col("vec_id") < _N_QUERIES).select(
        F.col("vec_id").alias("qid"), F.col("v").alias("qv"),
        F.posexplode("bs").alias("t", "bkt"),
    )
    c = sig.filter(F.col("vec_id") >= _N_QUERIES).select(
        F.col("vec_id").alias("cid"), F.col("v").alias("cv"),
        F.posexplode("bs").alias("t", "bkt"),
    )
    cand = (
        F.broadcast(q)
        .join(c, ["t", "bkt"])
        .select("qid", "cid", "qv", "cv")
        .dropDuplicates(["qid", "cid"])
    )
    scored = cand.withColumn("cs", _dot(F.col("qv"), F.col("cv")))
    w = Window.partitionBy("qid").orderBy(F.round(F.col("cs"), 6).desc(), F.col("cid"))
    return (
        scored.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= _TOP_K)
        .select(
            "qid", "cid", F.round("cs", 4).alias("cos_sim"),
            F.col("rn").cast("int").alias("rank"),
        )
    )


# ---------------------------------------------------------------------------
# Product quantization (PQ) ANN: split the 64-dim vector into M=8 subspaces,
# quantize each subvector to the nearest of K=16 codebook entries, score
# queries against CODES via an asymmetric-distance lookup table (ADC), then
# exact-rerank the shortlist. THE memory-compression scale path: a 100 TB
# corpus keeps M bytes per vector (8 B here vs 512 B of raw doubles), the
# per-query LUT is M*K dot products computed once and broadcast, and scoring
# never touches raw vectors until the final rerank of _PQ_CAND candidates.
# Codebooks are sample-initialized (k-means with 0 Lloyd iterations — the
# standard baseline init): entry j of every subspace = the subvector of a
# deterministic anchor row, which keeps the whole index reproducible AND
# SQL-expressible, so the full PQ pipeline hash-checks against DuckDB
# (unlike the two sketches, which are rows-only). Trained codebooks would
# plug in via kmeans_iterate without changing the dataflow.
_PQ_M = 8            # subspaces
_PQ_SUB = _DIM // _PQ_M
_PQ_K = 16           # codes per subspace
_PQ_CAND = 50        # ADC shortlist size (10x k), exact-reranked to _TOP_K.
                     # PQ's quantization error is commensurate with
                     # WITHIN-cluster score gaps, so ADC reliably finds the
                     # right neighborhood but not the exact order inside it —
                     # the deep shortlist + exact rerank is what buys back
                     # recall (0.42 at 4x k -> 1.0 at 10x k on the clustered
                     # recall gate), the standard PQ deployment shape.
# Deterministic anchor rows, strided across the corpus (stride 31 spans ids
# 10..475 — inside every SF's id range and across all clusters of the
# recall-gate corpus; a narrow stride would sample one corner of the data
# and starve the codebook, measured recall 0.4 vs 0.9+ with the spread).
_PQ_ANCHOR_IDS = [_N_QUERIES + 31 * j for j in range(_PQ_K)]


@register(
    "sim_pq_topk",
    oracle=f"""
    WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS r FROM embeddings),
    n AS (SELECT vec_id,
                 list_transform(r, x -> x / sqrt(list_inner_product(r, r))) AS v
          FROM e),
    q AS (SELECT vec_id AS qid, v AS qv FROM n WHERE vec_id < {_N_QUERIES}),
    c AS (SELECT vec_id AS cid, v AS cv FROM n WHERE vec_id >= {_N_QUERIES}),
    anchors AS (
      SELECT CAST(ROW_NUMBER() OVER (ORDER BY vec_id) - 1 AS INT) AS code_id, v AS av
      FROM n WHERE vec_id IN ({", ".join(str(i) for i in _PQ_ANCHOR_IDS)})
    ),
    sub AS (SELECT CAST(range AS INT) AS m FROM range({_PQ_M})),
    cdist AS (
      SELECT cid, m, code_id,
             ROW_NUMBER() OVER (
               PARTITION BY cid, m
               ORDER BY ROUND(
                 list_inner_product(list_slice(cv, m*{_PQ_SUB}+1, m*{_PQ_SUB}+{_PQ_SUB}),
                                    list_slice(cv, m*{_PQ_SUB}+1, m*{_PQ_SUB}+{_PQ_SUB}))
                 - 2 * list_inner_product(list_slice(cv, m*{_PQ_SUB}+1, m*{_PQ_SUB}+{_PQ_SUB}),
                                          list_slice(av, m*{_PQ_SUB}+1, m*{_PQ_SUB}+{_PQ_SUB}))
                 + list_inner_product(list_slice(av, m*{_PQ_SUB}+1, m*{_PQ_SUB}+{_PQ_SUB}),
                                      list_slice(av, m*{_PQ_SUB}+1, m*{_PQ_SUB}+{_PQ_SUB})), 6),
                 code_id) AS rn
      FROM c CROSS JOIN sub CROSS JOIN anchors
    ),
    codes AS (SELECT cid, m, code_id FROM cdist WHERE rn = 1),
    lut AS (
      SELECT qid, m, code_id,
             list_inner_product(list_slice(qv, m*{_PQ_SUB}+1, m*{_PQ_SUB}+{_PQ_SUB}),
                                list_slice(av, m*{_PQ_SUB}+1, m*{_PQ_SUB}+{_PQ_SUB})) AS ip
      FROM q CROSS JOIN sub CROSS JOIN anchors
    ),
    adc AS (
      SELECT qid, cid, SUM(ip) AS approx_ip
      FROM codes JOIN lut USING (m, code_id)
      GROUP BY qid, cid
    ),
    shortlist AS (
      SELECT qid, cid,
             ROW_NUMBER() OVER (PARTITION BY qid
                                ORDER BY ROUND(approx_ip, 6) DESC, cid) AS crn
      FROM adc
    ),
    rerank AS (
      SELECT s.qid, s.cid, list_inner_product(q.qv, c.cv) AS cs
      FROM shortlist s JOIN q ON s.qid = q.qid JOIN c ON s.cid = c.cid
      WHERE s.crn <= {_PQ_CAND}
    )
    SELECT qid, cid, ROUND(cs, 4) AS cos_sim, CAST(rn AS INT) AS rank
    FROM (SELECT qid, cid, cs,
                 ROW_NUMBER() OVER (PARTITION BY qid
                                    ORDER BY ROUND(cs, 6) DESC, cid) AS rn
          FROM rerank)
    WHERE rn <= {_TOP_K}
    """,
    tags=("similarity", "topk", "pq"),
)
def sim_pq_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = _emb(spark, sf_dir)
    # Materialized once: the normalized corpus feeds FIVE branches (query
    # set, corpus codes, anchors/codebook, and both rerank vector joins) —
    # without the checkpoint each branch re-runs the scan + normalize.
    n = emb.select(
        "vec_id", _normalize(F.col("embedding").cast("array<double>")).alias("v")
    ).localCheckpoint(eager=False)
    # limit is a no-op (unique vec_id -> < _N_QUERIES rows) that makes the
    # query-set bound statically visible to the broadcast-hint plan lint
    q = n.filter(F.col("vec_id") < _N_QUERIES).select(
        F.col("vec_id").alias("qid"), F.col("v").alias("qv")
    ).limit(_N_QUERIES)
    c = n.filter(F.col("vec_id") >= _N_QUERIES).select(
        F.col("vec_id").alias("cid"), F.col("v").alias("cv")
    )
    sub = F.posexplode(
        F.transform(
            F.sequence(F.lit(0), F.lit(_PQ_M - 1)),
            lambda m: F.slice(F.col("v"), m * _PQ_SUB + 1, _PQ_SUB),
        )
    )
    # code_id = rank of vec_id among the (sorted literal) anchor ids — an
    # array_position lookup, no window needed over the 16-row codebook input.
    # limit is a no-op (K anchor ids x M subspaces) that makes the codebook
    # bound statically visible to the broadcast-hint plan lint
    anchors = (
        n.filter(F.col("vec_id").isin(_PQ_ANCHOR_IDS))
        .withColumn(
            "code_id",
            (F.array_position(F.lit(sorted(_PQ_ANCHOR_IDS)), F.col("vec_id")) - 1).cast("int"),
        )
        .select("code_id", sub.alias("m", "asub"))
        .limit(_PQ_K * _PQ_M)
    )
    qsub = q.select("qid", F.col("qv").alias("v")).select(
        "qid", sub.alias("m", "qsub")
    )
    # Codebook as ONE broadcast row (round 13, VERDICT r12 #6): the M*K
    # subvectors sorted by (m, code_id) — entry (m, k) sits at index
    # m*K + k + 1. Encoding then runs IN-ROW over the corpus (a 16-entry
    # codegen scan per subspace) instead of exploding the corpus M ways
    # and re-assembling codes with a (cid, m) groupBy — the corpus never
    # shuffles between the scan and the per-query shortlist window.
    cb = anchors.select(
        "m", "code_id", "asub", _dot(F.col("asub"), F.col("asub")).alias("a2")
    ).groupBy().agg(
        F.array_sort(
            F.collect_list(F.struct("m", "code_id", "asub", "a2"))
        ).alias("cb")
    )
    # argmin over the K codebook entries of subspace m, iterated in
    # code_id order with a strict '<' on the ROUNDED distance — keeps the
    # lowest code_id among round-6 ties, exactly the oracle's
    # ROW_NUMBER(ORDER BY ROUND(d2, 6), code_id) choice. |a|^2 comes
    # precomputed from the codebook row (same sequential fold, identical
    # value); |s|^2 is bound ONCE per subspace in the staged `subs`
    # struct — HOF lambdas run interpreted with no common-subexpression
    # elimination, so an inline dot(s, s) would re-evaluate per codebook
    # entry (16x; the with_band_keys staging note).
    def _encode(sub, m):
        def step(acc, k):
            e = F.element_at(F.col("cb"), (m * _PQ_K + k + 1).cast("int"))
            rd = F.round(sub["ss"] - 2 * _dot(sub["s"], e["asub"]) + e["a2"], 6)
            better = (acc["k"] < 0) | (rd < acc["d"])
            return F.when(better, F.struct(rd.alias("d"), k.alias("k"))).otherwise(acc)

        init = F.struct(
            F.lit(float("inf")).alias("d"), F.lit(-1).cast("int").alias("k")
        )
        return F.aggregate(
            F.sequence(F.lit(0), F.lit(_PQ_K - 1)), init, step, lambda acc: acc["k"]
        )

    def _subs(v):
        def one(m):
            s = F.slice(v, m * _PQ_SUB + 1, _PQ_SUB)
            return F.struct(s.alias("s"), _dot(s, s).alias("ss"))

        return F.transform(F.sequence(F.lit(0), F.lit(_PQ_M - 1)), one)

    coded = c.crossJoin(F.broadcast(cb)).select(
        "cid",
        "cv",
        F.transform(_subs(F.col("cv")), _encode).alias("codes"),
    )
    # Per-query ADC lookup table as ONE row per query: ips[m*K + code + 1]
    # = <query subvector m, codebook entry code>. Tiny (N_QUERIES rows),
    # broadcast; the ADC score is an in-row M-term fold — no (qid, cid)
    # aggregation exchange.
    lut = (
        qsub.join(F.broadcast(anchors), "m")
        .select("qid", "m", "code_id", _dot(F.col("qsub"), F.col("asub")).alias("ip"))
        .groupBy("qid")
        .agg(
            F.transform(
                F.array_sort(F.collect_list(F.struct("m", "code_id", "ip"))),
                lambda s: s["ip"],
            ).alias("ips")
        )
        .limit(_N_QUERIES)  # no-op: one LUT row per query
    )
    adc = coded.crossJoin(F.broadcast(lut)).select(
        "qid",
        "cid",
        F.aggregate(
            F.sequence(F.lit(0), F.lit(_PQ_M - 1)),
            F.lit(0.0),
            lambda acc, m: acc
            + F.element_at(
                F.col("ips"),
                (m * _PQ_K + F.element_at(F.col("codes"), m + 1) + 1).cast("int"),
            ),
        ).alias("approx_ip"),
    )
    wc = Window.partitionBy("qid").orderBy(
        F.round(F.col("approx_ip"), 6).desc(), F.col("cid")
    )
    shortlist = (
        adc.withColumn("crn", F.row_number().over(wc))
        .filter(F.col("crn") <= _PQ_CAND)
        .select("qid", "cid")
    )
    rerank = (
        shortlist.join(F.broadcast(q), "qid")
        .join(c, "cid")
        .withColumn("cs", _dot(F.col("qv"), F.col("cv")))
    )
    w = Window.partitionBy("qid").orderBy(F.round(F.col("cs"), 6).desc(), F.col("cid"))
    return (
        rerank.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= _TOP_K)
        .select(
            "qid", "cid", F.round("cs", 4).alias("cos_sim"),
            F.col("rn").cast("int").alias("rank"),
        )
    )


# ---------------------------------------------------------------------------
# Per-dimension embedding statistics + power-iteration PCA.
#
# The whitening/normalization prep step every embedding pipeline runs before
# indexing. `sim_embedding_dimstats` registers the exact per-dimension
# moment pass (scaled-integer lattice, so both engines agree bit-for-bit);
# `pca_power_iteration` computes the top principal direction WITHOUT ever
# materializing the dim x dim covariance: the matvec C·x = (1/n) Σ_v v (v·x)
# is two narrow corpus passes per iteration — the only formulation that
# scales when dim² outgrows a task (and the reason the registered stats stay
# per-dimension, not per-dimension-pair).

_DIM_SCALE = 1_000_000


@register(
    "sim_embedding_dimstats",
    oracle=f"""
    WITH x AS (
      SELECT d.i AS dim,
             CAST(ROUND(e.embedding[CAST(d.i AS INT) + 1] * {_DIM_SCALE}) AS BIGINT) AS v
      FROM embeddings e,
           LATERAL (SELECT UNNEST(generate_series(0, len(e.embedding) - 1)) AS i) d
    )
    SELECT CAST(dim AS INTEGER) AS dim,
           CAST(COUNT(*) AS BIGINT) AS n,
           CAST(SUM(v) AS BIGINT) AS sum_scaled,
           CAST(SUM(v * v) AS BIGINT) AS sumsq_scaled,
           CAST(MIN(v) AS BIGINT) AS min_scaled,
           CAST(MAX(v) AS BIGINT) AS max_scaled
    FROM x GROUP BY dim ORDER BY dim
    """,
    tags=("similarity", "statistics"),
)
def sim_embedding_dimstats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact per-dimension moments of the embedding corpus on a 10^6
    lattice: one posexplode (dim-wide, bounded inflation) + one partial-agg
    groupBy on the 64-value dim key. Feeds mean-centering / min-max
    normalization / variance-based dim pruning; the integer sums are
    mergeable partials."""
    emb = _emb(spark, sf_dir)
    x = emb.select(
        F.posexplode("embedding").alias("dim", "raw")
    ).select(
        "dim", F.round(F.col("raw") * _DIM_SCALE).cast("long").alias("v")
    )
    return (
        x.groupBy(F.col("dim").cast("int").alias("dim"))
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum("v").alias("sum_scaled"),
            F.sum(F.col("v") * F.col("v")).alias("sumsq_scaled"),
            F.min("v").alias("min_scaled"),
            F.max("v").alias("max_scaled"),
        )
        .orderBy("dim")
    )


def pca_power_iteration(emb: DataFrame, iters: int = 8) -> DataFrame:
    """Top principal direction of the (uncentered) second-moment matrix via
    power iteration with the covariance NEVER materialized: each round is
      dot_v = v · x          (narrow zip_with/aggregate per row)
      y_d   = Σ_v v_d * dot_v  (posexplode + groupBy dim — 64 groups)
    then engine-side normalization. The iterate is a ONE-ROW broadcast
    DataFrame the whole way (like kmeans_iterate's centroid frame — no
    driver-side collect; localCheckpoint truncates per-round lineage).
    Returns a 1-row frame with `direction` (unit-norm array<double>, sign
    fixed so the first non-negligible component is positive; NULL on a
    degenerate all-zero corpus). Convergence vs numpy pinned in
    tests/test_pca.py."""
    emb = emb.select("embedding")
    # deterministic engine-side init: the uniform unit direction
    x = emb.limit(1).select(
        F.expr(
            "transform(embedding, v -> CAST(1.0 AS DOUBLE) / sqrt(size(embedding)))"
        ).alias("xv")
    )
    dot = F.expr(
        "aggregate(zip_with(embedding, xv, (a, b) -> a * b),"
        " CAST(0.0 AS DOUBLE), (acc, v) -> acc + v)"
    )
    for _ in range(iters):
        y = (
            emb.crossJoin(F.broadcast(x))
            .select(F.posexplode("embedding").alias("dim", "val"), dot.alias("dot"))
            .groupBy("dim")
            .agg(F.sum(F.col("val") * F.col("dot")).alias("y"))
        )
        x = (
            y.groupBy()
            .agg(F.array_sort(F.collect_list(F.struct("dim", "y"))).alias("packed"))
            .select(F.expr("transform(packed, s -> s.y)").alias("yv"))
            .select(
                F.expr(
                    "CASE WHEN aggregate(yv, CAST(0.0 AS DOUBLE),"
                    "                    (a, v) -> a + v * v) = 0.0 THEN NULL "
                    "ELSE transform(yv, v -> v / sqrt("
                    "  aggregate(yv, CAST(0.0 AS DOUBLE), (a, v) -> a + v * v))) "
                    "END"
                ).alias("xv")
            )
            .localCheckpoint(eager=True)  # truncate per-round lineage
        )
    # sign convention: first component with |c| > 1e-12 made positive
    lead = "filter(xv, c -> abs(c) > 1e-12)[0]"
    return x.select(
        F.expr(
            f"CASE WHEN xv IS NULL THEN NULL "
            f"WHEN {lead} < 0 THEN transform(xv, c -> -c) ELSE xv END"
        ).alias("direction")
    )


# ---------------------------------------------------------------------------
# Linear-probe sufficient statistics: the ONE-PASS, MERGEABLE normal-equation
# sums (Gram matrix) from which a ridge/least-squares readout of `label` from
# the embedding is solved driver-side. The standard embedding-quality check
# ("linear probe") re-expressed for 100 TB: the corpus-scale work is exactly
# one partial-agg pass producing a constant-size (D+2)^2/2-row frame —
# cellwise-ADD mergeable like the count-min sketch, so executors combine
# map-side and the shuffle carries <= 171 rows per partition. Features are
# quantized onto an integer lattice (floor(x * 1000): floor, not round —
# identical in both engines) so every sum is an exact BIGINT; the extended
# vector z = [x_0..x_15, 1.0, y] folds the intercept column and the target
# into the same Gram matrix (upper triangle holds X^TX, X^Ty, y^Ty, and n
# via the constant cell). tests/test_linear_probe.py solves the system with
# numpy and pins exact equality against a numpy-built Gram.

_PROBE_D = 16  # leading embedding dims used as probe features
_PROBE_Q = 1000  # lattice scale


@register(
    "sim_linear_probe_gram",
    oracle=f"""
    WITH z AS (
      SELECT list_concat(
               list_transform(embedding[1:{_PROBE_D}],
                              x -> CAST(FLOOR(x * {_PROBE_Q}) AS BIGINT)),
               [CAST({_PROBE_Q} AS BIGINT),
                CAST(label * {_PROBE_Q} AS BIGINT)]) AS zq
      FROM embeddings
    )
    SELECT CAST(i AS INT) AS i, CAST(j AS INT) AS j,
           CAST(SUM(zq[i + 1] * zq[j + 1]) AS BIGINT) AS s
    FROM z,
         LATERAL (SELECT UNNEST(generate_series(0, {_PROBE_D + 1})) AS i) gi,
         LATERAL (SELECT UNNEST(generate_series(0, {_PROBE_D + 1})) AS j) gj
    WHERE j >= i
    GROUP BY i, j
    ORDER BY i, j
    """,
    tags=("similarity", "probe"),
)
def sim_linear_probe_gram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Upper-triangle Gram sums of the quantized extended vector
    [x_0..x_{D-1}, 1, y] over all embeddings — the mergeable sufficient
    statistics of a linear probe."""
    z = _emb(spark, sf_dir).select(
        F.concat(
            F.transform(
                F.slice("embedding", 1, _PROBE_D),
                lambda x: F.floor(x * _PROBE_Q).cast("long"),
            ),
            F.array(
                F.lit(_PROBE_Q).cast("long"),
                (F.col("label").cast("long") * _PROBE_Q),
            ),
        ).alias("zq")
    )
    pairs = z.select(F.posexplode("zq").alias("i", "zi"), "zq").select(
        "i", "zi", F.posexplode("zq").alias("j", "zj")
    )
    return (
        pairs.filter(F.col("j") >= F.col("i"))
        .groupBy("i", "j")
        .agg(F.sum(F.col("zi") * F.col("zj")).alias("s"))
        .select(
            F.col("i").cast("int").alias("i"),
            F.col("j").cast("int").alias("j"),
            F.col("s").cast("long").alias("s"),
        )
        .orderBy("i", "j")
    )


# ---------------------------------------------------------------------------
# ANN evaluation: recall@k of the LSH bucket join against brute-force ground
# truth — the metric every ANN deployment tracks (and the first-class "is
# the index good enough" operator; the clustered-data quality gate lives in
# tests/test_ann_recall.py). On the driver's near-uniform embeddings the
# NUMBER is data-inherently low — what the oracle pins is that both engines
# compute the identical evaluation: same ground truth, same candidates,
# same per-query hit counts.
#
# Scale: both inputs are top-k frames (N_QUERIES x TOP_K rows); the
# evaluation join is trivially broadcastable and the groupBy is
# query-count-sized. Ground truth at 100 TB would come from the documented
# brute-force path over a sampled query set — recall evaluation is always
# sample-based at scale.
@register(
    "sim_recall_lsh",
    oracle=f"""
    WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
    q AS (SELECT vec_id AS qid, v AS qv FROM e WHERE vec_id < {_N_QUERIES}),
    c AS (SELECT vec_id AS cid, v AS cv FROM e WHERE vec_id >= {_N_QUERIES}),
    bf_ranked AS (
      SELECT qid, cid,
             ROW_NUMBER() OVER (PARTITION BY qid ORDER BY
               ROUND(list_inner_product(qv, cv) /
                 (sqrt(list_inner_product(qv, qv)) * sqrt(list_inner_product(cv, cv))), 6)
               DESC, cid) AS rn
      FROM q CROSS JOIN c
    ),
    bf AS (SELECT qid, cid FROM bf_ranked WHERE rn <= {_TOP_K}),
    sig AS (SELECT vec_id, v, {_bucket_sql('v')} AS bucket FROM e),
    lq AS (SELECT vec_id AS qid, v AS qv, bucket FROM sig WHERE vec_id < {_N_QUERIES}),
    lc AS (SELECT vec_id AS cid, v AS cv, bucket FROM sig WHERE vec_id >= {_N_QUERIES}),
    lsh_ranked AS (
      SELECT qid, cid,
             ROW_NUMBER() OVER (PARTITION BY qid ORDER BY
               ROUND(list_inner_product(qv, cv) /
                 (sqrt(list_inner_product(qv, qv)) * sqrt(list_inner_product(cv, cv))), 6)
               DESC, cid) AS rn
      FROM lq JOIN lc USING (bucket)
    ),
    lsh AS (SELECT qid, cid FROM lsh_ranked WHERE rn <= {_TOP_K})
    SELECT bf.qid, CAST(COUNT(lsh.cid) AS BIGINT) AS hits,
           CAST(COUNT(lsh.cid) * {100 // _TOP_K} AS BIGINT) AS recall_pct
    FROM bf LEFT JOIN lsh ON lsh.qid = bf.qid AND lsh.cid = bf.cid
    GROUP BY bf.qid
    ORDER BY bf.qid
    """,
    tags=("similarity", "evaluation", "lsh"),
)
def sim_recall_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """recall@k of sim_lsh_bucket_join vs sim_bruteforce_topk, per query.
    Both arms read ONE checkpointed signature frame (previously each arm
    re-scanned and re-normalized the corpus independently; the brute-force
    arm simply ignores the bucket column)."""
    emb = _emb(spark, sf_dir)
    v = F.col("embedding").cast("array<double>")
    sig = emb.select(
        "vec_id", _normalize(v).alias("v"), _bucket_spark(v).alias("bucket")
    ).localCheckpoint(eager=False)
    bf = sim_bruteforce_topk(spark, sf_dir, e=sig).select("qid", "cid")
    lsh = sim_lsh_bucket_join(spark, sf_dir, e=sig).select(
        "qid", "cid", F.lit(1).alias("hit")
    )
    return (
        bf.join(lsh, ["qid", "cid"], "left")
        .groupBy("qid")
        .agg(F.count("hit").alias("hits"))
        .select(
            "qid",
            "hits",
            (F.col("hits") * (100 // _TOP_K)).alias("recall_pct"),
        )
        .orderBy("qid")
    )


# ---------------------------------------------------------------------------
# Hard-negative mining (contrastive/triplet training data): for each anchor
# vector, the most similar SAME-label vector (positive) and the most similar
# DIFFERENT-label vector (the hard negative — the pair that actually moves a
# contrastive loss; random negatives are trivially separable). The standard
# mining step in embedding-model training (e.g. SBERT/DPR-style pipelines).
#
# Scale: the anchor set is bounded (vec_id < N_QUERIES, `.limit` visible to
# the plan lint) and broadcasts; the corpus streams through map-side scoring
# once, and the per-anchor/per-role top-1 is a two-stage WindowGroupLimit.
# At 100 TB the mining runs per anchor SHARD with the same plan; production
# systems swap the brute-force scorer for the ANN candidate join
# (sim_lsh_bucket_join) with identical downstream shape.
@register(
    "sim_hard_negatives",
    oracle=f"""
    WITH e AS (SELECT vec_id, label,
                      CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
    q AS (SELECT vec_id AS qid, label AS qlabel, v AS qv FROM e
          WHERE vec_id < {_N_QUERIES}),
    c AS (SELECT vec_id AS cid, label AS clabel, v AS cv FROM e
          WHERE vec_id >= {_N_QUERIES}),
    scored AS (
      SELECT qid, cid,
             CASE WHEN clabel = qlabel THEN 'positive'
                  ELSE 'hard_negative' END AS role,
             list_inner_product(qv, cv) /
               (sqrt(list_inner_product(qv, qv)) *
                sqrt(list_inner_product(cv, cv))) AS cs
      FROM q CROSS JOIN c
    ),
    ranked AS (
      SELECT qid, role, cid, cs,
             ROW_NUMBER() OVER (PARTITION BY qid, role
                                ORDER BY ROUND(cs, 6) DESC, cid) AS rn
      FROM scored
    )
    SELECT qid, role, cid, ROUND(cs, 4) AS cos_sim
    FROM ranked WHERE rn = 1
    ORDER BY qid, role
    """,
    tags=("similarity", "mining", "training"),
)
def sim_hard_negatives(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = _emb(spark, sf_dir)
    e = emb.select(
        "vec_id", "label",
        _normalize(F.col("embedding").cast("array<double>")).alias("v"),
    )
    q = (
        e.filter(F.col("vec_id") < _N_QUERIES)
        .select(
            F.col("vec_id").alias("qid"),
            F.col("label").alias("qlabel"),
            F.col("v").alias("qv"),
        )
        .limit(_N_QUERIES)
    )
    c = e.filter(F.col("vec_id") >= _N_QUERIES).select(
        F.col("vec_id").alias("cid"),
        F.col("label").alias("clabel"),
        F.col("v").alias("cv"),
    )
    scored = (
        F.broadcast(q)
        .crossJoin(c)
        .select(
            "qid",
            "cid",
            F.when(F.col("clabel") == F.col("qlabel"), "positive")
            .otherwise("hard_negative")
            .alias("role"),
            _dot(F.col("qv"), F.col("cv")).alias("cs"),
        )
    )
    w = Window.partitionBy("qid", "role").orderBy(
        F.round(F.col("cs"), 6).desc(), F.col("cid")
    )
    return (
        scored.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("qid", "role", "cid", F.round("cs", 4).alias("cos_sim"))
        .orderBy("qid", "role")
    )


# ---------------------------------------------------------------------------
# Maximum-inner-product top-k (round 9): the recommender-system metric —
# UN-normalized scores, so magnitude matters (a long vector can beat a
# better-aligned short one; cosine top-k cannot express this). Brute-force
# map-side scoring here; the documented ANN path is the MIPS->NN reduction
# (Bachrach et al., RecSys 2014): augment candidates with
# sqrt(M^2 - |x|^2) and queries with 0, after which inner-product order
# equals cosine order and every bucketed ANN structure above (LSH/IVF/PQ)
# applies unchanged.
@register(
    "sim_mips_topk",
    oracle=f"""
    WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
    q AS (SELECT vec_id AS qid, v AS qv FROM e WHERE vec_id < {_N_QUERIES}),
    c AS (SELECT vec_id AS cid, v AS cv FROM e WHERE vec_id >= {_N_QUERIES}),
    scored AS (
      SELECT qid, cid, list_inner_product(qv, cv) AS ip
      FROM q CROSS JOIN c
    ), ranked AS (
      SELECT qid, cid, ip,
             ROW_NUMBER() OVER (PARTITION BY qid
                                ORDER BY ROUND(ip, 6) DESC, cid) AS rn
      FROM scored
    )
    SELECT qid, cid, ROUND(ip, 4) AS inner_product, CAST(rn AS INT) AS rank
    FROM ranked WHERE rn <= {_TOP_K}
    """,
    tags=("similarity", "topk", "mips"),
)
def sim_mips_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = _emb(spark, sf_dir)
    e = emb.select("vec_id", F.col("embedding").cast("array<double>").alias("v"))
    q = e.filter(F.col("vec_id") < _N_QUERIES).select(
        F.col("vec_id").alias("qid"), F.col("v").alias("qv")
    ).limit(_N_QUERIES)
    c = e.filter(F.col("vec_id") >= _N_QUERIES).select(
        F.col("vec_id").alias("cid"), F.col("v").alias("cv")
    )
    scored = F.broadcast(q).crossJoin(c).withColumn(
        "ip", _dot(F.col("qv"), F.col("cv"))
    )
    w = Window.partitionBy("qid").orderBy(
        F.round(F.col("ip"), 6).desc(), F.col("cid")
    )
    return (
        scored.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= _TOP_K)
        .select(
            "qid", "cid",
            F.round("ip", 4).alias("inner_product"),
            F.col("rn").cast("int").alias("rank"),
        )
    )


# ---------------------------------------------------------------------------
# Cluster purity (round 9): the standard external clustering-evaluation
# metric — per cluster, the share of the dominant ground-truth label
# (purity = sum over clusters of max label count / N). Completes the
# evaluation harness (recall@k for retrieval, estimator error for MinHash,
# purity for clustering). Assignment = the audited sim_kmeans_assign cell
# rule; integer counts + one exact division per cluster.
@register(
    "sim_cluster_purity",
    oracle=f"""
    WITH e AS (SELECT vec_id, label, CAST(embedding AS DOUBLE[]) AS v
               FROM embeddings),
    seeds AS (
      SELECT vec_id AS cell,
             list_transform(v, x -> x / sqrt(list_inner_product(v, v))) AS cv
      FROM e WHERE vec_id < {_KMEANS_K}
    ),
    pts AS (
      SELECT vec_id, label,
             list_transform(v, x -> x / sqrt(list_inner_product(v, v))) AS pv
      FROM e WHERE vec_id >= {_KMEANS_K}
    ),
    scored AS (
      SELECT vec_id, label, cell,
             ROW_NUMBER() OVER (PARTITION BY vec_id
                                ORDER BY list_inner_product(pv, cv) DESC,
                                         cell) AS rn
      FROM pts CROSS JOIN seeds
    ),
    assign AS (SELECT vec_id, label, cell FROM scored WHERE rn = 1),
    lc AS (
      SELECT cell, label, CAST(COUNT(*) AS BIGINT) AS n
      FROM assign GROUP BY cell, label
    ),
    top AS (
      SELECT cell, CAST(MAX(n) AS BIGINT) AS top_n,
             CAST(SUM(n) AS BIGINT) AS total
      FROM lc GROUP BY cell
    )
    SELECT CAST(cell AS INTEGER) AS cell, top_n, total,
           ROUND(CAST(top_n AS DOUBLE) / total, 4) AS purity
    FROM top ORDER BY cell
    """,
    tags=("similarity", "kmeans", "evaluation"),
)
def sim_cluster_purity(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = _emb(spark, sf_dir)
    e = emb.select(
        "vec_id", "label",
        _normalize(F.col("embedding").cast("array<double>")).alias("v"),
    )
    seeds = e.filter(F.col("vec_id") < _KMEANS_K).select(
        F.col("vec_id").alias("cell"), F.col("v").alias("cv")
    ).limit(_KMEANS_K)
    pts = e.filter(F.col("vec_id") >= _KMEANS_K).select(
        "vec_id", "label", F.col("v").alias("pv")
    )
    w = Window.partitionBy("vec_id").orderBy(
        _dot(F.col("pv"), F.col("cv")).desc(), F.col("cell")
    )
    assign = (
        pts.crossJoin(F.broadcast(seeds))
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("vec_id", "label", "cell")
    )
    lc = assign.groupBy("cell", "label").agg(F.count(F.lit(1)).alias("n"))
    top = lc.groupBy("cell").agg(
        F.max("n").alias("top_n"), F.sum("n").alias("total")
    )
    return top.select(
        F.col("cell").cast("int").alias("cell"),
        "top_n",
        F.col("total").cast("long").alias("total"),
        F.round(F.col("top_n").cast("double") / F.col("total"), 4).alias("purity"),
    ).orderBy("cell")


# ---------------------------------------------------------------------------
# Matryoshka truncation evaluation (Kusupati et al. 2022, "Matryoshka
# Representation Learning"): retrieval quality of the PREFIX of an embedding
# — MRL-trained models pack coarse semantics into the first dims so a
# 4x-shorter prefix can serve the first-stage scan. The eval: recall@k of
# brute-force retrieval over the first _MRL_DIM dims (slice + re-normalize)
# against the full-dimension ranking — per query, the fraction of true
# top-k survivors. This is the measurement that decides whether the cheap
# prefix index is safe to deploy; on the synthetic (non-MRL) embeddings it
# reads LOW, which is exactly the point of running the harness.
#
# Scale: identical shape to sim_recall_lsh — two bounded top-k frames
# (N_QUERIES x K rows) joined and aggregated at query granularity; the
# corpus streams through map-side scoring once per ranking. At 100 TB the
# truncated pass reads _MRL_DIM/_DIM of the vector bytes — the actual
# production win being measured.
_MRL_DIM = 16


@register(
    "sim_matryoshka_eval",
    oracle=f"""
    WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v,
                      CAST(embedding[1:{_MRL_DIM}] AS DOUBLE[]) AS vt
               FROM embeddings),
    q AS (SELECT vec_id AS qid, v AS qv, vt AS qt FROM e
          WHERE vec_id < {_N_QUERIES}),
    c AS (SELECT vec_id AS cid, v AS cv, vt AS ct FROM e
          WHERE vec_id >= {_N_QUERIES}),
    full_ranked AS (
      SELECT qid, cid,
             ROW_NUMBER() OVER (PARTITION BY qid ORDER BY
               ROUND(list_inner_product(qv, cv) /
                 (sqrt(list_inner_product(qv, qv)) * sqrt(list_inner_product(cv, cv))), 6)
               DESC, cid) AS rn
      FROM q CROSS JOIN c
    ),
    fullk AS (SELECT qid, cid FROM full_ranked WHERE rn <= {_TOP_K}),
    trunc_ranked AS (
      SELECT qid, cid,
             ROW_NUMBER() OVER (PARTITION BY qid ORDER BY
               ROUND(list_inner_product(qt, ct) /
                 (sqrt(list_inner_product(qt, qt)) * sqrt(list_inner_product(ct, ct))), 6)
               DESC, cid) AS rn
      FROM q CROSS JOIN c
    ),
    trunck AS (SELECT qid, cid FROM trunc_ranked WHERE rn <= {_TOP_K})
    SELECT f.qid, CAST(COUNT(t.cid) AS BIGINT) AS hits,
           CAST(COUNT(t.cid) * {100 // _TOP_K} AS BIGINT) AS recall_pct
    FROM fullk f LEFT JOIN trunck t ON t.qid = f.qid AND t.cid = f.cid
    GROUP BY f.qid
    ORDER BY f.qid
    """,
    tags=("similarity", "evaluation", "matryoshka"),
)
def sim_matryoshka_eval(spark: SparkSession, sf_dir: str) -> DataFrame:
    """recall@k of first-16-dim prefix retrieval vs the full 64-dim
    brute-force ranking, per query."""
    emb = _emb(spark, sf_dir)
    # NOTE (optimization round): e is consumed four times (q/c of both
    # rankings), but a lazy localCheckpoint here measured 6-8% SLOWER at
    # sf0.1 — each consumer's pruned scan+normalize is cheaper than the
    # materialization barrier. Left un-checkpointed.
    e = emb.select(
        "vec_id",
        _normalize(F.col("embedding").cast("array<double>")).alias("v"),
        _normalize(
            F.slice(F.col("embedding").cast("array<double>"), 1, _MRL_DIM)
        ).alias("vt"),
    )

    def _topk(qcol: str, ccol: str) -> DataFrame:
        q = (
            e.filter(F.col("vec_id") < _N_QUERIES)
            .select(F.col("vec_id").alias("qid"), F.col(qcol).alias("qv"))
            .limit(_N_QUERIES)
        )
        c = e.filter(F.col("vec_id") >= _N_QUERIES).select(
            F.col("vec_id").alias("cid"), F.col(ccol).alias("cv")
        )
        scored = F.broadcast(q).crossJoin(c).withColumn(
            "cs", _dot(F.col("qv"), F.col("cv"))
        )
        w = Window.partitionBy("qid").orderBy(
            F.round(F.col("cs"), 6).desc(), F.col("cid")
        )
        return (
            scored.withColumn("rn", F.row_number().over(w))
            .filter(F.col("rn") <= _TOP_K)
            .select("qid", "cid")
        )

    fullk = _topk("v", "v")
    trunck = _topk("vt", "vt").withColumn("hit", F.lit(1))
    return (
        fullk.join(trunck, ["qid", "cid"], "left")
        .groupBy("qid")
        .agg(F.count("hit").alias("hits"))
        .select(
            "qid",
            "hits",
            (F.col("hits") * (100 // _TOP_K)).alias("recall_pct"),
        )
        .orderBy("qid")
    )


# ---------------------------------------------------------------------------
# Binary quantization (sign-bit embeddings; Charikar 2002's SimHash bound
# applied as 1-bit-per-dimension vector compression — the "BQ" mode modern
# vector stores ship): dim 64 packs into TWO 32-bit words per vector (64x
# smaller than float64), candidate ranking is XOR+popcount hamming, then
# an exact-cosine rerank of a 4k-deep shortlist. Two words, not one 64-bit
# word, because a 1<<63 shift overflows signed BIGINT on the oracle engine
# — and the split form is exactly how >64-dim vectors pack anyway.
#
# Scale: the packed corpus is 16 bytes/vector — the scan that replaces the
# 512-byte float scan; hamming is integer ALU work inside codegen. Same
# bounded shortlist -> rerank shape as sim_pq_topk.
_BQ_SHORTLIST = _TOP_K * 4


def _pack_sql(vec: str, lo: int) -> str:
    """32 sign bits of vec[lo+1 .. lo+32] as one BIGINT (bit_or fold)."""
    return (
        f"(SELECT bit_or(CASE WHEN {vec}[i + {lo}] > 0"
        f" THEN CAST(1 AS BIGINT) << (i - 1) ELSE 0 END)"
        f" FROM UNNEST(generate_series(1, 32)) AS t(i))"
    )


def _pack_word(v: Column, lo: int) -> Column:
    """32 sign bits of v[lo+1 .. lo+32] as one BIGINT.

    Round 13 (§1.2 per-task vs per-PLAN work): one compact aggregate-fold
    expression instead of the former unrolled 32-term OR tree. The unrolled
    form was 128 py4j-built Catalyst nodes per packed frame — measured as
    pure plan-BUILD/analysis cost on a corpus of only thousands of rows
    (the BQ family was build-dominated). Distinct bit weights make bit_or
    equal to +, so the fold accumulates with addition; values are
    bit-identical to the unrolled form and to the oracle's bit_or."""
    col = v._jc.toString() if hasattr(v, "_jc") else str(v)
    return F.expr(
        f"aggregate(sequence(1, 32), 0L, (acc, i) -> "
        f"acc + IF({col}[i + {lo} - 1] > 0D, shiftleft(1L, i - 1), 0L))"
    )


def _bq_frame(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(vec_id, v=normalized vector, w1, w2): one corpus pass computing the
    normalized vectors AND the packed sign words — the shared input of the
    whole BQ family. The words are packed from the RAW cast array, not the
    normalized one (same sign bits — scale invariance): packing the
    normalized column would let CollapseProject inline the normalize lambda
    into every one of the 128 pack terms (measured 1.2x slower)."""
    emb = _emb(spark, sf_dir)
    raw = emb.select(
        "vec_id", F.col("embedding").cast("array<double>").alias("r")
    )
    return raw.select(
        "vec_id",
        _normalize(F.col("r")).alias("v"),
        _pack_word(F.col("r"), 0).alias("w1"),
        _pack_word(F.col("r"), 32).alias("w2"),
    )


@register(
    "sim_binary_quantization",
    oracle=f"""
    WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
    packed AS (
      SELECT vec_id, v,
             {_pack_sql('v', 0)} AS w1,
             {_pack_sql('v', 32)} AS w2
      FROM e
    ),
    q AS (SELECT vec_id AS qid, v AS qv, w1 AS q1, w2 AS q2 FROM packed
          WHERE vec_id < {_N_QUERIES}),
    c AS (SELECT vec_id AS cid, v AS cv, w1 AS c1, w2 AS c2 FROM packed
          WHERE vec_id >= {_N_QUERIES}),
    ham AS (
      SELECT qid, cid, qv, cv,
             bit_count(xor(q1, c1)) + bit_count(xor(q2, c2)) AS hamming
      FROM q CROSS JOIN c
    ),
    shortlist AS (
      SELECT qid, cid, qv, cv, hamming,
             ROW_NUMBER() OVER (PARTITION BY qid
                                ORDER BY hamming, cid) AS hrn
      FROM ham
    ),
    rerank AS (
      SELECT qid, cid, hamming,
             list_inner_product(qv, cv) /
               (sqrt(list_inner_product(qv, qv))
                * sqrt(list_inner_product(cv, cv))) AS cs
      FROM shortlist WHERE hrn <= {_BQ_SHORTLIST}
    )
    SELECT qid, cid, CAST(hamming AS BIGINT) AS hamming,
           ROUND(cs, 4) AS cos_sim, CAST(rn AS INT) AS rank
    FROM (SELECT qid, cid, hamming, cs,
                 ROW_NUMBER() OVER (PARTITION BY qid
                                    ORDER BY ROUND(cs, 6) DESC, cid) AS rn
          FROM rerank)
    WHERE rn <= {_TOP_K}
    ORDER BY qid, rank
    """,
    tags=("similarity", "topk", "binary-quantization"),
)
def sim_binary_quantization(
    spark: SparkSession, sf_dir: str, e: DataFrame | None = None
) -> DataFrame:
    """1-bit-per-dim ANN: pack sign bits into two 32-bit words, hamming
    shortlist (XOR+popcount, whole-stage codegen), exact-cosine rerank.

    `e` (optional): a prebuilt (vec_id, v=normalized, w1, w2) frame — the
    recall evaluator passes a checkpointed one shared with the exact arm."""
    if e is None:
        e = _bq_frame(spark, sf_dir)
    q = (
        e.filter(F.col("vec_id") < _N_QUERIES)
        .select(F.col("vec_id").alias("qid"), F.col("v").alias("qv"),
                F.col("w1").alias("q1"), F.col("w2").alias("q2"))
        .limit(_N_QUERIES)
    )
    c = e.filter(F.col("vec_id") >= _N_QUERIES).select(
        F.col("vec_id").alias("cid"), F.col("v").alias("cv"),
        F.col("w1").alias("c1"), F.col("w2").alias("c2")
    )
    ham = (
        F.broadcast(q)
        .crossJoin(c)
        .withColumn(
            "hamming",
            F.bit_count(F.col("q1").bitwiseXOR(F.col("c1")))
            + F.bit_count(F.col("q2").bitwiseXOR(F.col("c2"))),
        )
    )
    wh = Window.partitionBy("qid").orderBy("hamming", "cid")
    shortlist = (
        ham.withColumn("hrn", F.row_number().over(wh))
        .filter(F.col("hrn") <= _BQ_SHORTLIST)
        .withColumn("cs", _dot(F.col("qv"), F.col("cv")))
    )
    wr = Window.partitionBy("qid").orderBy(
        F.round(F.col("cs"), 6).desc(), F.col("cid")
    )
    return (
        shortlist.withColumn("rn", F.row_number().over(wr))
        .filter(F.col("rn") <= _TOP_K)
        .select(
            "qid", "cid",
            F.col("hamming").cast("long"),
            F.round("cs", 4).alias("cos_sim"),
            F.col("rn").cast("int").alias("rank"),
        )
        .orderBy("qid", "rank")
    )


# ---------------------------------------------------------------------------
# BQ recall evaluation — the third leg of the recall-eval harness (next to
# sim_recall_lsh and sim_matryoshka_eval): recall@k of the sign-bit
# hamming+rerank retrieval against the exact brute-force ranking. The
# number that decides whether 16-byte vectors can serve the first stage.


@register(
    "sim_bq_recall",
    oracle=f"""
    WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
    q AS (SELECT vec_id AS qid, v AS qv FROM e WHERE vec_id < {_N_QUERIES}),
    c AS (SELECT vec_id AS cid, v AS cv FROM e WHERE vec_id >= {_N_QUERIES}),
    bf_ranked AS (
      SELECT qid, cid,
             ROW_NUMBER() OVER (PARTITION BY qid ORDER BY
               ROUND(list_inner_product(qv, cv) /
                 (sqrt(list_inner_product(qv, qv)) * sqrt(list_inner_product(cv, cv))), 6)
               DESC, cid) AS rn
      FROM q CROSS JOIN c
    ),
    bf AS (SELECT qid, cid FROM bf_ranked WHERE rn <= {_TOP_K}),
    packed AS (
      SELECT vec_id, v,
             {_pack_sql('v', 0)} AS w1,
             {_pack_sql('v', 32)} AS w2
      FROM e
    ),
    pq AS (SELECT vec_id AS qid, v AS qv, w1 AS q1, w2 AS q2 FROM packed
           WHERE vec_id < {_N_QUERIES}),
    pc AS (SELECT vec_id AS cid, v AS cv, w1 AS c1, w2 AS c2 FROM packed
           WHERE vec_id >= {_N_QUERIES}),
    ham AS (
      SELECT qid, cid, qv, cv,
             bit_count(xor(q1, c1)) + bit_count(xor(q2, c2)) AS hamming
      FROM pq CROSS JOIN pc
    ),
    shortlist AS (
      SELECT qid, cid, qv, cv,
             ROW_NUMBER() OVER (PARTITION BY qid
                                ORDER BY hamming, cid) AS hrn
      FROM ham
    ),
    bq AS (
      SELECT qid, cid FROM (
        SELECT qid, cid,
               ROW_NUMBER() OVER (PARTITION BY qid
                                  ORDER BY ROUND(list_inner_product(qv, cv) /
                                    (sqrt(list_inner_product(qv, qv))
                                     * sqrt(list_inner_product(cv, cv))), 6)
                                  DESC, cid) AS rn
        FROM shortlist WHERE hrn <= {_BQ_SHORTLIST}
      ) WHERE rn <= {_TOP_K}
    )
    SELECT bf.qid, CAST(COUNT(bq.cid) AS BIGINT) AS hits,
           CAST(COUNT(bq.cid) * {100 // _TOP_K} AS BIGINT) AS recall_pct
    FROM bf LEFT JOIN bq ON bq.qid = bf.qid AND bq.cid = bf.cid
    GROUP BY bf.qid
    ORDER BY bf.qid
    """,
    tags=("similarity", "evaluation", "binary-quantization"),
)
def sim_bq_recall(spark: SparkSession, sf_dir: str) -> DataFrame:
    """recall@k of sim_binary_quantization vs sim_bruteforce_topk, per
    query — two bounded top-k frames joined at query granularity. Both arms
    read ONE checkpointed normalized+packed corpus frame (previously each
    arm re-scanned and re-normalized the corpus independently)."""
    e = _bq_frame(spark, sf_dir).localCheckpoint(eager=False)
    bf = sim_bruteforce_topk(spark, sf_dir, e=e).select("qid", "cid")
    bq = sim_binary_quantization(spark, sf_dir, e=e).select(
        "qid", "cid", F.lit(1).alias("hit")
    )
    return (
        bf.join(bq, ["qid", "cid"], "left")
        .groupBy("qid")
        .agg(F.count("hit").alias("hits"))
        .select(
            "qid",
            "hits",
            (F.col("hits") * (100 // _TOP_K)).alias("recall_pct"),
        )
        .orderBy("qid")
    )


# ---------------------------------------------------------------------------
# Banded (hamming-LSH) binary quantization — the 100 TB path for BQ
# (VERDICT r9 #7). sim_binary_quantization scans the FULL packed corpus per
# query (correct as an eval baseline; 16 B/vector). This variant applies the
# multimodal_phash_neardup banding pattern to the BQ words: the 64 sign
# bits split into 8 bands x 8 bits, and only (query, corpus) pairs sharing
# AT LEAST ONE band value become hamming candidates — an equi-join on
# (band, value) buckets instead of a cross join. Gionis/Indyk/Motwani
# (1999) banding over Charikar (2002) sign-bit hashes: a candidate with
# hamming distance h over 64 bits survives banding with probability
# 1 - (1 - (1 - h/64)^8)^8 — near-1 for the close neighbors the rerank
# wants, vanishing for the random-distance bulk (h ~ 32 -> ~3% of the
# corpus per query in expectation). The shortlist+rerank stages are
# unchanged, so recall is gated against the full-scan harness in
# tests/test_ann_recall.py.
_BQ_N_BANDS = 8
_BQ_BAND_BITS = 8


def _bq_band_val(word, b_in_word: int):
    """Band value: bits [b*8, b*8+8) of a packed 32-bit word (stored
    non-negative in a long, so arithmetic shiftright is exact)."""
    return F.shiftright(word, b_in_word * _BQ_BAND_BITS).bitwiseAND(F.lit(255))


def _bq_banded_frames(spark: SparkSession, sf_dir: str):
    """(query, corpus, candidate) frames for the banded BQ retrieval —
    exposed so tests can measure the candidate-set reduction the banding
    buys (the op's 100 TB claim, gated in test_ann_recall.py).

    The packed corpus frame is materialized once (lazy localCheckpoint):
    the corpus side is consumed TWICE (band explode for candidate
    generation + the hamming join), and without the checkpoint each
    consumer re-runs the scan + normalize + 128-term pack."""
    e = _bq_frame(spark, sf_dir).localCheckpoint(eager=False)
    q = (
        e.filter(F.col("vec_id") < _N_QUERIES)
        .select(F.col("vec_id").alias("qid"), F.col("v").alias("qv"),
                F.col("w1").alias("q1"), F.col("w2").alias("q2"))
        .limit(_N_QUERIES)
    )
    c = e.filter(F.col("vec_id") >= _N_QUERIES).select(
        F.col("vec_id").alias("cid"), F.col("v").alias("cv"),
        F.col("w1").alias("c1"), F.col("w2").alias("c2")
    )

    def bands(frame: DataFrame, idcol: str, wa: str, wb: str) -> DataFrame:
        pairs = [
            F.struct(
                F.lit(b).alias("band"),
                _bq_band_val(F.col(wa if b < 4 else wb), b % 4).alias("val"),
            )
            for b in range(_BQ_N_BANDS)
        ]
        return frame.select(
            idcol, F.explode(F.array(*pairs)).alias("bv")
        ).select(idcol, F.col("bv.band").alias("band"), F.col("bv.val").alias("val"))

    # candidate generation: bucket equi-join, never a cross join — the
    # query side (N_QUERIES x 8 band rows) broadcasts
    cand = (
        F.broadcast(bands(q, "qid", "q1", "q2"))
        .join(bands(c, "cid", "c1", "c2"), ["band", "val"])
        .select("qid", "cid")
        .distinct()
    )
    return q, c, cand



@register(
    "sim_bq_banded",
    oracle=f"""
    WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
    packed AS (
      SELECT vec_id, v,
             {{w1}} AS w1,
             {{w2}} AS w2
      FROM e
    ),
    pq AS (SELECT vec_id AS qid, v AS qv, w1 AS q1, w2 AS q2 FROM packed
           WHERE vec_id < {_N_QUERIES}),
    pc AS (SELECT vec_id AS cid, v AS cv, w1 AS c1, w2 AS c2 FROM packed
           WHERE vec_id >= {_N_QUERIES}),
    qb AS (
      SELECT qid, b.i AS band,
             CASE WHEN b.i < 4 THEN (q1 >> (b.i * 8)) & 255
                  ELSE (q2 >> ((b.i - 4) * 8)) & 255 END AS val
      FROM pq, LATERAL (SELECT UNNEST(generate_series(0, 7)) AS i) b
    ),
    cb AS (
      SELECT cid, b.i AS band,
             CASE WHEN b.i < 4 THEN (c1 >> (b.i * 8)) & 255
                  ELSE (c2 >> ((b.i - 4) * 8)) & 255 END AS val
      FROM pc, LATERAL (SELECT UNNEST(generate_series(0, 7)) AS i) b
    ),
    cand AS (SELECT DISTINCT qid, cid FROM qb JOIN cb USING (band, val)),
    ham AS (
      SELECT cand.qid, cand.cid, pq.qv, pc.cv,
             bit_count(xor(pq.q1, pc.c1)) + bit_count(xor(pq.q2, pc.c2))
               AS hamming
      FROM cand JOIN pq ON pq.qid = cand.qid JOIN pc ON pc.cid = cand.cid
    ),
    shortlist AS (
      SELECT qid, cid, qv, cv, hamming,
             ROW_NUMBER() OVER (PARTITION BY qid
                                ORDER BY hamming, cid) AS hrn
      FROM ham
    ),
    rerank AS (
      SELECT qid, cid, hamming,
             list_inner_product(qv, cv) /
               (sqrt(list_inner_product(qv, qv))
                * sqrt(list_inner_product(cv, cv))) AS cs
      FROM shortlist WHERE hrn <= {_BQ_SHORTLIST}
    )
    SELECT qid, cid, CAST(hamming AS BIGINT) AS hamming,
           ROUND(cs, 4) AS cos_sim, CAST(rn AS INT) AS rank
    FROM (SELECT qid, cid, hamming, cs,
                 ROW_NUMBER() OVER (PARTITION BY qid
                                    ORDER BY ROUND(cs, 6) DESC, cid) AS rn
          FROM rerank)
    WHERE rn <= {_TOP_K}
    ORDER BY qid, rank
    """.format(w1=_pack_sql('v', 0), w2=_pack_sql('v', 32)),
    tags=("similarity", "topk", "binary-quantization", "lsh"),
)
def sim_bq_banded(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hamming-LSH banded BQ retrieval: bucket equi-join candidates, full
    hamming only on candidates, exact-cosine rerank of the shortlist."""
    q, c, cand = _bq_banded_frames(spark, sf_dir)
    ham = (
        cand.join(F.broadcast(q), "qid")
        .join(c, "cid")
        .withColumn(
            "hamming",
            F.bit_count(F.col("q1").bitwiseXOR(F.col("c1")))
            + F.bit_count(F.col("q2").bitwiseXOR(F.col("c2"))),
        )
    )
    wh = Window.partitionBy("qid").orderBy("hamming", "cid")
    shortlist = (
        ham.withColumn("hrn", F.row_number().over(wh))
        .filter(F.col("hrn") <= _BQ_SHORTLIST)
        .withColumn("cs", _dot(F.col("qv"), F.col("cv")))
    )
    wr = Window.partitionBy("qid").orderBy(
        F.round(F.col("cs"), 6).desc(), F.col("cid")
    )
    return (
        shortlist.withColumn("rn", F.row_number().over(wr))
        .filter(F.col("rn") <= _TOP_K)
        .select(
            "qid", "cid",
            F.col("hamming").cast("long"),
            F.round("cs", 4).alias("cos_sim"),
            F.col("rn").cast("int").alias("rank"),
        )
        .orderBy("qid", "rank")
    )
