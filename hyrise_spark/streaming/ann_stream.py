"""Streaming ANN index maintenance — PQ-encode incoming vectors against a
static codebook (stream-static enrichment).

Net-new surface (the reference has no streaming, SURVEY.md §2.9). The
production shape of keeping a PQ index fresh: the codebook is trained by the
batch path (pipeline/similarity.py::sim_pq_topk's sample-initialized
codebook — a trained one would slot in identically), packed into ONE tiny
row (M*K subvectors = 1024 doubles here), and cross-joined onto the vector
stream as a broadcast. Encoding is then a PURE PER-ROW expression
(higher-order functions: subspace slice -> argmin over codebook entries), so
the stream stays STATELESS — no watermark, no state store, append output
mode; every micro-batch emits (vec_id, codes) rows ready to upsert into the
code table that sim_pq_topk's ADC scoring reads.

Parity: the argmin rounds squared distances to 6 dp and keeps the LOWEST
code_id on ties — exactly the batch encoder's min_by(struct(round(d2,6),
code_id)) — and the test pins streamed codes == batch codes row-for-row.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql.types import ArrayType, FloatType, LongType, StructField, StructType

from hyrise_spark.pipeline.similarity import (
    _PQ_ANCHOR_IDS,
    _PQ_M,
    _PQ_SUB,
    _dot,
    _normalize,
)

EMB_SCHEMA = StructType(
    [
        StructField("vec_id", LongType()),
        StructField("embedding", ArrayType(FloatType())),
        StructField("label", LongType()),
    ]
)


def read_embeddings_stream(spark: SparkSession, emb_dir: str) -> DataFrame:
    """File-source stream of embedding batches (parquet files in a dir)."""
    return spark.readStream.schema(EMB_SCHEMA).parquet(emb_dir)


def pq_codebook(spark: SparkSession, sf_dir: str) -> DataFrame:
    """STATIC single-row codebook frame: every (m, code_id, subvector) entry
    collected into one sorted array — the broadcastable form of the index's
    codebooks (1 KiB-scale; M*K*SUB doubles)."""
    from hyrise_spark.catalog import load_tables

    emb = load_tables(spark, sf_dir, ("embeddings",))["embeddings"]
    n = emb.select(
        "vec_id", _normalize(F.col("embedding").cast("array<double>")).alias("v")
    )
    sub = F.posexplode(
        F.transform(
            F.sequence(F.lit(0), F.lit(_PQ_M - 1)),
            lambda m: F.slice(F.col("v"), m * _PQ_SUB + 1, _PQ_SUB),
        )
    )
    entries = (
        n.filter(F.col("vec_id").isin(_PQ_ANCHOR_IDS))
        .withColumn(
            "code_id",
            (F.array_position(F.lit(sorted(_PQ_ANCHOR_IDS)), F.col("vec_id")) - 1).cast("int"),
        )
        .select("code_id", sub.alias("m", "asub"))
    )
    # array_sort over (m, code_id, asub) structs orders by m then code_id —
    # the ascending iteration order the tie-break below depends on.
    return entries.agg(
        F.array_sort(F.collect_list(F.struct("m", "code_id", "asub"))).alias("cb")
    )


def _d2(a: Column, b: Column) -> Column:
    diff = F.zip_with(a, b, lambda x, y: x - y)
    return _dot(diff, diff)


def pq_encoded_stream(vecs: DataFrame, codebook: DataFrame) -> DataFrame:
    """(vec_id, codes array<int>) per incoming vector. The codebook frame is
    one row -> broadcast cross join; the argmin runs inside codegen per row.
    Strict < over (rounded d2) with ascending code_id iteration == the batch
    encoder's min_by(struct(round(d2, 6), code_id)) tie-break."""
    v = _normalize(F.col("embedding").cast("array<double>"))
    with_cb = vecs.select("vec_id", v.alias("v")).crossJoin(F.broadcast(codebook))
    codes = F.transform(
        F.sequence(F.lit(0), F.lit(_PQ_M - 1)),
        lambda m: F.aggregate(
            F.filter(F.col("cb"), lambda e: e["m"] == m),
            F.struct(
                F.lit(-1).cast("int").alias("code"),
                F.lit(float("inf")).alias("best"),
            ),
            lambda acc, e: F.when(
                F.round(_d2(F.slice(F.col("v"), m * _PQ_SUB + 1, _PQ_SUB), e["asub"]), 6)
                < acc["best"],
                F.struct(
                    e["code_id"].alias("code"),
                    F.round(
                        _d2(F.slice(F.col("v"), m * _PQ_SUB + 1, _PQ_SUB), e["asub"]), 6
                    ).alias("best"),
                ),
            ).otherwise(acc),
            lambda acc: acc["code"],
        ),
    )
    return with_cb.select("vec_id", codes.alias("codes"))


def proto_centroids(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The batch prototype-pruning centroids (curate_prototype_prune's seed
    set) as ONE bounded broadcastable frame — the trained-model artifact a
    streaming prototypicality gate loads at setup."""
    from hyrise_spark.pipeline.similarity import _emb, _kmeans_seeds

    e = _emb(spark, sf_dir).select(
        "vec_id", F.col("embedding").cast("array<double>").alias("v")
    )
    return _kmeans_seeds(e)


def proto_gated_stream(vecs: DataFrame, centroids: DataFrame,
                       max_sim: float = 0.9) -> DataFrame:
    """Prototypicality gate (streaming sibling of curate_prototype_prune,
    Sorscher et al. 2022): DROP an incoming vector whose similarity to its
    nearest cluster centroid exceeds `max_sim` — the too-easy, redundant
    examples — and stream the informative tail on.

    The batch op prunes a per-cluster FRACTION (needs the whole cluster);
    the streaming form must decide per row, so it gates on an absolute
    prototypicality threshold — the same batch-trains/stream-applies split
    as the classifier and Bloom gates. Stateless narrow map over a bounded
    centroid broadcast (K rows): no state store, no watermark, and the
    argmax is an in-row reduce over K — never corpus x corpus."""
    v = _normalize(F.col("embedding").cast("array<double>"))
    packed = F.broadcast(
        centroids.groupBy().agg(
            F.collect_list(F.struct("cell", "cv")).alias("cents")
        )
    )
    best = F.aggregate(
        F.col("cents"),
        F.struct(F.lit(-1).cast("bigint").alias("cell"),
                 F.lit(float("-inf")).alias("sim")),
        lambda acc, c: F.when(
            _dot(F.col("v"), c["cv"]) > acc["sim"],
            F.struct(c["cell"].alias("cell"),
                     _dot(F.col("v"), c["cv"]).alias("sim")),
        ).otherwise(acc),
    )
    return (
        vecs.select("vec_id", v.alias("v"))
        .crossJoin(packed)
        .withColumn("best", best)
        .filter(F.col("best.sim") <= max_sim)
        .select(
            "vec_id",
            F.col("best.cell").cast("int").alias("cell"),
            F.round("best.sim", 4).alias("centroid_sim"),
        )
    )
