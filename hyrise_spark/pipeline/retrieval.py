"""Full-text retrieval over the `documents` table: inverted-index build and
BM25 top-k search.

Net-new Spark-first capabilities (the reference has no text/retrieval
operators, SURVEY.md §2.9) — the retrieval half of a training-data pipeline:
an inverted index powers corpus search/decontamination lookups, and BM25
scoring is the standard lexical ranker behind retrieval-based quality
filtering and near-duplicate triage.

Design for 100 TB:
  * Tokenization is a narrow per-document map (split + explode built-ins,
    whole-stage codegen); `tf` partial-aggregates map-side on
    (doc_id, term) before the one shuffle on term.
  * The inverted index caps posting lists with a TWO-STAGE min-k (bucket
    row_number, then a final rank over <= 16*k survivors per term) — no
    single task ever sorts a full posting list of a ubiquitous term. At
    production scale the cap IS the sharding strategy: posting lists are
    stored in bounded shards, and df/total_tf come from a separate
    partial-agg pass, not from materializing the full list.
  * BM25 candidates come from a semi-join of the tf table against the
    (literal, statically bounded) query-term frame — only documents sharing
    a term are ever scored; the corpus is never scanned per query.
  * Top-k per query uses the same two-stage pattern (per-bucket top-k, then
    a final rank over <= 16*k rows per query), so no global sort and no
    single-task window even when one query matches most of the corpus.
  * Scoring stays on an exact-integer lattice (scaled integer division,
    k1 = 6/5 and b = 3/4 folded into integer ratios) so Spark and DuckDB
    agree bit-for-bit with no libm/float-summation dependence. A production
    deployment at 10^10+ docs would switch the IDF to double log-space to
    stay inside int64 — the lattice is the testable contract, the plan
    shape is the scale story.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession, Window

from hyrise_spark.catalog import load_tables
from hyrise_spark.registry import register


def _docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    return load_tables(spark, sf_dir, ("documents",))["documents"]


def _toks(docs: DataFrame) -> DataFrame:
    return docs.select(
        "doc_id",
        F.explode(F.split(F.trim(F.lower(F.col("text"))), r"\s+")).alias("term"),
    )


_TOKS_SQL = """
    SELECT doc_id, unnest(string_split_regex(trim(lower(text)), '\\s+')) AS term
    FROM documents
"""

# ---------------------------------------------------------------------------
# Inverted index: term -> (df, total_tf, first `_POSTING_CAP` doc_ids).
# The posting-list cap is exact min-k, computed in two bounded stages.

_POSTING_CAP = 8
_BUCKETS = 16


@register(
    "text_inverted_index",
    oracle=f"""
    WITH toks AS ({_TOKS_SQL}),
    tf AS (
      SELECT doc_id, term, CAST(COUNT(*) AS BIGINT) AS tf
      FROM toks GROUP BY doc_id, term
    )
    SELECT term,
           CAST(COUNT(*) AS BIGINT) AS df,
           CAST(SUM(tf) AS BIGINT) AS total_tf,
           array_to_string(list_slice(list(doc_id ORDER BY doc_id),
                                      1, {_POSTING_CAP}), ',') AS postings
    FROM tf
    GROUP BY term
    """,
    tags=("text", "retrieval"),
)
def text_inverted_index(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Inverted index over `documents`: per term, document frequency, total
    term frequency, and the first `_POSTING_CAP` doc_ids (ascending) as a
    comma-joined posting shard.

    Scale: df/total_tf is one partial-agg groupBy on term. The posting shard
    is exact min-k via two stages — stage 1 ranks within
    (term, doc_id % `_BUCKETS`) buckets and keeps <= `_POSTING_CAP` per
    bucket (the global min-k has at most k members in any bucket, so this
    drops nothing), stage 2 ranks <= `_BUCKETS * _POSTING_CAP` survivors per
    term. No window ever sees a full posting list.
    """
    tf = (
        _toks(_docs(spark, sf_dir))
        .groupBy("doc_id", "term")
        .agg(F.count(F.lit(1)).alias("tf"))
    )
    stats = tf.groupBy("term").agg(
        F.count(F.lit(1)).alias("df"),
        F.sum("tf").alias("total_tf"),
    )
    w1 = Window.partitionBy("term", F.pmod("doc_id", F.lit(_BUCKETS))).orderBy(
        "doc_id"
    )
    w2 = Window.partitionBy("term").orderBy("doc_id")
    shard = (
        tf.withColumn("r1", F.row_number().over(w1))
        .filter(F.col("r1") <= _POSTING_CAP)
        .withColumn("r2", F.row_number().over(w2))
        .filter(F.col("r2") <= _POSTING_CAP)
        .groupBy("term")
        .agg(
            F.array_join(F.sort_array(F.collect_list("doc_id")), ",").alias(
                "postings"
            )
        )
    )
    return stats.join(shard, "term").select("term", "df", "total_tf", "postings")


# ---------------------------------------------------------------------------
# BM25 top-k retrieval. k1 = 6/5, b = 3/4; with N docs, T total tokens,
# per-doc length dl, the per-term score
#     idf * tf*(k1+1) / (tf + k1*((1-b) + b*dl/avgdl))        (avgdl = T/N)
# multiplied through by 20*T (integer) becomes
#     idf * tf * 44 * T   /   (20*T*tf + 6*T + 18*dl*N)
# with idf = (N*1000) div df — every operand a BIGINT, so the final
# (num * 1000) div den is the same integer in Spark and DuckDB.

_BM25_TOPK = 5

_QUERIES = (
    (1, ("hash", "join", "merge")),
    (2, ("window", "sort", "stream")),
    (3, ("dup", "vector", "scan")),
)

_QUERY_ROWS_SQL = " UNION ALL ".join(
    f"SELECT {qid} AS query_id, '{t}' AS term" for qid, terms in _QUERIES for t in terms
)


@register(
    "text_bm25_topk",
    oracle=f"""
    WITH toks AS ({_TOKS_SQL}),
    tf AS (
      SELECT doc_id, term, CAST(COUNT(*) AS BIGINT) AS tf
      FROM toks GROUP BY doc_id, term
    ),
    dl AS (
      SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS dl FROM toks GROUP BY doc_id
    ),
    df AS (
      SELECT term, CAST(COUNT(*) AS BIGINT) AS df FROM tf GROUP BY term
    ),
    corpus AS (
      SELECT CAST(COUNT(*) AS BIGINT) AS n_docs,
             CAST(SUM(dl) AS BIGINT) AS total_tokens
      FROM dl
    ),
    qterms AS ({_QUERY_ROWS_SQL}),
    term_scores AS (
      SELECT q.query_id, tf.doc_id,
             (((n.n_docs * 1000) // df.df) * tf.tf * 44 * n.total_tokens * 1000)
               // (20 * n.total_tokens * tf.tf + 6 * n.total_tokens
                   + 18 * dl.dl * n.n_docs) AS term_score
      FROM qterms q
      JOIN tf ON tf.term = q.term
      JOIN df ON df.term = q.term
      JOIN dl ON dl.doc_id = tf.doc_id
      CROSS JOIN corpus n
    ),
    scored AS (
      SELECT query_id, doc_id, CAST(SUM(term_score) AS BIGINT) AS score
      FROM term_scores GROUP BY query_id, doc_id
    )
    SELECT CAST(query_id AS INTEGER) AS query_id, doc_id, score,
           CAST(rnk AS INTEGER) AS rnk
    FROM (
      SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id
                                   ORDER BY score DESC, doc_id) AS rnk
      FROM scored
    )
    WHERE rnk <= {_BM25_TOPK}
    """,
    tags=("text", "retrieval"),
)
def text_bm25_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BM25 top-`_BM25_TOPK` documents for each of a literal query set, on an
    exact-integer lattice (see module docstring for the derivation).

    Scale: the query-term frame is a statically bounded literal
    (broadcast by construction); candidates are the semi-join of the
    (doc_id, term) tf table against it, so only documents sharing a query
    term are scored. dl joins back on doc_id (partial-agg upstream), the
    corpus stats are a one-row scalar aggregate. Final top-k per query is
    two-stage — per-(query, doc_id % `_BUCKETS`) bucket top-k, then a rank
    over <= `_BUCKETS * k` survivors — so a query matching most of the
    corpus still never funnels into one sort task.
    """
    scored = _bm25_scored(spark, sf_dir)
    return _two_stage_topk(
        scored, [F.col("score").desc(), F.col("doc_id")], _BM25_TOPK
    ).select(
        F.col("query_id").cast("int").alias("query_id"),
        "doc_id",
        F.col("score").cast("long").alias("score"),
        F.col("rnk").cast("int").alias("rnk"),
    )


def _two_stage_topk(df: DataFrame, order_cols, k: int, rank_name: str = "rnk") -> DataFrame:
    """Exact per-query top-k without a single-task window: stage 1 ranks
    within (query_id, doc_id % _BUCKETS) buckets and cuts to k — lossless,
    the global top-k has at most k members in any bucket — then stage 2
    ranks <= _BUCKETS*k survivors per query. Shared by the BM25 and RRF
    rankers so both inherit the bounded-window shape."""
    w1 = Window.partitionBy("query_id", F.pmod("doc_id", F.lit(_BUCKETS))).orderBy(
        *order_cols
    )
    w2 = Window.partitionBy("query_id").orderBy(*order_cols)
    return (
        df.withColumn("_r1", F.row_number().over(w1))
        .filter(F.col("_r1") <= k)
        .withColumn(rank_name, F.row_number().over(w2))
        .filter(F.col(rank_name) <= k)
        .drop("_r1")
    )


def _qterms(spark: SparkSession) -> DataFrame:
    return spark.createDataFrame(
        [(qid, t) for qid, terms in _QUERIES for t in terms],
        "query_id int, term string",
    )


def _tf(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Materialized once per invocation (lazy localCheckpoint): the tf index
    # is the hub frame — candidate join, document-frequency agg and
    # document-length agg all derive from it, and without the checkpoint
    # each consumer re-runs the tokenize + explode + groupBy pass.
    return (
        _toks(_docs(spark, sf_dir))
        .groupBy("doc_id", "term")
        .agg(F.count(F.lit(1)).alias("tf"))
        .localCheckpoint(eager=False)
    )


def _bm25_scored(
    spark: SparkSession, sf_dir: str, tf: DataFrame | None = None
) -> DataFrame:
    """(query_id, doc_id, score): the exact-integer BM25 candidate scoring
    shared by text_bm25_topk and the RRF fusion. Pass a prebuilt `tf` so a
    caller that also needs the (doc_id, term, tf) frame tokenizes the
    corpus once, not twice."""
    if tf is None:
        tf = _tf(spark, sf_dir)
    # dl derives from tf (sum of per-term counts == token count — same
    # value as counting the exploded tokens), so the corpus is tokenized
    # exactly once instead of once per aggregate.
    dl = tf.groupBy("doc_id").agg(F.sum("tf").alias("dl"))
    df = tf.groupBy("term").agg(F.count(F.lit(1)).alias("df"))
    corpus = dl.agg(
        F.count(F.lit(1)).alias("n_docs"), F.sum("dl").alias("total_tokens")
    )
    term_scores = (
        F.broadcast(_qterms(spark))  # literal frame: statically bounded
        .join(tf, "term")
        .join(df, "term")
        .join(dl, "doc_id")
        .crossJoin(F.broadcast(corpus))  # scalar aggregate: one row
        .withColumn(
            "term_score",
            F.expr(
                "(((n_docs * 1000) div df) * tf * 44 * total_tokens * 1000)"
                " div (20 * total_tokens * tf + 6 * total_tokens"
                "      + 18 * dl * n_docs)"
            ),
        )
    )
    return term_scores.groupBy("query_id", "doc_id").agg(
        F.sum("term_score").alias("score")
    )


# ---------------------------------------------------------------------------
# Reciprocal-rank fusion (Cormack et al. 2009): combine per-query rankings
# from independent retrievers by summing 1/(K + rank). The standard way to
# fuse lexical + semantic retrieval without score calibration — only RANKS
# cross the fusion boundary, so heterogeneous scorers compose. On the
# integer lattice 1/(K+r) becomes RRF_SCALE // (K + r): exact in both
# engines.

_RRF_K = 60       # the canonical smoothing constant from the paper
_RRF_POOL = 10    # fuse each ranker's top-10 list
_RRF_SCALE = 1_000_000
_RRF_TOPK = 5


@register(
    "text_rrf_fusion",
    oracle=f"""
    WITH toks AS ({_TOKS_SQL}),
    tf AS (
      SELECT doc_id, term, CAST(COUNT(*) AS BIGINT) AS tf
      FROM toks GROUP BY doc_id, term
    ),
    dl AS (
      SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS dl FROM toks GROUP BY doc_id
    ),
    df AS (
      SELECT term, CAST(COUNT(*) AS BIGINT) AS df FROM tf GROUP BY term
    ),
    corpus AS (
      SELECT CAST(COUNT(*) AS BIGINT) AS n_docs,
             CAST(SUM(dl) AS BIGINT) AS total_tokens
      FROM dl
    ),
    qterms AS ({_QUERY_ROWS_SQL}),
    cand AS (
      SELECT q.query_id, tf.doc_id, tf.tf, q.term
      FROM qterms q JOIN tf ON tf.term = q.term
    ),
    bm25 AS (
      SELECT query_id, doc_id, CAST(SUM(term_score) AS BIGINT) AS score
      FROM (
        SELECT c.query_id, c.doc_id,
               (((n.n_docs * 1000) // df.df) * c.tf * 44 * n.total_tokens * 1000)
                 // (20 * n.total_tokens * c.tf + 6 * n.total_tokens
                     + 18 * dl.dl * n.n_docs) AS term_score
        FROM cand c
        JOIN df ON df.term = c.term
        JOIN dl ON dl.doc_id = c.doc_id
        CROSS JOIN corpus n
      ) GROUP BY query_id, doc_id
    ),
    r1 AS (
      SELECT query_id, doc_id,
             ROW_NUMBER() OVER (PARTITION BY query_id
                                ORDER BY score DESC, doc_id) AS r
      FROM bm25
    ),
    cov AS (
      SELECT query_id, doc_id,
             CAST(COUNT(DISTINCT term) AS BIGINT) AS cov,
             CAST(SUM(tf) AS BIGINT) AS tfsum
      FROM cand GROUP BY query_id, doc_id
    ),
    r2 AS (
      SELECT query_id, doc_id,
             ROW_NUMBER() OVER (PARTITION BY query_id
                                ORDER BY cov DESC, tfsum DESC, doc_id) AS r
      FROM cov
    ),
    fused AS (
      SELECT COALESCE(a.query_id, b.query_id) AS query_id,
             COALESCE(a.doc_id, b.doc_id) AS doc_id,
             COALESCE({_RRF_SCALE} // ({_RRF_K} + a.r), 0)
               + COALESCE({_RRF_SCALE} // ({_RRF_K} + b.r), 0) AS rrf
      FROM (SELECT * FROM r1 WHERE r <= {_RRF_POOL}) a
      FULL JOIN (SELECT * FROM r2 WHERE r <= {_RRF_POOL}) b
        ON a.query_id = b.query_id AND a.doc_id = b.doc_id
    )
    SELECT CAST(query_id AS INTEGER) AS query_id, doc_id,
           CAST(rrf AS BIGINT) AS rrf_score, CAST(rnk AS INTEGER) AS rnk
    FROM (
      SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id
                                   ORDER BY rrf DESC, doc_id) AS rnk
      FROM fused
    )
    WHERE rnk <= {_RRF_TOPK}
    """,
    tags=("text", "retrieval", "fusion"),
)
def text_rrf_fusion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fuse two independent retrievers per query — BM25 and a
    coverage-then-frequency ranker (proxy for the semantic leg: rank-only
    fusion makes the second ranker swappable for an ANN ranking without
    touching this plan) — via reciprocal-rank fusion on an integer lattice.

    Scale: both rankers score only semi-join candidates; both rank lists
    are cut to a bounded pool (top-{_RRF_POOL}) with the shared two-stage
    window before the fusion join, so the full-outer fusion join touches
    <= 2*{_RRF_POOL} rows per query, and the final top-k re-ranks a
    <= 2*{_RRF_POOL}-row frame per query."""
    tf = _tf(spark, sf_dir)
    cand = F.broadcast(_qterms(spark)).join(tf, "term")

    r1 = _two_stage_topk(
        _bm25_scored(spark, sf_dir, tf=tf),
        [F.col("score").desc(), F.col("doc_id")],
        _RRF_POOL,
        rank_name="r",
    ).select("query_id", "doc_id", "r")
    cov = cand.groupBy("query_id", "doc_id").agg(
        F.count_distinct("term").alias("cov"), F.sum("tf").alias("tfsum")
    )
    r2 = _two_stage_topk(
        cov,
        [F.col("cov").desc(), F.col("tfsum").desc(), F.col("doc_id")],
        _RRF_POOL,
        rank_name="r",
    ).select("query_id", "doc_id", "r")

    a = r1.select(
        F.col("query_id").alias("qa"), F.col("doc_id").alias("da"), F.col("r").alias("ra")
    )
    b = r2.select(
        F.col("query_id").alias("qb"), F.col("doc_id").alias("db"), F.col("r").alias("rb")
    )
    fused = a.join(
        b, (F.col("qa") == F.col("qb")) & (F.col("da") == F.col("db")), "full_outer"
    ).select(
        F.coalesce("qa", "qb").alias("query_id"),
        F.coalesce("da", "db").alias("doc_id"),
        (
            F.coalesce(F.expr(f"{_RRF_SCALE} div ({_RRF_K} + ra)"), F.lit(0))
            + F.coalesce(F.expr(f"{_RRF_SCALE} div ({_RRF_K} + rb)"), F.lit(0))
        ).alias("rrf"),
    )
    return _two_stage_topk(
        fused, [F.col("rrf").desc(), F.col("doc_id")], _RRF_TOPK
    ).select(
        F.col("query_id").cast("int").alias("query_id"),
        "doc_id",
        F.col("rrf").cast("long").alias("rrf_score"),
        F.col("rnk").cast("int").alias("rnk"),
    )
