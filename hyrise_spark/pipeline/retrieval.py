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
    two-stage — per-(query, doc_id%{_BUCKETS}) bucket top-k, then a rank
    over <= {_BUCKETS}*k survivors — so a query matching most of the corpus
    still never funnels into one sort task.
    """
    toks = _toks(_docs(spark, sf_dir))
    tf = toks.groupBy("doc_id", "term").agg(F.count(F.lit(1)).alias("tf"))
    dl = toks.groupBy("doc_id").agg(F.count(F.lit(1)).alias("dl"))
    df = tf.groupBy("term").agg(F.count(F.lit(1)).alias("df"))
    corpus = dl.agg(
        F.count(F.lit(1)).alias("n_docs"), F.sum("dl").alias("total_tokens")
    )
    qterms = spark.createDataFrame(
        [(qid, t) for qid, terms in _QUERIES for t in terms],
        "query_id int, term string",
    )
    term_scores = (
        F.broadcast(qterms)  # literal frame: statically bounded
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
    scored = term_scores.groupBy("query_id", "doc_id").agg(
        F.sum("term_score").alias("score")
    )
    w1 = Window.partitionBy("query_id", F.pmod("doc_id", F.lit(_BUCKETS))).orderBy(
        F.col("score").desc(), "doc_id"
    )
    w2 = Window.partitionBy("query_id").orderBy(F.col("score").desc(), "doc_id")
    return (
        scored.withColumn("r1", F.row_number().over(w1))
        .filter(F.col("r1") <= _BM25_TOPK)
        .withColumn("rnk", F.row_number().over(w2))
        .filter(F.col("rnk") <= _BM25_TOPK)
        .select(
            F.col("query_id").cast("int").alias("query_id"),
            "doc_id",
            F.col("score").cast("long").alias("score"),
            F.col("rnk").cast("int").alias("rnk"),
        )
    )
