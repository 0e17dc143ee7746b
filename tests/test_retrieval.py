"""Inverted index + BM25 retrieval (pipeline/retrieval.py).

The DuckDB differential (tools/check_oracle.py / test_queries_oracle) pins
exact values; these tests pin the retrieval SEMANTICS — ranking behavior,
posting-shard exactness, and the two-stage top-k being lossless.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import Window

from hyrise_spark.pipeline.retrieval import (
    _BM25_TOPK,
    _POSTING_CAP,
    _docs,
    _toks,
    text_bm25_topk,
    text_inverted_index,
)
from tests.conftest import SF_DIR


def test_inverted_index_postings_are_exact_min_k(spark):
    """The two-stage min-k posting shard equals the naive `first k ascending
    doc_ids` for every term, and df/total_tf match a direct aggregation."""
    idx = {r.term: r for r in text_inverted_index(spark, SF_DIR).collect()}
    tf = (
        _toks(_docs(spark, SF_DIR))
        .groupBy("doc_id", "term")
        .agg(F.count(F.lit(1)).alias("tf"))
    )
    naive = (
        tf.groupBy("term")
        .agg(
            F.count(F.lit(1)).alias("df"),
            F.sum("tf").alias("total_tf"),
            F.sort_array(F.collect_list("doc_id")).alias("all_docs"),
        )
        .collect()
    )
    assert idx and len(naive) == len(idx)
    for r in naive:
        got = idx[r.term]
        assert got.df == r.df and got.total_tf == r.total_tf
        want = ",".join(str(d) for d in r.all_docs[:_POSTING_CAP])
        assert got.postings == want, r.term


def test_bm25_rare_term_dominates_ranking(spark):
    """Query 3 contains the one rare term ('dup', df ~5% of the corpus):
    every top-ranked document for that query must actually contain it —
    the IDF surrogate has to reward rarity over the ubiquitous terms."""
    top = text_bm25_topk(spark, SF_DIR).filter(F.col("query_id") == 3).collect()
    assert len(top) == _BM25_TOPK
    dup_docs = {
        r.doc_id
        for r in _toks(_docs(spark, SF_DIR)).filter(F.col("term") == "dup").collect()
    }
    assert dup_docs, "fixture drift: no 'dup' docs at this SF"
    assert all(r.doc_id in dup_docs for r in top)


def test_bm25_two_stage_topk_is_lossless(spark):
    """The bucketed two-stage top-k returns exactly the rows a single global
    ranking window would — the stage-1 cut can never drop a true top-k row."""
    got = {
        (r.query_id, r.doc_id, r.score, r.rnk)
        for r in text_bm25_topk(spark, SF_DIR).collect()
    }
    # Recompute scores, then rank with ONE window (the naive shape).
    toks = _toks(_docs(spark, SF_DIR))
    tf = toks.groupBy("doc_id", "term").agg(F.count(F.lit(1)).alias("tf"))
    dl = toks.groupBy("doc_id").agg(F.count(F.lit(1)).alias("dl"))
    df = tf.groupBy("term").agg(F.count(F.lit(1)).alias("df"))
    corpus = dl.agg(
        F.count(F.lit(1)).alias("n_docs"), F.sum("dl").alias("total_tokens")
    )
    from hyrise_spark.pipeline.retrieval import _QUERIES

    qterms = spark.createDataFrame(
        [(qid, t) for qid, terms in _QUERIES for t in terms],
        "query_id int, term string",
    )
    scored = (
        qterms.join(tf, "term")
        .join(df, "term")
        .join(dl, "doc_id")
        .crossJoin(corpus)
        .withColumn(
            "term_score",
            F.expr(
                "(((n_docs * 1000) div df) * tf * 44 * total_tokens * 1000)"
                " div (20 * total_tokens * tf + 6 * total_tokens"
                "      + 18 * dl * n_docs)"
            ),
        )
        .groupBy("query_id", "doc_id")
        .agg(F.sum("term_score").alias("score"))
    )
    w = Window.partitionBy("query_id").orderBy(F.col("score").desc(), "doc_id")
    naive = {
        (r.query_id, r.doc_id, r.score, r.rnk)
        for r in scored.withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= _BM25_TOPK)
        .collect()
    }
    assert got == naive
