"""Structured Streaming document curation — the pipeline/curate.py +
pipeline/text.py operators as streams.

Net-new surface (the reference has no streaming, SURVEY.md §2.9). The same
JVM-side expressions as the batch operators, expressed over a file-source
document stream: ingest -> quality scoring (narrow map, stateless) ->
contamination tagging (5-gram shingles stream-static-semi-joined against a
STATIC benchmark shingle set) -> sink. Tests run availableNow=True and
compare with the batch plans — the streaming/batch parity check.

Scale notes: quality scoring is stateless (no watermark, no state store);
contamination keeps only the seen-doc_id dedup state, and the benchmark
shingle set is static + broadcast (eval suites are small; the corpus
streams). At production the file source swaps for Kafka unchanged.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.types import LongType, StringType, StructField, StructType

from hyrise_spark.pipeline.curate import _NGRAM, _words, shingle_expr

DOCS_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("text", StringType()),
        StructField("lang", StringType()),
        StructField("source", StringType()),
        StructField("n_chars", LongType()),
    ]
)


def read_documents_stream(spark: SparkSession, docs_dir: str) -> DataFrame:
    """File-source stream of document batches (parquet files in a dir)."""
    return spark.readStream.schema(DOCS_SCHEMA).parquet(docs_dir)


def _quality_cols(df: DataFrame) -> DataFrame:
    words = _words()  # the batch tokenizer — parity by construction
    punct = F.length(F.regexp_replace(F.col("text"), r"[a-zA-Z0-9\s]", ""))
    return df.select(
        "doc_id",
        "source",
        F.size(words).alias("ws_tokens"),
        F.round(punct / F.greatest(F.length("text"), F.lit(1)), 4).alias("punct_ratio"),
    )


def quality_scored_stream(docs: DataFrame, min_tokens: int = 10,
                          max_punct_ratio: float = 0.2) -> DataFrame:
    """Stateless per-document quality scoring + keep filter — identical
    expressions to the batch path, so a streaming deployment curates with
    the same semantics the batch backfill used."""
    scored = _quality_cols(docs)
    return scored.withColumn(
        "keep",
        (F.col("ws_tokens") >= min_tokens) & (F.col("punct_ratio") <= max_punct_ratio),
    )


def _shingles(df: DataFrame) -> DataFrame:
    # identical expressions to curate_contamination_check — imported, not
    # copied, so batch/streaming parity cannot drift
    return (
        df.select("doc_id", _words(lower=True).alias("w"))
        .filter(F.size("w") >= _NGRAM)
        .select("doc_id", F.explode(shingle_expr(F.col("w"))).alias("sh"))
    )


def benchmark_shingles(bench_docs: DataFrame) -> DataFrame:
    """STATIC benchmark shingle set (distinct 5-grams of the eval docs)."""
    return _shingles(bench_docs).select("sh").distinct()


def contaminated_ids_stream(docs: DataFrame, bench: DataFrame) -> DataFrame:
    """Doc ids in the stream sharing any 5-gram with the static benchmark
    set: shingle explode -> stream-static LEFT SEMI join (static side
    broadcast) -> per-doc dedup. State = seen contaminated ids only."""
    return (
        _shingles(docs)
        .join(F.broadcast(bench), "sh", "left_semi")
        .select("doc_id")
        .dropDuplicates(["doc_id"])
    )


def mixture_rates(spark: SparkSession, sf_dir: str) -> DataFrame:
    """STATIC per-domain acceptance-rate frame — the batch
    curate_domain_mixture rate computation (pipeline/curate.py), reused so
    streamed and batch sampling decide identically."""
    from hyrise_spark.pipeline.curate import (
        _MIX_BUDGET_FRAC,
        _docs,
        _mix_domain,
        _words,
    )

    docs = _docs(spark, sf_dir)
    d = docs.select(_mix_domain().alias("domain"), F.size(_words()).alias("n_tok"))
    dom = d.groupBy("domain").agg(F.sum("n_tok").cast("long").alias("d_tok"))
    tot = d.agg(F.sum("n_tok").cast("long").alias("t_tok"))
    weight = (
        F.when(F.col("domain") == "web", 0.5)
        .when(F.col("domain") == "books", 0.3)
        .otherwise(0.2)
    )
    return dom.crossJoin(F.broadcast(tot)).select(
        "domain",
        F.least(
            F.lit(1.0), weight * _MIX_BUDGET_FRAC * F.col("t_tok") / F.col("d_tok")
        ).alias("rate"),
    )


def mixture_sampled_stream(docs: DataFrame, rates: DataFrame) -> DataFrame:
    """Streamed domain-mixture application: rates are computed ONCE by the
    batch pass over the reference corpus (the frame above), broadcast into
    the document stream, and each arriving doc keeps/drops itself by the
    same md5(doc_id) decision the batch op uses — stateless, append mode,
    and a doc admitted by the stream is exactly a doc the batch op would
    admit (pinned by the parity test)."""
    from hyrise_spark.pipeline.curate import _mix_domain, _words

    domain = _mix_domain()

    accept = (
        F.conv(F.substring(F.md5(F.col("doc_id").cast("string")), 1, 4), 16, 10)
        .cast("double") / 65536.0
    )
    return (
        docs.select(
            "doc_id", domain.alias("domain"), F.size(_words()).alias("n_tok")
        )
        .join(F.broadcast(rates), "domain")
        .filter(accept < F.col("rate"))
        .select("doc_id", "domain", "n_tok", F.round("rate", 4).alias("rate"))
    )


def classifier_gated_stream(docs: DataFrame) -> DataFrame:
    """The hashed-linear quality classifier as a streaming gate: stateless
    narrow map (no watermark, no state store), bit-identical expressions to
    the batch `text_quality_classifier` by construction — the streaming
    deployment admits exactly the documents the batch backfill would."""
    from hyrise_spark.pipeline.text import classifier_select

    return classifier_select(docs)


def bloom_gated_stream(docs: DataFrame, prev_bits: list) -> DataFrame:
    """Cross-corpus Bloom dedup as a streaming gate: `prev_bits` is the
    previous crawl's set bit positions (constant-size, <= 4032 values —
    the batch dedup_bloom_crosscorpus bitset, collected ONCE at stream
    setup; a bounded filter artifact like a broadcast model, not per-batch
    driver work). A doc is DROPPED when every one of its k fingerprint bits
    is already set (probably-seen); survivors stream on. Stateless narrow
    map — no join, no state store, no watermark: the filter itself carries
    the history, which is exactly why Bloom gating is the incremental-dedup
    shape at 100 TB (Catalyst compiles the IN-list to an O(1) hash-set
    probe). Parity with the batch flags is pinned in tests."""
    from hyrise_spark.pipeline.dedup import _XB_HASHES, _xb_bit

    positions = [int(b) for b in prev_bits]
    seen_all = None
    for i in range(_XB_HASHES):
        hit = _xb_bit(i).isin(positions)
        seen_all = hit if seen_all is None else (seen_all & hit)
    # NULL text -> NULL bits -> NULL membership; the batch op keeps such
    # docs unflagged (NULL bits never equi-join), so the gate must too
    return docs.filter(~F.coalesce(seen_all, F.lit(False))).select(
        "doc_id", "source"
    )


def lsh_gated_stream(docs: DataFrame, prev_bits: list) -> DataFrame:
    """Near-dup dedup as a streaming gate: `prev_bits` is the previous
    crawl's LSH band-key Bloom bitset (constant-size, <= 4032 positions —
    `dedup.lsh_band_bloom_positions`, collected ONCE at stream setup). An
    incoming doc is DROPPED when ANY of its band keys is probably-seen
    (all k bits set) — MinHash-level NEAR duplicates, not just exact
    fingerprints, with Bloom's one-sided error (false drops possible at
    the filter's FP rate, never false keeps of a banded near-dup).
    Stateless narrow map: the whole signature + band + membership check is
    higher-order functions over the in-row token array — no explode, no
    join, no state store. The incremental near-dedup shape at 100 TB."""
    from hyrise_spark.pipeline.dedup import _XB_HASHES, _lshb_bit, with_band_keys

    positions = [int(b) for b in prev_bits]
    toks = with_band_keys(
        docs.withColumn("w", F.split(F.trim(F.lower(F.col("text"))), r"\s+"))
    )

    def key_seen(k):
        seen = _lshb_bit(k, 0).isin(positions)
        for i in range(1, _XB_HASHES):
            seen = seen & _lshb_bit(k, i).isin(positions)
        return seen

    suspect = F.exists(F.col("band_keys"), key_seen)
    return toks.filter(~F.coalesce(suspect, F.lit(False))).select(
        "doc_id", "source"
    )


def temperature_rates(spark: SparkSession, sf_dir: str) -> DataFrame:
    """STATIC per-language alpha=0.5 temperature rates — the batch
    curate_temperature_mixture rate computation (pipeline/curate.py),
    reused so streamed and batch sampling decide identically (same sqrt
    integer lattice, same budget)."""
    from hyrise_spark.pipeline.curate import (
        _TEMP_BUDGET_FRAC,
        _docs,
        _words,
    )

    docs = _docs(spark, sf_dir)
    d = docs.select("lang", F.size(_words()).alias("n_tok"))
    dom = d.groupBy("lang").agg(
        F.sum("n_tok").cast("long").alias("d_tok"),
        F.floor(F.sqrt(F.sum("n_tok").cast("long")) * 1000000)
        .cast("long")
        .alias("s_tok"),
    )
    tot = dom.agg(
        F.sum("d_tok").cast("long").alias("t_tok"),
        F.sum("s_tok").cast("long").alias("s_all"),
    )
    return dom.crossJoin(F.broadcast(tot)).select(
        "lang",
        F.least(
            F.lit(1.0),
            F.lit(_TEMP_BUDGET_FRAC)
            * (F.col("s_tok").cast("double") / F.col("s_all"))
            * F.col("t_tok")
            / F.col("d_tok"),
        ).alias("rate"),
    )


def temperature_sampled_stream(docs: DataFrame, rates: DataFrame) -> DataFrame:
    """Streamed alpha-temperature language resampling: the language-sized
    rate frame is computed ONCE by the batch profile pass and broadcast
    into the stream; each arriving doc keeps/drops itself by the same
    integer md5 threshold the batch op uses — stateless, append mode,
    admit-iff-batch-admits (pinned by the parity test)."""
    from hyrise_spark.pipeline.curate import _words

    accept16 = F.conv(
        F.substring(F.md5(F.col("doc_id").cast("string")), 1, 4), 16, 10
    ).cast("int")
    return (
        docs.select("doc_id", "lang", F.size(_words()).alias("n_tok"))
        .join(F.broadcast(rates), "lang")
        .filter(accept16 < F.floor(F.col("rate") * 65536).cast("int"))
        .select("doc_id", "lang", "n_tok", F.round("rate", 4).alias("rate"))
    )
