"""Behavior properties for the curation operators (pipeline/curate.py).
Value-level correctness is pinned by the DuckDB oracles (registry gate);
these tests pin the semantic properties the oracles can't express."""
from __future__ import annotations

import pandas as pd
import pytest

from hyrise_spark.pipeline.curate import (
    _CHUNK,
    _STRIDE,
    curate_chunk_documents,
    curate_contamination_check,
    curate_stratified_sample,
)

SF_DIR = "/root/testdata/sf0.001"


def test_chunks_cover_document_exactly(spark):
    """Concatenating each chunk's stride-sized prefix (plus the last chunk's
    tail) reconstructs the original token stream — no token lost, none
    duplicated beyond the declared overlap."""
    docs = {
        r.doc_id: r.text.strip().split()
        for r in spark.read.parquet(f"{SF_DIR}/documents.parquet")
        .filter("doc_id < 100")
        .collect()
    }
    chunks = curate_chunk_documents(spark, SF_DIR).collect()
    by_doc: dict[int, list] = {}
    for r in chunks:
        by_doc.setdefault(r.doc_id, []).append(r)
    for doc_id, rows in by_doc.items():
        rows.sort(key=lambda r: r.chunk_idx)
        rebuilt: list[str] = []
        for r in rows[:-1]:
            rebuilt.extend(r.chunk.split()[:_STRIDE])
        rebuilt.extend(rows[-1].chunk.split())
        assert rebuilt == docs[doc_id], doc_id
        for r in rows:
            assert r.n_tokens == len(r.chunk.split())
            assert r.n_tokens <= _CHUNK


def test_contamination_flags_planted_duplicate(spark, tmp_path):
    """A candidate doc that copies a benchmark doc's text verbatim must be
    flagged with at least (len - 4) shingle hits."""
    rows = spark.read.parquet(f"{SF_DIR}/documents.parquet").collect()
    bench_text = next(r.text for r in rows if r.doc_id == 3)
    planted = [
        {"doc_id": r.doc_id, "text": r.text, "lang": r.lang,
         "source": r.source, "n_chars": r.n_chars}
        for r in rows
    ]
    planted.append({"doc_id": 99991, "text": bench_text, "lang": "en",
                    "source": "srcX", "n_chars": len(bench_text)})
    spark.createDataFrame(pd.DataFrame(planted)).write.mode("overwrite").parquet(
        f"{tmp_path}/documents.parquet"
    )
    out = {r.doc_id: r.n_hits for r in
           curate_contamination_check(spark, str(tmp_path)).collect()}
    n_tokens = len(bench_text.strip().split())
    assert out.get(99991, 0) >= n_tokens - 4, out.get(99991)


def test_stratified_sample_is_deterministic_and_keeps_priority_stratum(spark):
    a = {r.doc_id for r in curate_stratified_sample(spark, SF_DIR).collect()}
    b = {r.doc_id for r in curate_stratified_sample(spark, SF_DIR).collect()}
    assert a == b  # hash sampling: no seed drift between runs
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    src0 = {r.doc_id for r in docs.filter("source = 'src0'").collect()}
    assert src0 <= a  # the priority stratum survives whole
    total = docs.count()
    # everything else sampled at ~3/16
    others = len(a - src0)
    others_total = total - len(src0)
    assert 0.05 < others / others_total < 0.4, (others, others_total)


def test_leakage_safe_split_never_straddles_clusters(spark):
    """THE invariant: every near-dup pair (the same pair graph the split is
    built from) lands on the same side of the split, and the split is
    deterministic across invocations."""
    import pyspark.sql.functions as F

    from hyrise_spark.pipeline.curate import curate_leakage_safe_split
    from hyrise_spark.pipeline.dedup import _ngram_jaccard_pairs

    split = curate_leakage_safe_split(spark, SF_DIR)
    rows = {r.doc_id: (r.canonical_id, r.split) for r in split.collect()}
    docs = (
        spark.read.parquet(f"{SF_DIR}/documents.parquet")
        .filter("doc_id < 300")
        .select("doc_id", F.split(F.trim(F.lower(F.col("text"))), r"\s+").alias("w"))
    )
    pairs = _ngram_jaccard_pairs(docs).select("d1", "d2").collect()
    assert pairs, "test corpus must contain near-dup pairs"
    for p in pairs:
        assert rows[p.d1][1] == rows[p.d2][1], (p.d1, p.d2)
        assert rows[p.d1][0] == rows[p.d2][0], (p.d1, p.d2)
    # both sides populated, deterministic rerun
    sides = {s for _, s in rows.values()}
    assert sides == {"train", "val"}, sides
    again = {r.doc_id: (r.canonical_id, r.split)
             for r in curate_leakage_safe_split(spark, SF_DIR).collect()}
    assert again == rows


def test_pack_sequences_partitions_corpus_exactly(spark):
    """Every document lands in exactly one pack; pack totals equal the sum
    of member token counts; spillover is bounded (a pack exceeds capacity
    only by its last straddling doc, so total < cap + max_doc_tokens); and
    per bucket the pack count is at most ceil(bucket_tokens / cap) — the
    cumulative-offset scheme wastes no capacity except each bucket's final
    partial pack."""
    import pyspark.sql.functions as F

    from hyrise_spark.pipeline.curate import (
        _PACK_BUCKETS,
        _PACK_CAP,
        _words,
        curate_pack_sequences,
    )

    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    n_docs = docs.count()
    toks = docs.select(
        "doc_id", F.least(F.size(_words()), F.lit(_PACK_CAP)).alias("n_tok")
    ).collect()
    n_tokens = sum(r.n_tok for r in toks)
    max_doc = max(r.n_tok for r in toks)
    packs = curate_pack_sequences(spark, SF_DIR).collect()
    assert sum(r.n_docs for r in packs) == n_docs
    assert sum(r.total_tokens for r in packs) == n_tokens
    by_bucket: dict[int, list] = {}
    for r in packs:
        assert r.total_tokens < _PACK_CAP + max_doc, r
        by_bucket.setdefault(r.pack_id >> 40, []).append(r)
    assert set(by_bucket) == set(range(_PACK_BUCKETS))
    for bucket, rows in by_bucket.items():
        bucket_tokens = sum(r.total_tokens for r in rows)
        max_packs = -(-bucket_tokens // _PACK_CAP)  # ceil
        assert len(rows) <= max_packs, (bucket, len(rows), max_packs)


def test_domain_mixture_hits_target_shares(spark):
    """Where a domain's rate is < 1, its sampled token mass must land near
    weight_d * budget (hash sampling is uniform); a rate of 1.0 means the
    domain was under-represented and keeps everything. Deterministic across
    invocations."""
    import pyspark.sql.functions as F

    from hyrise_spark.pipeline.curate import (
        _MIX_BUDGET_FRAC,
        _MIX_WEIGHTS,
        _words,
        curate_domain_mixture,
    )

    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    total_tokens = docs.select(F.sum(F.size(_words())).alias("t")).collect()[0].t
    budget = _MIX_BUDGET_FRAC * total_tokens
    out = curate_domain_mixture(spark, SF_DIR).collect()
    assert out, "mixture produced no rows"
    by_domain: dict[str, list] = {}
    for r in out:
        by_domain.setdefault(r.domain, []).append(r)
    assert set(by_domain) <= set(_MIX_WEIGHTS)
    for domain, rows in by_domain.items():
        rate = rows[0].rate
        assert all(r.rate == rate for r in rows)  # one rate per domain
        got_tokens = sum(r.n_tok for r in rows)
        if rate < 1.0:
            want = _MIX_WEIGHTS[domain] * budget
            # hash sampling over ~170 docs per domain: generous 40% tolerance
            assert 0.6 * want < got_tokens < 1.4 * want, (domain, got_tokens, want)
    again = curate_domain_mixture(spark, SF_DIR).collect()
    assert sorted(r.doc_id for r in again) == sorted(r.doc_id for r in out)


def test_diversity_bucket_cap_bounds_every_bucket(spark):
    """curate_diversity_bucket_cap: survivors per LSH bucket <= cap, every
    vector appears exactly once, and the cap actually bites somewhere (a
    dense bucket exists at this SF)."""
    import pyspark.sql.functions as F

    from hyrise_spark.pipeline.curate import (
        _DIVERSITY_CAP,
        curate_diversity_bucket_cap,
    )
    from hyrise_spark.pipeline.similarity import _bucket_spark

    out = curate_diversity_bucket_cap(spark, SF_DIR)
    emb = spark.read.parquet(f"{SF_DIR}/embeddings.parquet")
    assert out.count() == emb.count()
    sig = emb.select("vec_id", _bucket_spark(F.col("embedding").cast("array<double>")).alias("bucket"))
    per_bucket = (
        out.filter("kept").join(sig, "vec_id").groupBy("bucket").count().collect()
    )
    assert per_bucket and all(r["count"] <= _DIVERSITY_CAP for r in per_bucket)
    assert out.filter(~F.col("kept")).count() > 0  # the cap did real work
