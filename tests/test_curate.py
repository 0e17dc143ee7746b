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
