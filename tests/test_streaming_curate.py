"""Streaming/batch parity for the document-curation streams
(streaming/curate_stream.py): the streamed quality scores and
contamination tags must equal the batch operators' output."""
from __future__ import annotations

import pytest

from hyrise_spark.streaming.curate_stream import (
    benchmark_shingles,
    contaminated_ids_stream,
    quality_scored_stream,
    read_documents_stream,
)
from hyrise_spark.streaming.events_stream import run_to_completion
from tests.conftest import SF_DIR


@pytest.fixture(scope="module")
def docs_dir(tmp_path_factory):
    import pyarrow.parquet as pq

    d = tmp_path_factory.mktemp("docs_stream")
    t = pq.read_table(f"{SF_DIR}/documents.parquet")
    n = t.num_rows
    for i in range(3):  # multi-file -> multi-batch ingestion
        pq.write_table(t.slice(i * n // 3, (i + 1) * n // 3 - i * n // 3), d / f"part{i}.parquet")
    return str(d)


def _rows(df):
    return sorted(tuple(r) for r in df.collect())


def test_quality_scored_stream_matches_batch(spark, docs_dir):
    stream = quality_scored_stream(read_documents_stream(spark, docs_dir))
    run_to_completion(stream, "q_stream_out", output_mode="append")
    got = _rows(spark.table("q_stream_out"))
    batch = quality_scored_stream(spark.read.parquet(docs_dir))
    assert got == _rows(batch)
    assert len(got) == spark.read.parquet(docs_dir).count()
    # the keep flag is doing real work in both directions on this corpus
    kept = sum(1 for r in got if r[-1])
    assert 0 < kept


def test_contaminated_ids_stream_matches_batch(spark, docs_dir, tmp_path):
    """Plant a benchmark copy into the stream; the streamed contamination
    tags must equal the batch semi-join's."""
    import pyarrow.parquet as pq

    t = pq.read_table(f"{SF_DIR}/documents.parquet")
    bench_docs = spark.read.parquet(docs_dir).filter("doc_id < 20")
    bench = benchmark_shingles(bench_docs)

    # copy one benchmark doc as a new late-arriving "file" in the stream dir
    import pandas as pd

    row = spark.read.parquet(docs_dir).filter("doc_id = 3").toPandas()
    row["doc_id"] = 99993
    row["source"] = "srcX"
    stream_dir = str(tmp_path / "docs2")
    import shutil

    shutil.copytree(docs_dir, stream_dir)
    pq.write_table(pq.read_table(docs_dir).slice(0, 0), f"{stream_dir}/unused.parquet")
    spark.createDataFrame(row).coalesce(1).write.mode("append").parquet(stream_dir)

    stream = contaminated_ids_stream(read_documents_stream(spark, stream_dir), bench)
    run_to_completion(stream, "c_stream_out", output_mode="append")
    got = {r.doc_id for r in spark.table("c_stream_out").collect()}
    batch = contaminated_ids_stream(spark.read.parquet(stream_dir), bench)
    assert got == {r.doc_id for r in batch.collect()}
    assert 99993 in got  # the planted copy is tagged


def test_pq_encoded_stream_matches_batch_codes(spark, tmp_path):
    """Streaming PQ index maintenance: codes assigned by the stateless
    stream-static encoder must equal the batch encoder's (the codes
    sim_pq_topk's ADC scoring consumes) for every vector, including the
    min_by tie-break."""
    import pyarrow.parquet as pq

    import pyspark.sql.functions as F
    from hyrise_spark.pipeline.similarity import (
        _PQ_M,
        _PQ_SUB,
        _dot,
        _normalize,
    )
    from hyrise_spark.streaming.ann_stream import (
        pq_codebook,
        pq_encoded_stream,
        read_embeddings_stream,
    )

    d = tmp_path / "emb_stream"
    d.mkdir()
    t = pq.read_table(f"{SF_DIR}/embeddings.parquet")
    n = t.num_rows
    for i in range(3):
        pq.write_table(t.slice(i * n // 3, (i + 1) * n // 3 - i * n // 3), d / f"p{i}.parquet")

    cb = pq_codebook(spark, SF_DIR).localCheckpoint(eager=True)
    stream = pq_encoded_stream(read_embeddings_stream(spark, str(d)), cb)
    run_to_completion(stream, "pq_codes", output_mode="append")
    got = {r.vec_id: list(r.codes) for r in spark.table("pq_codes").collect()}

    # batch encoder (the sim_pq_topk dataflow, over ALL vectors)
    emb = spark.read.parquet(f"{SF_DIR}/embeddings.parquet")
    nrm = emb.select("vec_id", _normalize(F.col("embedding").cast("array<double>")).alias("v"))
    sub = F.posexplode(
        F.transform(
            F.sequence(F.lit(0), F.lit(_PQ_M - 1)),
            lambda m: F.slice(F.col("v"), m * _PQ_SUB + 1, _PQ_SUB),
        )
    )
    csub = nrm.select(F.col("vec_id").alias("cid"), sub.alias("m", "csub"))
    anchors = cb.select(F.explode("cb").alias("e")).select(
        F.col("e.m").alias("m"), F.col("e.code_id").alias("code_id"),
        F.col("e.asub").alias("asub"),
    )
    d2 = (
        _dot(F.col("csub"), F.col("csub"))
        - 2 * _dot(F.col("csub"), F.col("asub"))
        + _dot(F.col("asub"), F.col("asub"))
    )
    batch = (
        csub.join(F.broadcast(anchors), "m")
        .groupBy("cid", "m")
        .agg(F.min_by(F.col("code_id"), F.struct(F.round(d2, 6), F.col("code_id"))).alias("code"))
        .groupBy("cid")
        .agg(F.array_sort(F.collect_list(F.struct("m", "code"))).alias("mc"))
        .select("cid", F.transform("mc", lambda x: x["code"]).alias("codes"))
    )
    want = {r.cid: list(r.codes) for r in batch.collect()}
    assert len(got) == n and set(got) == set(want)
    mismatches = {k for k in want if got[k] != want[k]}
    assert not mismatches, (len(mismatches), sorted(mismatches)[:5])


def test_mixture_sampled_stream_matches_batch(spark, docs_dir):
    """Streamed mixture sampling admits exactly the batch op's document set
    (same rates, same md5 decision) — the batch backfill and the streaming
    ingest curate identically."""
    from hyrise_spark.pipeline.curate import curate_domain_mixture
    from hyrise_spark.streaming.curate_stream import (
        mixture_rates,
        mixture_sampled_stream,
        read_documents_stream,
    )

    rates = mixture_rates(spark, SF_DIR).localCheckpoint(eager=True)
    stream = mixture_sampled_stream(read_documents_stream(spark, docs_dir), rates)
    run_to_completion(stream, "mix_sampled", output_mode="append")
    got = {(r.doc_id, r.domain, r.n_tok, r.rate) for r in spark.table("mix_sampled").collect()}
    want = {(r.doc_id, r.domain, r.n_tok, r.rate)
            for r in curate_domain_mixture(spark, SF_DIR).collect()}
    assert got == want and want


def test_classifier_gated_stream_matches_batch(spark, docs_dir):
    """The streamed hashed-linear classifier gate returns bit-identical
    logits and keep flags to the batch text_quality_classifier (shared
    expression by construction), and runs stateless."""
    from hyrise_spark.streaming.curate_stream import classifier_gated_stream

    stream = classifier_gated_stream(read_documents_stream(spark, docs_dir))
    run_to_completion(stream, "qc_stream_out", output_mode="append")
    got = _rows(spark.table("qc_stream_out"))
    batch = classifier_gated_stream(spark.read.parquet(docs_dir))
    assert got == _rows(batch)
    assert len(got) == spark.read.parquet(docs_dir).count()
    kept = sum(1 for r in got if r[-1])
    assert 0 < kept < len(got)  # the gate separates on this corpus


def test_streaming_postings_log_matches_batch_tf(spark, docs_dir):
    """Stateless postings extraction: streamed (doc_id, term, tf) rows over
    a 3-file ingestion equal the batch index's tf table exactly."""
    import pyspark.sql.functions as F

    from hyrise_spark.streaming.index_stream import (
        postings_log_stream,
        read_documents_stream,
    )

    stream = postings_log_stream(read_documents_stream(spark, docs_dir))
    run_to_completion(stream, "postings_out", output_mode="append")
    got = _rows(spark.table("postings_out"))
    docs = spark.read.parquet(docs_dir)
    batch_tf = (
        docs.select(
            "doc_id",
            F.explode(F.split(F.trim(F.lower(F.col("text"))), r"\s+")).alias("term"),
        )
        .groupBy("doc_id", "term")
        .agg(F.count(F.lit(1)).alias("tf"))
    )
    assert got == _rows(batch_tf)


def test_streaming_term_directory_matches_batch_index(spark, docs_dir):
    """The stateful term directory (complete mode) converges to the batch
    inverted index's df/total_tf after all files are ingested."""
    from hyrise_spark.pipeline.retrieval import text_inverted_index
    from hyrise_spark.streaming.index_stream import (
        postings_log_stream,
        read_documents_stream,
        term_directory_stream,
    )
    from tests.conftest import SF_DIR

    stream = term_directory_stream(
        postings_log_stream(read_documents_stream(spark, docs_dir))
    )
    run_to_completion(stream, "term_dir_out", output_mode="complete")
    got = _rows(spark.table("term_dir_out"))
    batch = text_inverted_index(spark, SF_DIR).select("term", "df", "total_tf")
    assert got == _rows(batch)
    assert len(got) > 10  # a real vocabulary, not an empty stream


def test_bloom_gated_stream_matches_batch(spark, docs_dir):
    """Streamed Bloom gate: the survivors of the odd-doc_id stream are
    exactly the odd docs the batch dedup_bloom_crosscorpus does NOT flag
    (same md5 bit math, shipped as an IN-list filter), and the gate is a
    stateless narrow map over a multi-batch ingestion."""
    import pyspark.sql.functions as F

    from hyrise_spark.pipeline.dedup import _XB_HASHES, _xb_bit
    from hyrise_spark.streaming.curate_stream import bloom_gated_stream

    docs = spark.read.parquet(docs_dir)
    a = docs.filter(F.col("doc_id") % 2 == 0)
    bit_arr = F.array(*[_xb_bit(i) for i in range(_XB_HASHES)])
    prev_bits = [
        r.bit for r in a.select(F.explode(bit_arr).alias("bit")).distinct().collect()
    ]

    stream = bloom_gated_stream(
        read_documents_stream(spark, docs_dir).filter(F.col("doc_id") % 2 == 1),
        prev_bits,
    )
    run_to_completion(stream, "bloom_gate_out", output_mode="append")
    got = {r.doc_id for r in spark.table("bloom_gate_out").collect()}

    # batch reference: odd docs where at least one bit is missing
    b = docs.filter(F.col("doc_id") % 2 == 1)
    probe = b.select("doc_id", F.explode(bit_arr).alias("bit")).distinct()
    bitset = set(prev_bits)
    flagged = {
        doc
        for doc, bits in (
            (r.doc_id, r.bits)
            for r in probe.groupBy("doc_id").agg(F.collect_set("bit").alias("bits")).collect()
        )
        if all(x in bitset for x in bits)
    }
    want = {r.doc_id for r in b.select("doc_id").collect()} - flagged
    assert got == want
    assert 0 < len(got)  # gate keeps genuinely-new docs on this corpus


def test_with_band_keys_matches_grouped_minhash(spark, docs_dir):
    """The HOF in-row band keys must be BIT-IDENTICAL to grouping
    minhash_signatures' output into bands — same permutations, same
    band-key md5s."""
    import pyspark.sql.functions as F

    from hyrise_spark.pipeline.dedup import (
        _BANDS,
        _ROWS_PER_BAND,
        minhash_signatures,
        with_band_keys,
    )

    docs = spark.read.parquet(docs_dir)
    toks = docs.select(
        "doc_id", F.split(F.trim(F.lower(F.col("text"))), r"\s+").alias("w")
    )
    got = {
        r.doc_id: r.keys
        for r in with_band_keys(toks).select("doc_id", F.col("band_keys").alias("keys")).collect()
        if r.keys
    }
    sig = minhash_signatures(toks)
    grouped = sig.select(
        "doc_id",
        F.array(
            *[
                F.md5(
                    F.array_join(
                        F.transform(
                            F.slice("sig", b * _ROWS_PER_BAND + 1, _ROWS_PER_BAND),
                            lambda x: x.cast("string"),
                        ),
                        ",",
                    )
                )
                for b in range(_BANDS)
            ]
        ).alias("keys"),
    )
    want = {r.doc_id: r.keys for r in grouped.collect()}
    assert got == want


@pytest.mark.slow  # heavyweight; full run only (HYRISE_SPARK_FULL_TESTS=1)
def test_lsh_gated_stream_drops_near_dups(spark, docs_dir, tmp_path):
    """Self-index sanity + parity: gating a stream against an index built
    from THE SAME corpus drops every doc with a 3-shingle (its own band
    keys are in the filter); gating against the even-doc index keeps
    exactly the odd docs whose every band key misses the filter."""
    import pyspark.sql.functions as F

    from hyrise_spark.pipeline.dedup import (
        _XB_HASHES,
        _lshb_bit,
        lsh_band_bloom_positions,
        with_band_keys,
    )
    from hyrise_spark.streaming.curate_stream import lsh_gated_stream

    docs = spark.read.parquet(docs_dir)
    # self-index: everything banded is a suspect
    self_bits = lsh_band_bloom_positions(docs)
    stream = lsh_gated_stream(read_documents_stream(spark, docs_dir), self_bits)
    run_to_completion(stream, "lsh_gate_self", output_mode="append")
    survivors = {r.doc_id for r in spark.table("lsh_gate_self").collect()}
    banded = {
        r.doc_id
        for r in with_band_keys(docs.select(
            "doc_id", F.split(F.trim(F.lower(F.col("text"))), r"\s+").alias("w")
        ))
        .filter(F.size("band_keys") > 0)
        .collect()
    }
    assert survivors.isdisjoint(banded)

    # cross-index parity vs a batch computation of the same predicate
    even_bits = set(lsh_band_bloom_positions(docs.filter(F.col("doc_id") % 2 == 0)))
    odd = docs.filter(F.col("doc_id") % 2 == 1)
    stream = lsh_gated_stream(
        read_documents_stream(spark, docs_dir).filter(F.col("doc_id") % 2 == 1),
        sorted(even_bits),
    )
    run_to_completion(stream, "lsh_gate_cross", output_mode="append")
    got = {r.doc_id for r in spark.table("lsh_gate_cross").collect()}
    toks = odd.select(
        "doc_id", F.split(F.trim(F.lower(F.col("text"))), r"\s+").alias("w")
    )
    keyed = with_band_keys(toks).select("doc_id", F.explode("band_keys").alias("k")).select(
        "doc_id",
        *[_lshb_bit(F.col("k"), i).alias(f"b{i}") for i in range(_XB_HASHES)],
    ).collect()
    suspect = set()
    for r in keyed:
        if all(getattr(r, f"b{i}") in even_bits for i in range(_XB_HASHES)):
            suspect.add(r.doc_id)
    want = {r.doc_id for r in odd.select("doc_id").collect()} - suspect
    assert got == want


def test_audio_chunking_streams_with_batch_parity(spark, docs_dir):
    """mapInPandas chunking runs unchanged on a STREAM (stateless narrow
    op): streamed chunk rows == batch chunk rows over the same files."""
    import pyspark.sql.functions as F

    from hyrise_spark.pipeline.multimodal import as_media_table, chunk_audio

    docs = spark.read.parquet(docs_dir)
    media_cols = lambda d: as_media_table(d).filter(  # noqa: E731
        F.col("mime_type") == "audio/wav"
    ).select("media_id", "payload")

    stream = chunk_audio(media_cols(read_documents_stream(spark, docs_dir)))
    run_to_completion(stream, "audio_chunks_stream", output_mode="append")
    got = {
        (r.media_id, r.chunk_idx, r.chunk_len, r.energy)
        for r in spark.table("audio_chunks_stream").collect()
    }
    want = {
        (r.media_id, r.chunk_idx, r.chunk_len, r.energy)
        for r in chunk_audio(media_cols(docs)).collect()
    }
    assert got == want and len(got) > 0


def test_proto_gated_stream_matches_batch(spark, tmp_path):
    """Streaming prototypicality gate (Sorscher-style pruning applied
    online): streamed survivors equal the batch application of the same
    gate, seeds (sim 1.0 with their own centroid) are dropped, and the
    informative tail streams through."""
    import pyarrow.parquet as pq

    from hyrise_spark.streaming.ann_stream import (
        proto_centroids,
        proto_gated_stream,
        read_embeddings_stream,
    )

    d = tmp_path / "emb_proto"
    d.mkdir()
    t = pq.read_table(f"{SF_DIR}/embeddings.parquet")
    n = t.num_rows
    for i in range(3):
        pq.write_table(
            t.slice(i * n // 3, (i + 1) * n // 3 - i * n // 3),
            d / f"part{i}.parquet",
        )
    cents = proto_centroids(spark, SF_DIR)
    stream = proto_gated_stream(read_embeddings_stream(spark, str(d)), cents)
    run_to_completion(stream, "proto_gate_out", output_mode="append")
    got = _rows(spark.table("proto_gate_out"))
    batch = proto_gated_stream(spark.read.parquet(str(d)), cents)
    assert got == _rows(batch)
    kept = {r[0] for r in got}
    total = spark.read.parquet(str(d)).count()
    assert 0 < len(kept) < total  # the gate does real work
    # the seed vectors are maximally prototypical (sim 1.0): all dropped
    from hyrise_spark.pipeline.similarity import _KMEANS_K

    assert not (kept & set(range(_KMEANS_K)))


def test_temperature_sampled_stream_matches_batch(spark, docs_dir):
    """Streamed alpha-temperature resampling admits exactly the batch
    curate_temperature_mixture document set (same sqrt-lattice rates,
    same integer md5 threshold)."""
    from hyrise_spark.pipeline.curate import curate_temperature_mixture
    from hyrise_spark.streaming.curate_stream import (
        read_documents_stream,
        temperature_rates,
        temperature_sampled_stream,
    )

    rates = temperature_rates(spark, SF_DIR).localCheckpoint(eager=True)
    stream = temperature_sampled_stream(
        read_documents_stream(spark, docs_dir), rates
    )
    run_to_completion(stream, "temp_sampled", output_mode="append")
    got = {
        (r.doc_id, r.lang, r.n_tok, r.rate)
        for r in spark.table("temp_sampled").collect()
    }
    want = {
        (r.doc_id, r.lang, r.n_tok, r.rate)
        for r in curate_temperature_mixture(spark, SF_DIR).collect()
    }
    assert got == want and want
