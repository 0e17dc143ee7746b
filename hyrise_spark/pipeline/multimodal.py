"""Multimodal column handling — opaque binary payloads with typed metadata,
processed via Arrow-batched pandas iterators (mapInPandas).

The reference has no binary/multimodal types (5-type system,
all_type_variant.hpp:34-40); this is the net-new Spark surface a training-data
pipeline needs: store image/audio/video as `binary` columns + metadata, run
decode / feature-extract / resize / frame-sample as vectorized Python over
Arrow batches.

The actual media codecs are NOT in this container, so decode is a
deterministic fake (byte-derived pseudo-dimensions) behind `_decode_stub`;
the Spark-side plumbing — schema, batch iteration, partition-preserving
mapInPandas, output contract — is real and is what the tests pin. Swapping
`_decode_stub` for PIL/ffmpeg is a one-function change.

Scale notes: mapInPandas streams Arrow record batches — constant memory per
task regardless of partition size; no collect, no per-row Python calls.
Binary payloads stay in the executor; only extracted features shuffle.
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd
import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.types import (
    BinaryType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

from hyrise_spark.catalog import load_tables
from hyrise_spark.registry import register


def _docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    return load_tables(spark, sf_dir, ("documents",))["documents"]


def as_media_table(docs: DataFrame) -> DataFrame:
    """Derive an opaque-binary media table from `documents` (the container has
    no real media files; utf-8 payload bytes stand in for encoded frames)."""
    return docs.select(
        F.col("doc_id").alias("media_id"),
        F.encode(F.col("text"), "utf-8").alias("payload"),
        F.when(F.col("doc_id") % 3 == 0, "image/png")
        .when(F.col("doc_id") % 3 == 1, "audio/wav")
        .otherwise("video/mp4")
        .alias("mime_type"),
        F.col("source").alias("origin"),
    )


_FEATURE_SCHEMA = StructType(
    [
        StructField("media_id", LongType()),
        StructField("mime_type", StringType()),
        StructField("n_bytes", LongType()),
        StructField("fake_width", IntegerType()),
        StructField("fake_height", IntegerType()),
        StructField("header_hex", StringType()),
    ]
)


def _decode_stub(payload: bytes, mime: str) -> tuple[int, int]:
    """Deterministic stand-in for a real decoder.

    A real implementation would be:
        from PIL import Image; Image.open(io.BytesIO(payload)).size
    which is unavailable here — the fake derives stable pseudo-dimensions
    from the byte length so tests are reproducible.
    """
    n = len(payload)
    return (n % 640) + 1, (n % 480) + 1


def _extract_features(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    for pdf in batches:
        dims = [_decode_stub(p, m) for p, m in zip(pdf["payload"], pdf["mime_type"])]
        yield pd.DataFrame(
            {
                "media_id": pdf["media_id"],
                "mime_type": pdf["mime_type"],
                "n_bytes": [len(p) for p in pdf["payload"]],
                "fake_width": [w for w, _ in dims],
                "fake_height": [h for _, h in dims],
                "header_hex": [p[:4].hex() for p in pdf["payload"]],
            }
        )


def extract_media_features(media: DataFrame) -> DataFrame:
    """Arrow-batched feature extraction over binary payloads."""
    return media.mapInPandas(_extract_features, schema=_FEATURE_SCHEMA)


# The oracle replays the deterministic fake in SQL (octet_length / modulo /
# hex-of-prefix) — execution on the Spark side genuinely goes through binary
# columns + mapInPandas; the SQL equivalence is what makes it hash-checkable.
@register(
    "multimodal_extract_features",
    oracle="""
    SELECT doc_id AS media_id,
           CASE WHEN doc_id % 3 = 0 THEN 'image/png'
                WHEN doc_id % 3 = 1 THEN 'audio/wav'
                ELSE 'video/mp4' END AS mime_type,
           CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes,
           CAST(octet_length(encode(text)) % 640 + 1 AS INT) AS fake_width,
           CAST(octet_length(encode(text)) % 480 + 1 AS INT) AS fake_height,
           -- first 4 BYTES of the encoded payload (= first 8 hex chars), so
           -- the invariant holds for multi-byte text too
           lower(substring(hex(encode(text)), 1, 8)) AS header_hex
    FROM documents
    WHERE doc_id < 200
    """,
    tags=("multimodal",),
)
def multimodal_extract_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _docs(spark, sf_dir).filter(F.col("doc_id") < 200)
    return extract_media_features(as_media_table(docs))


# Frame sampling: every k-th chunk of a "video" payload — the mapInPandas
# pattern for frame extraction (1 input row -> N output rows).
_FRAME_SCHEMA = StructType(
    [
        StructField("media_id", LongType()),
        StructField("frame_no", IntegerType()),
        StructField("frame_bytes", BinaryType()),
        StructField("frame_hash", StringType()),
    ]
)

_FRAME_SIZE = 32
_SAMPLE_EVERY = 4


def _sample_frames(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    import hashlib

    for pdf in batches:
        out = {"media_id": [], "frame_no": [], "frame_bytes": [], "frame_hash": []}
        for mid, payload in zip(pdf["media_id"], pdf["payload"]):
            n_frames = len(payload) // _FRAME_SIZE
            for f in range(0, n_frames, _SAMPLE_EVERY):
                chunk = payload[f * _FRAME_SIZE : (f + 1) * _FRAME_SIZE]
                out["media_id"].append(mid)
                out["frame_no"].append(f)
                out["frame_bytes"].append(chunk)
                out["frame_hash"].append(hashlib.md5(chunk).hexdigest())
        yield pd.DataFrame(out)


@register(
    "multimodal_frame_sample",
    oracle=f"""
    WITH media AS (
      -- synthetic corpus is pure ASCII: byte offsets == char offsets, so the
      -- oracle can frame on the string (DuckDB substr has no BLOB overload)
      SELECT doc_id AS media_id, text AS payload FROM documents
      WHERE doc_id % 3 = 2 AND doc_id < 300
    ), frames AS (
      SELECT media_id, CAST(u.f AS INT) AS frame_no,
             md5(substr(payload, u.f * {_FRAME_SIZE} + 1, {_FRAME_SIZE})) AS frame_hash
      FROM media, LATERAL (
        SELECT UNNEST(generate_series(0, length(payload) // {_FRAME_SIZE} - 1, {_SAMPLE_EVERY})) AS f
      ) u
      WHERE length(payload) >= {_FRAME_SIZE}
    )
    SELECT media_id, frame_no, frame_hash FROM frames
    """,
    tags=("multimodal",),
)
def multimodal_frame_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _docs(spark, sf_dir).filter((F.col("doc_id") % 3 == 2) & (F.col("doc_id") < 300))
    frames = as_media_table(docs).mapInPandas(_sample_frames, schema=_FRAME_SCHEMA)
    return frames.select("media_id", "frame_no", "frame_hash")


# Resize: binary -> SMALLER binary (the mission's "resize" op; decode/encode
# are stubbed like everything here, the N->N binary-to-binary mapInPandas
# contract is the real part). Stub "half-resolution thumbnail" = every 2nd
# byte of the first 2*_THUMB_BYTES bytes — deterministic, SQL-replayable
# (ASCII corpus: byte stride == regexp pair-reduction on chars), and the
# output column is genuinely BinaryType (pinned in tests/test_multimodal.py).
_THUMB_BYTES = 64

_THUMB_SCHEMA = StructType(
    [
        StructField("media_id", LongType()),
        StructField("mime_type", StringType()),
        StructField("thumb", BinaryType()),
        StructField("thumb_w", IntegerType()),
        StructField("thumb_h", IntegerType()),
    ]
)


def _resize_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    for pdf in batches:
        dims = [_decode_stub(p, m) for p, m in zip(pdf["payload"], pdf["mime_type"])]
        yield pd.DataFrame(
            {
                "media_id": pdf["media_id"],
                "mime_type": pdf["mime_type"],
                # stride-2 over the head of the payload = the stub downsample
                "thumb": [bytes(p[: 2 * _THUMB_BYTES : 2]) for p in pdf["payload"]],
                "thumb_w": [(w + 1) // 2 for w, _ in dims],
                "thumb_h": [(h + 1) // 2 for _, h in dims],
            }
        )


def resize_media(media: DataFrame) -> DataFrame:
    """Arrow-batched binary->binary resize (payload in, thumbnail out)."""
    return media.mapInPandas(_resize_batches, schema=_THUMB_SCHEMA)


@register(
    "multimodal_resize",
    oracle=f"""
    SELECT doc_id AS media_id,
           CASE WHEN doc_id % 3 = 0 THEN 'image/png'
                WHEN doc_id % 3 = 1 THEN 'audio/wav'
                ELSE 'video/mp4' END AS mime_type,
           -- stride-2 byte sample == drop every 2nd char on this ASCII corpus
           md5(regexp_replace(substr(text, 1, {2 * _THUMB_BYTES}), '(.)(.)', '\\1', 'g')) AS thumb_hash,
           CAST(length(regexp_replace(substr(text, 1, {2 * _THUMB_BYTES}), '(.)(.)', '\\1', 'g')) AS BIGINT) AS thumb_len,
           CAST((octet_length(encode(text)) % 640 + 2) // 2 AS INT) AS thumb_w,
           CAST((octet_length(encode(text)) % 480 + 2) // 2 AS INT) AS thumb_h
    FROM documents WHERE doc_id < 200
    """,
    tags=("multimodal",),
)
def multimodal_resize(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _docs(spark, sf_dir).filter(F.col("doc_id") < 200)
    thumbs = resize_media(as_media_table(docs))
    # binary column flows out of the pandas stage; the registered projection
    # hashes it JVM-side so the driver compare stays string-typed
    return thumbs.select(
        "media_id",
        "mime_type",
        F.md5("thumb").alias("thumb_hash"),
        F.octet_length("thumb").cast("long").alias("thumb_len"),
        "thumb_w",
        "thumb_h",
    )


# ---------------------------------------------------------------------------
# Audio chunking + energy gate (VAD-style): split each audio payload into
# fixed-size windows, compute per-chunk byte energy, and flag voiced chunks
# (mean byte value above a threshold — on the utf-8 stand-in payloads,
# space-heavy windows genuinely score lower, so the flag separates). A real
# deployment swaps the energy stub for RMS over PCM samples; the Spark-side
# contract — binary column in, (media_id, chunk_idx, energy, voiced) rows
# out of an Arrow-batched iterator, rows-per-media = ceil(n/C) — is real.

_CHUNK_BYTES = 64
_VOICED_MEAN_X100 = 9458  # corpus median mean-byte x100: the flag splits ~50/50

_CHUNK_SCHEMA = StructType(
    [
        StructField("media_id", LongType()),
        StructField("chunk_idx", IntegerType()),
        StructField("chunk_len", LongType()),
        StructField("energy", LongType()),
    ]
)


def _chunk_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    for pdf in batches:
        ids, idxs, lens, energies = [], [], [], []
        for mid, payload in zip(pdf["media_id"], pdf["payload"]):
            for i in range(0, len(payload), _CHUNK_BYTES):
                chunk = payload[i : i + _CHUNK_BYTES]
                ids.append(mid)
                idxs.append(i // _CHUNK_BYTES)
                lens.append(len(chunk))
                energies.append(sum(chunk))
        yield pd.DataFrame(
            {"media_id": ids, "chunk_idx": idxs, "chunk_len": lens,
             "energy": energies}
        )


def chunk_audio(media: DataFrame) -> DataFrame:
    """Arrow-batched fixed-window chunking of audio payloads."""
    return media.mapInPandas(_chunk_batches, schema=_CHUNK_SCHEMA)


@register(
    "multimodal_audio_chunks",
    oracle=f"""
    WITH audio AS (
      SELECT doc_id AS media_id, text FROM documents WHERE doc_id % 3 = 1
    ),
    chunks AS (
      SELECT media_id,
             CAST(g.i AS INT) AS chunk_idx,
             substr(text, g.i * {_CHUNK_BYTES} + 1, {_CHUNK_BYTES}) AS chunk
      FROM audio, LATERAL (
        SELECT UNNEST(generate_series(0,
          CAST(CEIL(length(text) / {_CHUNK_BYTES}.0) AS INT) - 1)) AS i
      ) g
    )
    SELECT media_id, chunk_idx,
           CAST(length(chunk) AS BIGINT) AS chunk_len,
           CAST(list_sum(list_transform(string_split(chunk, ''),
                ch -> ascii(ch))) AS BIGINT) AS energy,
           CAST(100 * list_sum(list_transform(string_split(chunk, ''),
                ch -> ascii(ch))) > {_VOICED_MEAN_X100} * length(chunk)
                AS BOOLEAN) AS voiced
    FROM chunks ORDER BY media_id, chunk_idx
    """,
    tags=("multimodal", "audio"),
)
def multimodal_audio_chunks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-chunk energy + voiced flag over the audio subset of the media
    table. Scale: mapInPandas streams Arrow batches (payloads never
    shuffle); output rows are ceil(n_bytes/{_CHUNK_BYTES}) per media —
    bounded by payload size. The voiced flag is an integer cross-multiply,
    exact in both engines."""
    media = as_media_table(_docs(spark, sf_dir)).filter(
        F.col("mime_type") == "audio/wav"
    )
    chunks = chunk_audio(media.select("media_id", "payload"))
    return chunks.select(
        "media_id",
        "chunk_idx",
        "chunk_len",
        "energy",
        (100 * F.col("energy") > _VOICED_MEAN_X100 * F.col("chunk_len")).alias(
            "voiced"
        ),
    ).orderBy("media_id", "chunk_idx")


# ---------------------------------------------------------------------------
# Perceptual-hash near-duplicate detection (round 9) — the image-dedup shape:
# a locality-sensitive content hash per media object, hamming-LSH banding
# for candidates, exact hamming verification. With real codecs the hash is
# pHash/aHash over decoded pixels; the container has none, so the stub
# "decodes" the payload to its codepoint stream and hashes THAT — the
# locality property is real (payloads sharing most content agree on most
# chunk parities), and the banding/verification plumbing is exactly what a
# production image dedup runs.
#
# Hash: 16 bits; bit i = parity of the codepoint sum of the i-th of 16
# equal character chunks. Banding: 4 bands x 4 bits — a pair is a candidate
# iff it agrees on at least one band (never all-pairs); verification keeps
# hamming <= _PHASH_MAX_HAMMING via XOR bit_count. All integer-exact, so
# the DuckDB oracle recomputes the identical hash from the text.
_PHASH_BITS = 16
_PHASH_CHUNKS = 16
_PHASH_BANDS = 4
_PHASH_BAND_BITS = _PHASH_BITS // _PHASH_BANDS
_PHASH_MAX_HAMMING = 4
_PHASH_DOCS = 300

_PHASH_SCHEMA = StructType(
    [
        StructField("media_id", LongType()),
        StructField("phash", LongType()),
    ]
)


def phash_media(media: DataFrame) -> DataFrame:
    """(media_id, 16-bit locality hash) via Arrow-batched mapInPandas —
    payloads never shuffle; only the 8-byte hash leaves the scan task."""

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            out = []
            for mid, payload in zip(pdf["media_id"], pdf["payload"]):
                chars = bytes(payload).decode("utf-8")
                n = len(chars)
                h = 0
                for i in range(_PHASH_CHUNKS):
                    lo, hi = i * n // _PHASH_CHUNKS, (i + 1) * n // _PHASH_CHUNKS
                    csum = sum(ord(c) for c in chars[lo:hi])
                    h |= (csum % 2) << i
                out.append((int(mid), h))
            yield pd.DataFrame(out, columns=["media_id", "phash"])

    return media.select("media_id", "payload").mapInPandas(
        batches, schema=_PHASH_SCHEMA
    )


def _phash_sql() -> str:
    chunk_sums = " + ".join(
        f"COALESCE(list_sum(list_transform(string_split_regex("
        f"substr(text, 1 + (({i} * n) // {_PHASH_CHUNKS}),"
        f" ((({i} + 1) * n) // {_PHASH_CHUNKS}) - (({i} * n) // {_PHASH_CHUNKS})),"
        f" '')," f" x -> unicode(x))), 0) % 2 * {1 << i}"
        for i in range(_PHASH_CHUNKS)
    )
    return chunk_sums


@register(
    "multimodal_phash_neardup",
    oracle=f"""
    WITH m AS (
      SELECT doc_id AS media_id, text, length(text) AS n
      FROM documents WHERE doc_id < {_PHASH_DOCS}
    ),
    h AS (SELECT media_id, {_phash_sql()} AS phash FROM m),
    bands AS (
      SELECT media_id, phash, b.i AS band,
             (phash >> ({_PHASH_BAND_BITS} * b.i)) & {(1 << _PHASH_BAND_BITS) - 1}
               AS band_val
      FROM h, LATERAL (SELECT UNNEST(generate_series(0, {_PHASH_BANDS - 1})) AS i) b
    ),
    cand AS (
      SELECT DISTINCT a.media_id AS m1, b.media_id AS m2,
             a.phash AS h1, b.phash AS h2
      FROM bands a JOIN bands b
        ON a.band = b.band AND a.band_val = b.band_val
       AND a.media_id < b.media_id
    )
    SELECT m1, m2, CAST(bit_count(xor(h1, h2)) AS INT) AS hamming
    FROM cand WHERE bit_count(xor(h1, h2)) <= {_PHASH_MAX_HAMMING}
    ORDER BY m1, m2
    """,
    tags=("multimodal", "dedup", "phash"),
)
def multimodal_phash_neardup(spark: SparkSession, sf_dir: str) -> DataFrame:
    media = as_media_table(
        _docs(spark, sf_dir).filter(F.col("doc_id") < _PHASH_DOCS)
    )
    h = phash_media(media).localCheckpoint(eager=False)  # one Arrow pass
    band_structs = [
        F.struct(
            F.lit(b).alias("band"),
            (
                F.shiftright("phash", _PHASH_BAND_BITS * b)
                .bitwiseAND(F.lit((1 << _PHASH_BAND_BITS) - 1))
            ).alias("band_val"),
        )
        for b in range(_PHASH_BANDS)
    ]
    bands = h.select(
        "media_id", "phash", F.explode(F.array(*band_structs)).alias("bk")
    ).select("media_id", "phash", "bk.band", "bk.band_val")
    a = bands.select(
        F.col("media_id").alias("m1"), F.col("phash").alias("h1"),
        "band", "band_val",
    )
    b = bands.select(
        F.col("media_id").alias("m2"), F.col("phash").alias("h2"),
        "band", "band_val",
    )
    hamming = F.bit_count(F.expr("h1 ^ h2")).cast("int")
    return (
        a.join(b, ["band", "band_val"])
        .filter(F.col("m1") < F.col("m2"))
        .dropDuplicates(["m1", "m2"])
        .select("m1", "m2", hamming.alias("hamming"))
        .filter(F.col("hamming") <= _PHASH_MAX_HAMMING)
        .orderBy("m1", "m2")
    )
