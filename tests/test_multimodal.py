"""Multimodal binary plumbing contracts (pipeline/multimodal.py) beyond the
registry oracles: genuine BinaryType flow through the pandas stages."""
from __future__ import annotations

import pytest

from tests.conftest import SF_DIR

@pytest.mark.slow  # heavyweight; full run only (HYRISE_SPARK_FULL_TESTS=1)
def test_resize_emits_real_binary_thumbnails(spark):
    """The resize stage's output column must be genuinely BinaryType (the
    binary->binary contract a real PIL/ffmpeg swap-in needs), thumbnails
    must be the stride-2 head sample of the payload, and dims halve."""
    from pyspark.sql.types import BinaryType

    from hyrise_spark.pipeline.multimodal import as_media_table, resize_media

    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet").filter("doc_id < 50")
    media = as_media_table(docs)
    thumbs = resize_media(media)
    assert isinstance(thumbs.schema["thumb"].dataType, BinaryType)
    joined = {r.media_id: r for r in thumbs.collect()}
    for r in media.collect():
        t = joined[r.media_id]
        assert bytes(t.thumb) == bytes(r.payload[:128:2])
        assert t.thumb_w == (len(r.payload) % 640 + 2) // 2


@pytest.mark.slow  # heavyweight; full run only (HYRISE_SPARK_FULL_TESTS=1)
def test_phash_finds_planted_near_duplicate(spark):
    """Quality gate (the property a pHash user buys): a payload differing
    in ONE character from another lands within the hamming threshold and
    is caught; an unrelated payload is not paired with either."""
    import pyspark.sql.functions as F

    from hyrise_spark.pipeline.multimodal import (
        _PHASH_MAX_HAMMING,
        phash_media,
    )

    base = "the quick brown fox jumps over the lazy dog " * 8
    near = base[:-10] + "lazy cat " + base[-1]
    other = "completely different content with other words entirely " * 8
    media = spark.createDataFrame(
        [(0, base.encode()), (1, near.encode()), (2, other.encode())],
        "media_id LONG, payload BINARY",
    )
    h = {r["media_id"]: r["phash"] for r in phash_media(media).collect()}
    ham = lambda a, b: bin(a ^ b).count("1")  # noqa: E731
    assert ham(h[0], h[1]) <= _PHASH_MAX_HAMMING, (h, ham(h[0], h[1]))
    # determinism: same payload -> same hash
    h2 = {r["media_id"]: r["phash"] for r in phash_media(media).collect()}
    assert h == h2
