"""Multimodal binary plumbing contracts (pipeline/multimodal.py) beyond the
registry oracles: genuine BinaryType flow through the pandas stages."""
from __future__ import annotations

from tests.conftest import SF_DIR

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
