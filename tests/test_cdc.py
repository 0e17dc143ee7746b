"""CDC changelog application: a multi-batch change feed applied through
foreachBatch + MERGE must converge to the same state as replaying the log
in order — including within-batch duplicate-key collapse and deletes."""
from __future__ import annotations

import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from hyrise_spark.engine import Engine
from hyrise_spark.streaming.cdc_stream import cdc_apply_sink


def _write_batch(d, name, rows, mtime):
    """Write a feed file with an EXPLICIT modification time: the file source
    orders micro-batches by mtime, and two files written within the same
    clock tick would otherwise be delivered in either order (observed
    flake). Cross-batch ordering is the CDC feed's contract; in-batch
    ordering is the seq collapse's job."""
    import os

    path = d / name
    pq.write_table(
        pa.table(
            {
                "op": pa.array([r[0] for r in rows], pa.string()),
                "id": pa.array([r[1] for r in rows], pa.int64()),
                "v": pa.array([r[2] for r in rows], pa.int64()),
                "seq": pa.array([r[3] for r in rows], pa.int64()),
            }
        ),
        path,
    )
    os.utime(path, (mtime, mtime))


def test_cdc_feed_converges_to_replayed_state(spark, tmp_path):
    feed = tmp_path / "feed"
    feed.mkdir()
    # batch 1: inserts + an in-batch update that must collapse (seq order)
    _write_batch(feed, "b1.parquet", [
        ("I", 1, 10, 1), ("I", 2, 20, 2), ("U", 1, 11, 3), ("I", 3, 30, 4),
    ], mtime=1_000_000_000)
    # batch 2: delete, update, re-insert of a deleted key
    _write_batch(feed, "b2.parquet", [
        ("D", 2, 0, 5), ("U", 3, 33, 6), ("I", 4, 40, 7),
        ("D", 1, 0, 8), ("I", 1, 12, 9),
    ], mtime=1_000_000_100)

    eng = Engine(spark)
    eng.execute("CREATE TABLE cdc_kv (id BIGINT, v BIGINT)")
    changes = (
        spark.readStream.schema("op string, id long, v long, seq long")
        .option("maxFilesPerTrigger", 1)
        .parquet(str(feed))
    )
    q = cdc_apply_sink(changes, eng, "cdc_kv").option(
        "checkpointLocation", str(tmp_path / "ckpt")
    ).start()
    q.awaitTermination()

    got = {r.id: r.v for r in eng.execute("SELECT * FROM cdc_kv").collect()}
    assert got == {1: 12, 3: 33, 4: 40}
    eng.execute("DROP TABLE cdc_kv")


def test_cdc_delete_only_batch(spark, tmp_path):
    feed = tmp_path / "feed"
    feed.mkdir()
    _write_batch(feed, "b1.parquet", [("D", 7, 0, 1)], mtime=1_000_000_000)
    eng = Engine(spark)
    eng.execute("CREATE TABLE cdc_kv2 (id BIGINT, v BIGINT)")
    eng.execute("INSERT INTO cdc_kv2 VALUES (7, 70), (8, 80)")
    changes = (
        spark.readStream.schema("op string, id long, v long, seq long")
        .parquet(str(feed))
    )
    q = cdc_apply_sink(changes, eng, "cdc_kv2").option(
        "checkpointLocation", str(tmp_path / "ckpt2")
    ).start()
    q.awaitTermination()
    got = {r.id: r.v for r in eng.execute("SELECT * FROM cdc_kv2").collect()}
    assert got == {8: 80}
    eng.execute("DROP TABLE cdc_kv2")
