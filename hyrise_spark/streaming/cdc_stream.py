"""CDC changelog application — a streaming change feed (op, key, value, seq)
applied to an engine-managed table via per-micro-batch MERGE.

Composes two of this repo's surfaces: Structured Streaming's foreachBatch
(exactly-once per epoch with a checkpointed sink) and the engine's MERGE
INTO (SQL:2003 upsert). This is the standard "apply a Debezium-style feed
to a warehouse table" shape: collapse each batch to the LAST change per key
(max_by on the sequence number — late duplicates within a batch fold away),
then one upsert MERGE for I/U rows and one delete MERGE for D rows.

Scale: the collapse is a partial-agg groupBy on the key; each MERGE joins
the batch (small) against the table on the key — AQE broadcasts the batch
side when it measures small. At warehouse scale the engine's snapshot
`replace_table` maps onto a table format's MERGE commit (the lineage chain
here is the in-memory stand-in for a format's snapshot log, same as the
DML design note in engine.py).
"""
from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame


def cdc_apply_sink(changes: DataFrame, engine, table: str, key: str = "id"):
    """Return a writeStream that applies `changes` (op/key/v/seq rows, op in
    I/U/D) to `engine`'s `table`. Start + awaitTermination to run."""

    def apply_batch(batch_df: DataFrame, epoch_id: int) -> None:
        if batch_df.isEmpty():
            return
        last = (
            batch_df.groupBy(key)
            .agg(F.max_by(F.struct("op", "v"), "seq").alias("c"))
            .select(key, "c.op", "c.v")
        )
        # foreachBatch hands the DataFrame to a CLONED micro-batch session;
        # a plain temp view would be invisible to the engine's session, so
        # publish the collapsed batch as a GLOBAL temp view (app-scoped).
        last.createOrReplaceGlobalTempView("__hs_cdc_batch")
        engine.execute(
            f"MERGE INTO {table} t USING "
            f"(SELECT {key}, v FROM global_temp.__hs_cdc_batch "
            f" WHERE op IN ('I', 'U')) s "
            f"ON t.{key} = s.{key} "
            f"WHEN MATCHED THEN UPDATE SET v = s.v "
            f"WHEN NOT MATCHED THEN INSERT ({key}, v) VALUES (s.{key}, s.v)"
        )
        engine.execute(
            f"MERGE INTO {table} t USING "
            f"(SELECT {key} FROM global_temp.__hs_cdc_batch WHERE op = 'D') s "
            f"ON t.{key} = s.{key} WHEN MATCHED THEN DELETE"
        )

    return changes.writeStream.foreachBatch(apply_batch).trigger(availableNow=True)
