"""Streaming sinks into the engine's MySQL-visible tables.

The reference is batch-only; this closes the loop on the streaming
extension: a Structured Streaming query can maintain an engine table
(readable over the MySQL wire protocol) via per-microbatch MERGE —
the standard foreachBatch upsert pattern for sinks without native
streaming support (JDBC databases, lakehouse tables).

Scale notes: foreachBatch runs the MERGE once per microbatch on the
cluster (set-based, no per-row loop); with update output mode on an
aggregation, each batch carries only the CHANGED aggregate rows, so
the merged delta stays proportional to the batch, not the state.
"""

from __future__ import annotations

import uuid

from pyspark.sql import DataFrame


def upsert_writer(
    engine,
    schema: str,
    table: str,
    key_cols: list[str],
    value_cols: list[str],
):
    """foreachBatch callback: MERGE each microbatch into an engine
    table — update matched keys, insert new ones."""
    on = " AND ".join(f"t.{k} = s.{k}" for k in key_cols)
    sets = ", ".join(f"{c} = s.{c}" for c in value_cols)
    cols = ", ".join(key_cols + value_cols)
    vals = ", ".join(f"s.{c}" for c in key_cols + value_cols)

    def write_batch(batch_df: DataFrame, batch_id: int) -> None:
        if not batch_df.take(1):
            return
        # foreachBatch runs in a CLONED session: a session-local temp
        # view would be invisible to the engine's own session. Global
        # temp views are cross-session.
        view = f"__stream_batch_{uuid.uuid4().hex[:12]}"
        batch_df.createOrReplaceGlobalTempView(view)
        try:
            engine.sql(
                f"MERGE INTO `{schema}`.`{table}` t "
                f"USING (SELECT * FROM global_temp.{view}) s ON {on} "
                f"WHEN MATCHED THEN UPDATE SET {sets} "
                f"WHEN NOT MATCHED THEN INSERT ({cols}) VALUES ({vals})"
            )
        finally:
            batch_df.sparkSession.catalog.dropGlobalTempView(view)

    return write_batch


def stream_upsert_into_engine(
    stream_df: DataFrame,
    engine,
    schema: str,
    table: str,
    key_cols: list[str],
    value_cols: list[str],
):
    """Attach a foreachBatch MERGE sink to a streaming DataFrame and
    start it with the availableNow trigger (bounded drain; production
    streams drop the trigger for continuous upkeep). Returns the
    StreamingQuery."""
    return (
        stream_df.writeStream.foreachBatch(
            upsert_writer(engine, schema, table, key_cols, value_cols)
        )
        .outputMode("update")
        .trigger(availableNow=True)
        .start()
    )
