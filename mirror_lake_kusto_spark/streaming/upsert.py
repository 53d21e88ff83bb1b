"""Streaming upsert sink: exactly-once CDC apply via foreachBatch + MERGE.

The canonical Structured Streaming consumer for a change stream: each
micro-batch MERGEs into a ``DeltaSink`` keyed table, with the Delta
``txn`` ledger making replays no-ops.  Structured Streaming guarantees
batch ids are replayed IDENTICALLY after a crash (same id, same data),
so idempotence of the apply function is exactly what upgrades at-least-
once delivery to exactly-once table state — the same I3 contract the
mirror pipeline uses for ingestion (reference: the reference's Kusto
ingest dedupes on ingestion mapping + extent tags; the public Delta
equivalent is the txn/appId ledger).

Usage::

    from mirror_lake_kusto_spark.streaming.upsert import upsert_stream

    q = upsert_stream(
        stream_df,                 # any streaming DataFrame
        sink,                      # DeltaSink target
        key_cols=["user_id"],
        app_id="orders-upsert",
        version_col="ts",          # latest-per-key within a batch wins
        delete_col="is_delete",    # optional tombstone marker
        trigger={"availableNow": True},
    )
    q.awaitTermination()

Scale posture: the per-batch work is one MERGE — probe + rewrite of
only the files containing matched keys (see ``DeltaSink.merge``), so
cost tracks the CHANGE volume, never table size.  The within-batch
latest-per-key window partitions by key (no global window).  Delete
tombstones ride the SAME merge commit as ``delete_keys`` — the key
frame stays executor-side (probe broadcast + per-file anti-join);
nothing collects to the driver, so a CDC batch with millions of
tombstones is just a wider broadcast, never a driver-built predicate.
"""

from __future__ import annotations

from collections.abc import Sequence

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, Window


def _latest_meta(sink):
    from ..sources.delta_log import latest_metadata

    try:
        return latest_metadata(sink.spark, sink.path)
    except Exception:
        return None  # empty/new table: first merge defines the schema


def foreach_batch_upsert(
    sink,
    key_cols: Sequence[str],
    app_id: str,
    version_col: str | None = None,
    delete_col: str | None = None,
    target_cols: Sequence[str] | None = None,
):
    """Build the idempotent foreachBatch apply function.

    Per batch: (1) skip outright if this batch id is already in the
    sink's txn ledger (crash replay); (2) reduce the batch to its
    latest row per key (``version_col`` order, deterministic tiebreak;
    without a version column exact-duplicate rows collapse, but true
    key conflicts raise — there is no defensible winner, and a wedged
    stream beats a silently wrong table); (3) one MERGE applies the
    upserts AND the tombstone deletes (``delete_keys``) in a single
    atomic commit that also carries the batch-id txn action — so the
    batch is all-or-nothing and replays are no-ops by construction.

    ``target_cols`` pins the table's column set explicitly — REQUIRED
    knowledge when the target may be empty (nothing to introspect):
    without it, the first batch's bookkeeping columns would be baked
    into the new table's schema."""
    from ..sources.delta_log import last_txn_version

    keys = list(key_cols)

    def apply(batch_df: DataFrame, batch_id: int) -> None:
        prev = last_txn_version(sink.spark, sink.path, app_id)
        if prev is not None and batch_id <= prev:
            return  # replayed batch — already fully applied
        df = batch_df
        if version_col is not None:
            order = [F.col(version_col).desc()] + [
                F.col(k).desc() for k in keys
            ]
            w = Window.partitionBy(*keys).orderBy(*order)
            df = (
                df.withColumn("_mlk_rn", F.row_number().over(w))
                .filter(F.col("_mlk_rn") == 1)
                .drop("_mlk_rn")
            )
        else:
            # identical replayed rows are harmless; conflicting rows
            # for one key have no defined winner without a version
            df = df.dropDuplicates()
            dup = (
                df.groupBy(*keys).count().filter(F.col("count") > 1)
            )
            if dup.limit(1).count():
                raise ValueError(
                    "batch has multiple conflicting rows per key and "
                    "no version_col to order them — pass version_col"
                )
        del_keys = None
        if delete_col is not None:
            del_keys = df.filter(F.col(delete_col)).select(*keys)
            df = df.filter(
                ~F.coalesce(F.col(delete_col), F.lit(False))
            ).drop(delete_col)
        # align to the target's schema: CDC streams carry bookkeeping
        # columns (_commit_version etc.) the table doesn't store.  The
        # projection is by name against the sink's CURRENT schema; a
        # target column missing from the batch fails loudly (a silent
        # null-fill would corrupt the table)
        cols = list(target_cols) if target_cols is not None else None
        if cols is None:
            meta = _latest_meta(sink)
            if meta is not None:
                import json as _json

                cols = [
                    f["name"]
                    for f in _json.loads(meta["schemaString"])["fields"]
                ]
        if cols is not None:
            missing = [c for c in cols if c not in df.columns]
            if missing:
                raise ValueError(
                    f"batch is missing target columns {missing}"
                )
            df = df.select(*cols)
        sink.merge(df, keys, txn=(app_id, batch_id), delete_keys=del_keys)

    return apply


def upsert_stream(
    stream_df: DataFrame,
    sink,
    key_cols: Sequence[str],
    app_id: str,
    checkpoint_dir: str | None = None,
    version_col: str | None = None,
    delete_col: str | None = None,
    target_cols: Sequence[str] | None = None,
    trigger: dict | None = None,
):
    """Wire ``stream_df`` into ``sink`` as an exactly-once keyed upsert.
    Returns the started StreamingQuery."""
    writer = stream_df.writeStream.foreachBatch(
        foreach_batch_upsert(
            sink, key_cols, app_id,
            version_col=version_col, delete_col=delete_col,
            target_cols=target_cols,
        )
    )
    if checkpoint_dir:
        writer = writer.option("checkpointLocation", checkpoint_dir)
    writer = writer.trigger(**(trigger or {"availableNow": True}))
    return writer.start()
