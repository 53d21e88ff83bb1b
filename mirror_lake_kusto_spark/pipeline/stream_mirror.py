"""StreamingMirror: the mirror pipeline as a true Structured Streaming
query — SURVEY §3.3's declared Spark shape ("foreachBatch: read new
files -> add lineage -> single atomic commit"), built on the mlk_delta
Python data source.

Where MirrorPipeline (orchestrate.py) replicates the reference's poll
loop + hand-rolled state machine, this variant delegates ALL of the
reference's log-discovery machinery (O1/O3: checkpoint pruning,
incremental offsets, restart recovery) to Spark's streaming engine:

- offsets live in the streaming checkpoint (the reference's CSV state
  store collapses into ``checkpointLocation``);
- each micro-batch lands with ONE DeltaSink commit carrying a
  ``txn`` action keyed on the epoch id, so a batch replayed after a
  crash is detected and skipped — exactly-once without any bookkeeping
  of our own (I2/I3; DeltaTableOrchestration.cs:85-133,181-200);
- lineage (MLK_BlobPath, H5) is injected by the source itself;
- continuous mode = ``trigger(processingTime="5 seconds")`` — the
  reference's BETWEEN_TX_PROBE_DELAY (I1); one-shot =
  ``Trigger.AvailableNow``.

Append-only by design: data-changing removes make the source raise
(streams cannot retract); full add/remove mirroring with deletes is the
batch pipeline's job.  This is the same split Delta's own streaming
source makes.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import SparkSession
from pyspark.sql.streaming import StreamingQuery

from ..sources import delta_log as DL
from ..sources.delta_sink import DeltaSink
from ..streaming.delta_source import register_source


class StreamingMirror:
    def __init__(
        self,
        spark: SparkSession,
        source_path: str,
        target_path: str,
        checkpoint_dir: str,
        table_name: str = "mirror",
    ):
        self.spark = spark
        self.source = source_path
        self.sink = DeltaSink(spark, target_path)
        self.checkpoint_dir = checkpoint_dir
        self.app_id = f"mlk-stream-mirror:{table_name}"
        register_source(spark)

    def _write_batch(self, batch_df, epoch_id: int) -> None:
        committed = DL.last_txn_version(self.spark, self.sink.path, self.app_id)
        if committed is not None and committed >= epoch_id:
            return  # replayed epoch after restart: already landed (I3)
        self.sink.append(
            batch_df.withColumn("MLK_BatchTxId", F.lit(epoch_id).cast("long")),
            txn=(self.app_id, epoch_id),
        )

    def start(
        self,
        available_now: bool = True,
        processing_time: str | None = None,
    ) -> StreamingQuery:
        stream = (
            self.spark.readStream.format("mlk_delta")
            .option("path", self.source)
            .option("lineage", "true")
            .load()
        )
        writer = stream.writeStream.foreachBatch(self._write_batch).option(
            "checkpointLocation", self.checkpoint_dir
        )
        if processing_time is not None:
            writer = writer.trigger(processingTime=processing_time)
        elif available_now:
            writer = writer.trigger(availableNow=True)
        return writer.start()

    def run_until_idle(self) -> None:
        q = self.start(available_now=True)
        q.awaitTermination()

    def mirror_df(self):
        return self.sink.to_df()
