"""StreamReplica: continuous ROW-LEVEL replication of a Delta table —
the streaming twin of the batch pipeline's add/remove handling
(reference semantics: ``BlobLoadingOrchestration.cs:117-138``, which
replays removes batch-mode only; ``StreamingMirror`` deliberately
stays append-only because a plain stream cannot retract).

The round-10 change feed closed the gap's first half: the ``mlk_delta``
source in ``readChangeFeed`` mode synthesizes exact row-level
insert/delete rows from copy-on-write rewrites AND merge-on-read
deletion-vector deltas.  This class closes the second half: it
CONSUMES that feed and maintains a live replica WITH deletes via
foreachBatch MERGE.

Design:

- ``changeRowIds`` stamps every change row with its physical identity
  ``(_mlk_src_file, _mlk_src_row_idx)`` — the (base file,
  index-in-file) pair of Delta row tracking, synthesized for free
  because each change partition knows exactly which file rows it
  emits.  That pair is the MERGE key, so duplicate row VALUES
  replicate correctly and a delete targets exactly one replica row.
- Each micro-batch nets to the LAST change per identity (ordered by
  ``_commit_version``; within one commit an add wins over a remove of
  the same path, Delta's action-reconciliation rule), then lands as
  ONE atomic ``DeltaSink.merge``: net inserts upsert, net deletes ride
  ``delete_keys`` (whenMatchedDelete) — a delete of an identity that
  never landed (inserted and deleted inside one batch) is a no-op.
- The merge commit carries a ``txn`` action keyed on the epoch id, so
  a batch replayed after a crash is detected and skipped — the same
  exactly-once contract as StreamingMirror (I3;
  DeltaTableOrchestration.cs:85-133,181-200).
- A CDF-ENABLED source (``delta.enableChangeDataFeed``) streams its
  DML from ``_change_data`` files, whose rows carry values — no
  positional identity exists.  Passing ``key_cols`` switches to a
  VALUE-KEYED merge on that business key: ``update_postimage`` /
  ``insert`` upsert, ``update_preimage`` / ``delete`` delete (a
  key-preserving update's preimage is shadowed by its postimage in
  the same commit; a key-CHANGING update nets to delete(old key) +
  upsert(new key)).  NULL keys fail loud — merge equality cannot
  match them.  Without ``key_cols`` the positional mode's source-side
  refusal of ``_change_data`` commits is the documented fallback.

Scale shape: the per-batch window shuffles only the BATCH's change
rows (never the replica), and merge's probe/rewrite cost is
proportional to files touched — both independent of replica size.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import SparkSession, Window
from pyspark.sql.streaming import StreamingQuery

from ..sources import delta_log as DL
from ..sources.delta_sink import DeltaSink
from ..streaming.delta_source import (
    ROW_ID_FILE_COL,
    ROW_ID_IDX_COL,
    register_source,
)

_FEED_COLS = ("_change_type", "_commit_version", ROW_ID_FILE_COL, ROW_ID_IDX_COL)

#: replica-side table property pinning the source schemaString the
#: replica was built against — the diff base for rename/widen follow
_SRC_SCHEMA_PROP = "mlk.replica.sourceSchema"


class StreamReplica:
    def __init__(
        self,
        spark: SparkSession,
        source_path: str,
        target_path: str,
        checkpoint_dir: str,
        table_name: str = "replica",
        key_cols: "list[str] | None" = None,
    ):
        self.spark = spark
        self.source = source_path
        self.sink = DeltaSink(spark, target_path)
        self.checkpoint_dir = checkpoint_dir
        self.app_id = f"mlk-stream-replica:{table_name}"
        # VALUE-KEYED mode (round-12): a source table under
        # delta.enableChangeDataFeed writes _change_data files whose
        # rows carry VALUES, not positions — there is no positional
        # identity to mint, so changeRowIds refuses such commits
        # loudly (streaming/delta_source.py).  Ironically the tables
        # most likely to be replicated are CDF-enabled; a caller names
        # a business key instead and the merge keys on it.  Without a
        # key the positional mode stays the default and the source's
        # refusal is the documented loud fallback.
        if key_cols is not None:
            if not key_cols or not all(
                isinstance(k, str) and k for k in key_cols
            ):
                raise ValueError(
                    "key_cols must be a non-empty list of column "
                    f"names, got {key_cols!r}"
                )
            if set(key_cols) & set(_FEED_COLS):
                raise ValueError(
                    f"key_cols {sorted(set(key_cols) & set(_FEED_COLS))} "
                    "collide with the change-feed columns"
                )
        self.key_cols = list(key_cols) if key_cols else None
        register_source(spark)

    def _follow_additive_evolution(self, batch_df) -> None:
        """ADD-only schema follow (the streaming slice of the batch
        pipeline's evolve matrix): a source column added before a
        stream RESTART (the mlk_delta source fails loud on MID-stream
        evolution; the restart picks the new schema up) appends to the
        replica via evolve_add before the merge."""
        meta = DL.latest_metadata(self.spark, self.sink.path)
        if meta is None:
            return  # first batch creates the table with the new schema
        import json

        from pyspark.sql.types import StructType

        have = {f["name"] for f in json.loads(meta["schemaString"])["fields"]}
        new = [
            f
            for f in batch_df.schema.fields
            if f.name not in have and f.name not in _FEED_COLS
        ]
        if new:
            target = StructType.fromJson(json.loads(meta["schemaString"]))
            for f in new:
                target = target.add(f)
            self.sink.evolve_add(target.json())

    def _follow_source_evolution(self, batch_df) -> None:
        """RENAME / WIDEN follow across a stream restart (round-12:
        the r11 replica followed evolve_add only, so a source rename
        or type-widen stopped replication permanently — the restart
        re-failed in the merge forever).

        The replica records the source ``schemaString`` it was built
        against in its own table property ``mlk.replica.sourceSchema``;
        when the source's current metaData differs, the delta is
        diffed by COLUMN-MAPPING PHYSICAL IDENTITY (the same rule as
        the batch mirror's ``_rename_delta``, orchestrate.py — a
        rename never changes ``delta.columnMapping.physicalName``, and
        a field that lacked one takes its then-logical name at mapping
        enablement): surviving fields with a new logical name rename
        on the target via ``evolve_rename``, fields with a widened
        type follow via ``evolve_widen`` (its lossless-matrix check
        keeps an illegal source retype LOUD), and genuinely-new fields
        fall through to the additive follow.  A DROPPED source column
        stays loud by design.

        In-flight-batch guard: the stream's schema is pinned at start,
        so a batch generated BEFORE a newer source evolution carries
        the old shape while ``latest_metadata(source)`` is already
        ahead — evolving the target against that future schema would
        desynchronize it from the batch about to merge.  The follow
        only fires when the batch's own (name → dataType) map matches
        the current source schema; otherwise the source's mid-stream
        fingerprint guard is about to fail the stream loudly and the
        RESTART follows cleanly."""
        import json

        from pyspark.sql.types import StructType

        tgt_meta = DL.latest_metadata(self.spark, self.sink.path)
        if tgt_meta is None:
            return  # first batch creates the table; recorded post-merge
        src_meta = DL.latest_metadata(self.spark, self.source)
        if src_meta is None:
            return
        cur = src_meta["schemaString"]
        recorded = (tgt_meta.get("configuration") or {}).get(
            _SRC_SCHEMA_PROP
        )
        if recorded == cur:
            return
        cur_struct = StructType.fromJson(json.loads(cur))
        batch_types = {
            f.name: f.dataType
            for f in batch_df.schema.fields
            if f.name not in _FEED_COLS
        }
        if batch_types != {f.name: f.dataType for f in cur_struct.fields}:
            return  # in-flight batch predates a newer source schema
        if recorded is None:
            # pre-r12 replica (or creation-crash): start recording;
            # adds are handled by the additive follow as before
            self.sink.set_properties({_SRC_SCHEMA_PROP: cur})
            return

        def phys(f):
            return (f.get("metadata") or {}).get(
                "delta.columnMapping.physicalName", f["name"]
            )

        old_fields = json.loads(recorded)["fields"]
        new_by_phys = {phys(f): f for f in json.loads(cur)["fields"]}
        renames: dict[str, str] = {}
        widens: dict[str, str] = {}
        dropped: list[str] = []
        for f in old_fields:
            nf = new_by_phys.get(phys(f))
            if nf is None:
                dropped.append(f["name"])
                continue
            if nf["name"] != f["name"]:
                renames[f["name"]] = nf["name"]
            if nf["type"] != f["type"]:
                # keyed by the POST-rename logical name; evolve_widen's
                # widening-matrix check keeps illegal retypes loud
                widens[nf["name"]] = nf["type"]
        if dropped:
            raise ValueError(
                f"source {self.source} dropped column(s) "
                f"{sorted(dropped)}; StreamReplica follows rename/"
                "widen/add evolution only — drop the replica column "
                "by hand (sink.evolve_drop) and restart, or replicate "
                "into a fresh target"
            )
        tgt_names = {
            f["name"]
            for f in json.loads(tgt_meta["schemaString"])["fields"]
        }
        # filter to what the target actually carries: a column added
        # AND renamed/widened on the source before any of its data
        # reached the target arrives already-new (same rule as the
        # batch mirror's follow); crash-replay idempotence falls out —
        # an already-applied rename leaves old names absent
        target_renames = {
            o: n for o, n in renames.items() if o != n and o in tgt_names
        }
        if target_renames:
            self.sink.evolve_rename(target_renames)
            tgt_names = (tgt_names - set(target_renames)) | set(
                target_renames.values()
            )
        present_widens = {
            c: t for c, t in widens.items() if c in tgt_names
        }
        if present_widens:
            self.sink.evolve_widen(present_widens)
        self.sink.set_properties({_SRC_SCHEMA_PROP: cur})

    def _record_source_schema(self) -> None:
        """After the batch that CREATES the replica, pin the source
        schema it was built against (merge cannot carry properties;
        a crash between the two commits converges via the
        recorded-is-None fallback in _follow_source_evolution)."""
        tgt_meta = DL.latest_metadata(self.spark, self.sink.path)
        if tgt_meta is None:
            return
        if _SRC_SCHEMA_PROP in (tgt_meta.get("configuration") or {}):
            return
        src_meta = DL.latest_metadata(self.spark, self.source)
        if src_meta is None:
            return
        import json

        from pyspark.sql.types import StructType

        # same in-flight guard as _follow_source_evolution: only pin a
        # source schema whose logical shape the replica actually has —
        # recording a FUTURE schema would mark an evolution as
        # followed without applying it
        cur_struct = StructType.fromJson(
            json.loads(src_meta["schemaString"])
        )
        tgt_types = {
            f.name: f.dataType
            for f in StructType.fromJson(
                json.loads(tgt_meta["schemaString"])
            ).fields
            if f.name not in _FEED_COLS
        }
        if tgt_types == {f.name: f.dataType for f in cur_struct.fields}:
            self.sink.set_properties(
                {_SRC_SCHEMA_PROP: src_meta["schemaString"]}
            )

    def _apply_batch(self, batch_df, epoch_id: int) -> None:
        committed = DL.last_txn_version(self.spark, self.sink.path, self.app_id)
        if committed is not None and committed > epoch_id:
            # epoch ids are monotone within ONE streaming checkpoint;
            # a crash-replay re-delivers exactly the LAST epoch (==),
            # never an older one.  Strictly-behind means the query is
            # running against a RESET or foreign checkpoint over an
            # existing replica — every batch would be skipped as
            # "already landed" and the replica would silently freeze
            # while the query reports healthy progress (round-11
            # review).  Fail loud; replicate into a fresh target (or
            # keep the original checkpoint) instead.
            raise ValueError(
                f"replica txn ledger for {self.app_id!r} is at epoch "
                f"{committed} but this stream delivered epoch "
                f"{epoch_id}: the streaming checkpoint was reset or "
                f"replaced against an existing replica at "
                f"{self.sink.path}. Resume with the original "
                "checkpoint, or replicate into a fresh target"
            )
        if committed is not None and committed == epoch_id:
            return  # replayed epoch after restart: already landed (I3)
        self._follow_source_evolution(batch_df)
        self._follow_additive_evolution(batch_df)
        key = self.key_cols or [ROW_ID_FILE_COL, ROW_ID_IDX_COL]
        missing = [k for k in key if k not in batch_df.columns]
        if missing:
            raise ValueError(
                f"key_cols {missing} are not columns of the change "
                f"feed ({batch_df.columns})"
            )
        data_cols = [c for c in batch_df.columns if c not in _FEED_COLS]
        # net the batch to ONE change per row identity: the highest
        # _commit_version wins; within a single commit the upsert side
        # wins — positionally an insert and a delete of the same
        # identity only co-occur when a file is removed and re-added
        # in one commit (Delta's action reconciliation lets the add
        # win), and value-keyed an update's preimage/postimage pair
        # shares its key exactly when the key did NOT change, where
        # the postimage IS the surviving row.  A key-changing update
        # nets naturally: the old key's preimage (no postimage beside
        # it) deletes, the new key's postimage upserts.
        upsert_types = ("insert", "update_postimage")
        w = Window.partitionBy(*key).orderBy(
            F.desc("_commit_version"),
            F.desc(F.col("_change_type").isin(*upsert_types)),
        )
        last = (
            batch_df.withColumn("_rn", F.row_number().over(w))
            .filter("_rn = 1")
            .drop("_rn")
            .persist()
        )
        try:
            if self.key_cols is not None:
                # merge cannot match a NULL key (SQL equality), so a
                # null business key would silently strand its changes
                null_pred = " OR ".join(f"`{k}` IS NULL" for k in key)
                if last.filter(null_pred).limit(1).count():
                    raise ValueError(
                        f"change feed of {self.source} carries NULL "
                        f"values in key_cols {key}; a value-keyed "
                        "replica needs a total business key"
                    )
            sel = data_cols + [k for k in key if k not in data_cols]
            ups = last.filter(
                F.col("_change_type").isin(*upsert_types)
            ).select(*sel)
            dels = last.filter(
                ~F.col("_change_type").isin(*upsert_types)
            ).select(*key)
            # one atomic commit: upserts + matched-deletes + the epoch
            # txn marker (upsert/delete identity sets are disjoint by
            # the rn=1 net above, satisfying merge's contract)
            self.sink.merge(
                ups,
                key_cols=key,
                txn=(self.app_id, epoch_id),
                delete_keys=dels,
            )
        finally:
            last.unpersist()
        self._record_source_schema()

    def start(
        self,
        available_now: bool = True,
        processing_time: str | None = None,
    ) -> StreamingQuery:
        reader = (
            self.spark.readStream.format("mlk_delta")
            .option("path", self.source)
            .option("readChangeFeed", "true")
        )
        if self.key_cols is None:
            # positional identity; refuses _change_data commits loudly
            reader = reader.option("changeRowIds", "true")
        stream = reader.load()
        writer = stream.writeStream.foreachBatch(self._apply_batch).option(
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

    def replica_df(self):
        """The replicated table, row-identity plumbing dropped."""
        return self.sink.to_df().drop(ROW_ID_FILE_COL, ROW_ID_IDX_COL)
