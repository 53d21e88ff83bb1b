"""Bloom-filter file skipping: a sidecar index for point lookups.

Min/max stats (``sources/skipping.py``) prune range predicates, but on
a high-cardinality column whose values are spread across every file
(ids, uuids, urls) the [min, max] interval of each file covers nearly
everything and equality lookups open the whole table.  A per-file Bloom
filter answers "could value v be in this file?" with no false
negatives, so a 100 TB point lookup opens only the handful of files
whose filter admits the value.  This is the public Databricks/Delta
Bloom-index design (a sidecar, not part of the transaction log) and
Parquet's own column-bloom concept lifted to file granularity; the
reference's analogue is Kusto's extent-level inverted term index.

Layout: ``<table>/_mlk_bloom/index.json`` —

    {"m": 8192, "k": 6, "columns": ["doc_id"],
     "files": {"part-....parquet": {"doc_id": "<base64 bitmap>"}}}

Design properties:

- **Advisory and stale-safe.**  Data files are immutable, so a sidecar
  entry keyed by path can never go wrong; files added AFTER the build
  simply have no entry and are always kept.  ``read_snapshot``
  re-applies the predicate as a row filter, so results are identical
  with the index present, absent, or stale.
- **Distributed build, bounded driver.**  Bit positions are computed
  JVM-side (sha2 double hashing as Spark SQL expressions — no Python
  in the scan), deduplicated per (file, column) by ``collect_set``
  (bounded by m bits), and streamed to the driver with
  ``toLocalIterator`` — the driver never holds more than one file's
  bitmap at a time.  At 100 TB the same build shards the sidecar by
  file-path prefix; the format is per-file, so sharding is trivial.
- **Deterministic cross-engine hashing.**  Positions derive from
  ``sha256(CAST(col AS STRING))`` — reproduced bit-for-bit in Python
  on the read side (``test_bloom_positions_jvm_python_identical``).
  Only string and integral columns are indexed: their CAST AS STRING
  rendering is canonical; floats/timestamps are not (formatting
  differs across engines).
"""

from __future__ import annotations

import base64
import hashlib
import json
import os
import urllib.parse
from typing import Any

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.types import (
    ByteType,
    IntegerType,
    LongType,
    ShortType,
    StringType,
    StructType,
)

_SIDE_DIR = "_mlk_bloom"
_INDEX = "index.json"

DEFAULT_M = 8192  # bits per (file, column) — 1 KiB
DEFAULT_K = 6  # ~2% FPR at 1000 distinct values per file

_INDEXABLE = (StringType, LongType, IntegerType, ShortType, ByteType)


def _positions_py(value: str, m: int, k: int) -> list[int]:
    """The k bit positions for ``value`` — double hashing over the
    sha256 hex digest, mirroring the JVM expression in the build."""
    hx = hashlib.sha256(value.encode("utf-8")).hexdigest()
    h1 = int(hx[0:15], 16) % m
    h2 = int(hx[15:30], 16) % m
    return [(h1 + i * (2 * h2 + 1)) % m for i in range(k)]


def _positions_sql(col: str, m: int, k: int) -> str:
    """Spark SQL producing the identical position array JVM-side."""
    sha = f"sha2(CAST(`{col}` AS STRING), 256)"
    h1 = f"(CAST(conv(substr({sha}, 1, 15), 16, 10) AS BIGINT) % {m})"
    h2 = f"(CAST(conv(substr({sha}, 16, 15), 16, 10) AS BIGINT) % {m})"
    return (
        f"transform(sequence(0, {k - 1}), "
        f"i -> ({h1} + i * (2 * {h2} + 1)) % {m})"
    )


def _bitmap_b64(positions: list[int], m: int) -> str:
    bits = bytearray((m + 7) // 8)
    for p in positions:
        bits[p >> 3] |= 1 << (p & 7)
    return base64.b64encode(bytes(bits)).decode("ascii")


def _bit_set(bitmap: bytes, p: int) -> bool:
    return bool(bitmap[p >> 3] & (1 << (p & 7)))


def build_bloom_index(
    spark: SparkSession,
    table_path: str,
    columns: list[str],
    m: int = DEFAULT_M,
    k: int = DEFAULT_K,
) -> str:
    """Build (or rebuild) the Bloom sidecar for ``columns`` over the
    CURRENT snapshot.  Returns the sidecar path.  Unsupported column
    types raise loudly — a silently unindexed column would make point
    lookups quietly unprunable."""
    from . import delta_log as DL

    files = DL.snapshot_files(spark, table_path)
    meta = DL.latest_metadata(spark, table_path)
    if meta is None:
        raise ValueError(f"no Delta table at {table_path}")
    schema = StructType.fromJson(json.loads(meta["schemaString"]))
    part_cols = set(meta.get("partitionColumns") or [])
    type_of = {f.name: f.dataType for f in schema.fields}
    for c in columns:
        if c not in type_of:
            raise ValueError(f"bloom column {c!r} not in schema")
        if c in part_cols:
            raise ValueError(
                f"bloom column {c!r} is a partition column — partition "
                "pruning already covers it"
            )
        if not isinstance(type_of[c], _INDEXABLE):
            raise ValueError(
                f"bloom column {c!r} has type {type_of[c].simpleString()}; "
                "only string/integral columns hash canonically"
            )

    index: dict[str, Any] = {"m": m, "k": k, "columns": list(columns)}
    file_maps: dict[str, dict[str, str]] = {}
    if files:
        paths = [os.path.join(table_path, f["path"]) for f in files]
        data_schema = StructType(
            [f for f in schema.fields if f.name not in part_cols]
        )
        df = (
            spark.read.schema(data_schema)
            .parquet(*paths)
            .withColumn("_mlk_file", F.input_file_name())
        )
        # map each file's ABSOLUTE location back to its stored path —
        # stored paths are table-relative normally but absolute for
        # shallow-cloned files, and the index must key by the stored
        # path either way (prune_files_bloom looks up f["path"])
        stored_by_abs = {
            os.path.abspath(os.path.join(table_path, f["path"])): f["path"]
            for f in files
        }
        for c in columns:
            grouped = (
                df.select(
                    "_mlk_file",
                    F.explode(F.expr(_positions_sql(c, m, k))).alias("_p"),
                )
                .groupBy("_mlk_file")
                .agg(F.collect_set("_p").alias("_ps"))
            )
            # one file's bitmap at a time on the driver.
            # input_file_name() returns a percent-encoded URI; unquote
            # and relativize against the table root for an O(1) match
            # per row (a suffix scan would be O(files) each)
            for row in grouped.toLocalIterator():
                p = urllib.parse.unquote(row["_mlk_file"])
                p = p[7:] if p.startswith("file://") else p.removeprefix(
                    "file:"
                )
                rel = stored_by_abs.get(os.path.abspath(p))
                if rel is None:
                    continue  # not a snapshot file — never index it
                file_maps.setdefault(rel, {})[c] = _bitmap_b64(
                    row["_ps"], m
                )
    index["files"] = file_maps

    side = os.path.join(table_path, _SIDE_DIR)
    os.makedirs(side, exist_ok=True)
    tmp = os.path.join(side, _INDEX + ".tmp")
    with open(tmp, "w") as fh:
        json.dump(index, fh)
    os.replace(tmp, os.path.join(side, _INDEX))  # atomic publish
    return os.path.join(side, _INDEX)


def load_bloom_index(table_path: str) -> dict | None:
    p = os.path.join(table_path, _SIDE_DIR, _INDEX)
    try:
        with open(p) as fh:
            idx = json.load(fh)
    except (OSError, ValueError):
        return None
    if not isinstance(idx, dict) or "files" not in idx:
        return None
    return idx


def prune_files_bloom(
    table_path: str,
    files: list[dict],
    predicate: str,
    schema: StructType,
) -> list[dict]:
    """Drop files whose Bloom filter PROVES an equality/IN conjunct
    cannot match.  Files without an index entry (added after the
    build, or never indexed) are always kept."""
    idx = load_bloom_index(table_path)
    if idx is None:
        return files
    from .skipping import parse_conjuncts

    m, k = int(idx["m"]), int(idx["k"])
    indexed = set(idx.get("columns") or [])
    type_of = {f.name: f.dataType for f in schema.fields}
    tests: list[tuple[str, list[list[int]]]] = []
    for c in parse_conjuncts(predicate, schema):
        if c.col not in indexed or not isinstance(
            type_of.get(c.col), _INDEXABLE
        ):
            continue
        if c.kind == "cmp" and c.op in ("=", "=="):
            vals = [c.values[0]]
        elif c.kind == "in":
            vals = list(c.values)
        else:
            continue
        # canonical strings must match CAST(col AS STRING): identity
        # for strings, decimal rendering for integrals
        strs = []
        ok = True
        for v in vals:
            if isinstance(v, bool) or not isinstance(v, (str, int)):
                ok = False
                break
            strs.append(v if isinstance(v, str) else str(v))
        if not ok or not strs:
            continue
        tests.append(
            (c.col, [_positions_py(s, m, k) for s in strs])
        )
    if not tests:
        return files

    kept = []
    for f in files:
        entry = idx["files"].get(f["path"])
        keep = True
        if entry:
            for col, value_positions in tests:
                b64 = entry.get(col)
                if not b64:
                    continue
                bitmap = base64.b64decode(b64)
                if len(bitmap) * 8 < m:
                    continue  # corrupt entry — advisory, keep
                # the conjunct can match only if SOME value might be
                # present (IN = disjunction); all-absent proves no row
                if not any(
                    all(_bit_set(bitmap, p) for p in ps)
                    for ps in value_positions
                ):
                    keep = False
                    break
        if keep:
            kept.append(f)
    return kept


def bloom_stats(table_path: str) -> dict | None:
    """Small observability helper: index parameters + coverage."""
    idx = load_bloom_index(table_path)
    if idx is None:
        return None
    return {
        "m": idx["m"],
        "k": idx["k"],
        "columns": idx.get("columns", []),
        "indexed_files": len(idx.get("files", {})),
    }
