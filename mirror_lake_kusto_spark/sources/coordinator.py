"""Pluggable commit-coordinator clients (round 9).

PROTOCOL.md coordinated commits / catalog-managed tables: commits are
ratified by an external coordinator and land FIRST as staged files in
``_delta_log/_commits/<version>.<uuid>.json``; a background process
later BACKFILLS them into plain ``<version>.json``.  The backfilled
prefix is an ordinary immutable Delta log (served since round 8); the
staged-but-unbackfilled TAIL is only readable through the coordinator,
because the filesystem alone cannot tell a ratified staged commit from
a race loser's abandoned attempt.

This module is the seam: a table whose metaData declares a coordinator
name (``delta.coordinatedCommits.commitCoordinator[-preview]``) is
resolved against the registry below; a REGISTERED client serves the
ratified tail and the log readers in :mod:`delta_log` splice it in
transparently (``list_commit_versions`` / ``_commit_file``).  An
UNKNOWN coordinator keeps round 8's fail-closed staleness error —
guessing at ratification would serve torn snapshots.

Reference analogue surpassed: the reference has no coordinated-commit
support at all (TransactionLogEntry.cs:341-342 throws on any
unrecognized log shape).  The filesystem double mirrors delta-spark's
test-only "tracking" in-memory coordinator shape.
"""

from __future__ import annotations

import re

from . import fs as _fs

#: staged-commit directories (both spellings seen in the wild)
STAGED_COMMIT_DIRS = ("_commits", "_staged_commits")

_STAGED_RE = re.compile(r"^(\d{20})\.[0-9a-fA-F-]+\.json$")


def staged_files(table_path: str) -> dict[int, list[str]]:
    """version -> staged file names (relative to their staged dir,
    returned as ``<dir>/<name>`` relative to ``_delta_log``)."""
    out: dict[int, list[str]] = {}
    fs = _fs.get_fs(table_path)
    for d in STAGED_COMMIT_DIRS:
        p = _fs.join(table_path, "_delta_log", d)
        try:
            names = fs.listdir(p)
        except (FileNotFoundError, NotADirectoryError, OSError):
            continue
        for n in names:
            m = _STAGED_RE.match(n)
            if m:
                out.setdefault(int(m.group(1)), []).append(f"{d}/{n}")
    for v in out:
        out[v].sort()
    return out


class CommitConflict(Exception):
    """Another writer's staged commit was ratified for this version —
    rebase and retry at the next one."""


class CommitCoordinatorClient:
    """Reads need :meth:`get_commits` — the ratified staged commits at
    or past ``start_version``, as ``{version: path-under-_delta_log}``.
    Ratification is the coordinator's knowledge — the filesystem alone
    cannot provide it when writers race.  Writers additionally need
    :meth:`commit` — the arbitration point; clients that cannot
    arbitrate stay read-only and refuse."""

    def get_commits(
        self, table_path: str, start_version: int
    ) -> dict[int, str]:
        raise NotImplementedError

    def commit(self, table_path: str, version: int, rel_path: str) -> None:
        raise NotImplementedError(
            f"{type(self).__name__} is read-only: it cannot arbitrate "
            "which staged candidate wins a version; write through a "
            "TrackingCommitCoordinator (or another arbitrating client)"
        )


class FileSystemCommitCoordinator(CommitCoordinatorClient):
    """The filesystem-backed double (delta-spark's "tracking" shape
    reduced to what the staged directory can prove): a version with
    exactly ONE staged file is ratified-by-uniqueness; a version with
    several staged candidates is ambiguous and fails loudly instead of
    guessing the winner."""

    def get_commits(
        self, table_path: str, start_version: int
    ) -> dict[int, str]:
        out: dict[int, str] = {}
        for v, names in staged_files(table_path).items():
            if v < start_version:
                continue
            if len(names) > 1:
                raise ValueError(
                    f"coordinated table {table_path}: version {v} has "
                    f"{len(names)} staged candidates ({names}) — the "
                    "filesystem coordinator cannot tell the ratified "
                    "winner; use a tracking coordinator"
                )
            out[v] = names[0]
        return out


class TrackingCommitCoordinator(CommitCoordinatorClient):
    """In-memory coordinator: writers (or tests standing in for them)
    record each ratified commit explicitly via :meth:`ratify`; reads
    serve exactly the recorded map — racing losers' staged files are
    simply never ratified."""

    def __init__(self):
        import threading

        self._ratified: dict[str, dict[int, str]] = {}
        self._lock = threading.Lock()

    def ratify(self, table_path: str, version: int, rel_path: str) -> None:
        """Record ``rel_path`` (under ``_delta_log``) as the ratified
        commit for ``version`` — unconditional (test/admin override)."""
        with self._lock:
            self._ratified.setdefault(_norm(table_path), {})[
                version
            ] = rel_path

    def commit(self, table_path: str, version: int, rel_path: str) -> None:
        """Arbitrated write-side ratification: first staged candidate
        for a version wins; losers get CommitConflict and must rebase
        onto the winner and retry at the next version."""
        with self._lock:
            m = self._ratified.setdefault(_norm(table_path), {})
            if version in m:
                raise CommitConflict(
                    f"version {version} of {table_path} already "
                    f"ratified as {m[version]}"
                )
            m[version] = rel_path

    def get_commits(
        self, table_path: str, start_version: int
    ) -> dict[int, str]:
        with self._lock:
            m = dict(self._ratified.get(_norm(table_path), {}))
        return {v: p for v, p in m.items() if v >= start_version}


def _norm(table_path: str) -> str:
    import os

    return (
        table_path
        if _fs.scheme_of(table_path)
        else os.path.abspath(table_path)
    )


_REGISTRY: dict[str, CommitCoordinatorClient] = {
    # the filesystem double is safe to offer by default: it refuses
    # any shape it cannot prove (multiple candidates per version)
    "filesystem": FileSystemCommitCoordinator(),
}


def register_commit_coordinator(
    name: str, client: CommitCoordinatorClient
) -> None:
    _REGISTRY[name] = client


def unregister_commit_coordinator(name: str) -> None:
    _REGISTRY.pop(name, None)


def commit_coordinator_for(name: str | None) -> CommitCoordinatorClient | None:
    if name is None:
        return None
    return _REGISTRY.get(name)


#: normalized table path -> registered client name.  catalogManaged /
#: catalogOwned tables (round 10) carry NO coordinator name in their
#: metaData — the managing catalog is out-of-band knowledge (the spec
#: deliberately leaves it to the client's catalog configuration), so
#: the application binds a table to a registered client explicitly.
#: Unknown catalogs stay fail-closed (the r7/r8 staleness refusal).
_CATALOG_OF: dict[str, str] = {}


def register_catalog_table(table_path: str, client_name: str) -> None:
    """Declare ``client_name`` (a registered commit-coordinator client)
    as the managing catalog for ``table_path`` — the catalogManaged
    analogue of the metaData-declared coordinator name."""
    if client_name not in _REGISTRY:
        raise ValueError(
            f"no registered commit coordinator {client_name!r}; register "
            "one via register_commit_coordinator first"
        )
    _CATALOG_OF[_norm(table_path)] = client_name


def unregister_catalog_table(table_path: str) -> None:
    _CATALOG_OF.pop(_norm(table_path), None)


def catalog_for_table(table_path: str) -> str | None:
    return _CATALOG_OF.get(_norm(table_path))
