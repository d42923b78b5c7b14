"""CROSS-TABLE atomic commit — the consistency level per-table
formats famously lack (a Delta/Iceberg commit is atomic per TABLE;
a pipeline that publishes `facts` and `summary` together can still
be read torn between them). This module adds the standard fix: a
tiny CATALOG POINTER file mapping table → manifest generation,
published with the same lock + tmp-file + atomic-rename protocol the
per-table manifest sink uses (``manifest_sink._commit_lock``), so
readers resolve EVERY table through one catalog version and can
never observe half of a multi-table publish.

Protocol (the two-phase shape production metastores use — Hive's
HMS transactions, Nessie/lakeFS catalog commits):

1. stage: each table's data commits through the ordinary
   ``mr_manifest`` sink — durable, time-travelable, but NOT yet
   visible to catalog readers (their view is pinned to the catalog's
   generation map);
2. publish: one lock-guarded atomic rename of ``_CATALOG`` flips
   every table's visible generation at once.

A crash (or failure) between 1 and 2 leaves stragglers as invisible
staged generations — readers keep the previous CONSISTENT pair, and
the next successful publish supersedes the staged state. The torn
window is exactly zero; crash-injection is tested in
tests/test_sources.py.

Scale note: the catalog file is O(#tables), not O(data); the
publish cost is one rename regardless of how many petabytes the
staged generations hold. Remote object stores need the conditional-
PUT seam exactly like the manifest sink (same ``_require_local``
guard, same ``objectstore.py`` CAS protocol upgrade path).
"""

from __future__ import annotations

import json
import os

from .manifest_sink import MANIFEST, _commit_lock, _require_local

CATALOG = "_CATALOG"


def _table_generation(table_dir: str) -> int:
    """Current committed generation of one mr_manifest table."""
    with open(os.path.join(table_dir, MANIFEST), encoding="utf-8") as fh:
        return json.load(fh)["generation"]


def read_catalog(base: str) -> dict:
    """The catalog document: {"version": V, "tables": {name: gen}}.
    Version 0 / empty tables if never published."""
    try:
        with open(os.path.join(base, CATALOG), encoding="utf-8") as fh:
            return json.load(fh)
    except FileNotFoundError:
        return {"version": 0, "tables": {}}


def publish_tables(base: str, table_names: list[str]) -> dict:
    """Atomically publish the CURRENT staged generation of every
    named table as one catalog version. Returns the new document.

    The lock serializes concurrent publishers (two pipelines
    publishing overlapping table sets); the rename makes the flip
    atomic for readers. Generations are read INSIDE the lock so a
    publisher can't capture a torn view of its own tables.
    """
    _require_local(base, "publish_tables")
    os.makedirs(base, exist_ok=True)
    with _commit_lock(base):
        doc = read_catalog(base)
        tables = dict(doc.get("tables", {}))
        for name in table_names:
            tables[name] = _table_generation(os.path.join(base, name))
        new = {"version": doc.get("version", 0) + 1, "tables": tables}
        tmp = os.path.join(base, f".{CATALOG}.tmp")
        with open(tmp, "w", encoding="utf-8") as fh:
            json.dump(new, fh)
        # versioned snapshot first (catalog time travel), then the flip
        snap = os.path.join(base, f"{CATALOG}.v{new['version']}")
        tmp_snap = f"{snap}.tmp"
        with open(tmp_snap, "w", encoding="utf-8") as fh:
            json.dump(new, fh)
        os.replace(tmp_snap, snap)
        os.replace(tmp, os.path.join(base, CATALOG))
        return new


def read_catalog_table(spark, base: str, name: str, version: int | None = None):
    """Read one table AS THE CATALOG SEES IT — pinned to the
    generation the (optionally time-traveled) catalog version maps
    it to, NOT the table's own latest manifest; staged-but-
    unpublished generations are invisible here by construction."""
    from .manifest_sink import read_manifest_table

    if version is None:
        doc = read_catalog(base)
    else:
        with open(
            os.path.join(base, f"{CATALOG}.v{version}"), encoding="utf-8"
        ) as fh:
            doc = json.load(fh)
    try:
        gen = doc["tables"][name]
    except KeyError:
        # Distinguish "staged but never published" (or a typo) from a
        # torn catalog — a bare KeyError('tables') read as a bug
        # report, not an answer.
        raise KeyError(
            f"table {name!r} not published in catalog at {base} "
            f"(published: {sorted(doc.get('tables', {}))})"
        ) from None
    return read_manifest_table(spark, os.path.join(base, name), as_of=gen)
