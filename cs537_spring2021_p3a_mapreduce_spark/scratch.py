"""Process-lifetime scratch-space management.

Several query entries materialize intermediate artifacts on local
disk — re-exported text corpora, roundtrip CSV/JSON/parquet dirs,
streaming checkpoints, bucketed warehouse tables — and return
DataFrames that read those artifacts LAZILY (the driver collects
later), so nothing can be deleted inside the entry itself. Without
deferred cleanup every bench/gate session leaks its scratch into
/tmp and the warehouse monotonically.

``scratch_dir`` is the drop-in ``tempfile.mkdtemp`` replacement that
registers the directory for removal at interpreter exit — after the
driver has collected every DataFrame, and using pure-filesystem ops
so it works even once the JVM gateway is gone. ``cleanup_at_exit``
registers paths created elsewhere (e.g. managed-table directories
under the Spark warehouse; their catalog entries die with the
session's in-memory catalog, the files would not).
"""

from __future__ import annotations

import atexit
import shutil
import tempfile

_PATHS: list[str] = []


def scratch_dir(prefix: str) -> str:
    """mkdtemp + removal at process exit."""
    d = tempfile.mkdtemp(prefix=prefix)
    _PATHS.append(d)
    return d


def cleanup_at_exit(path: str) -> None:
    """Register an existing directory for removal at process exit."""
    _PATHS.append(path)


@atexit.register
def _cleanup() -> None:
    while _PATHS:
        shutil.rmtree(_PATHS.pop(), ignore_errors=True)
