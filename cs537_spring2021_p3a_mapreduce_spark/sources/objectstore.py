"""Conditional-PUT commit protocol for object stores — the seam
``manifest_sink._require_local`` names, implemented against an
in-memory store double so the PROTOCOL is real and tested even
though no cloud SDK ships in this environment.

Object stores have no O_EXCL and no atomic rename; what they do
have (S3 ``If-None-Match: *`` / ``If-Match: <etag>``, GCS
``x-goog-if-generation-match``, ADLS ETag preconditions) is
compare-and-swap on a single key. That is exactly enough for a
manifest log:

- LOCK  = put-if-absent on a lock key (+ heartbeat re-put with
  etag match, mirroring the local mtime heartbeat);
- PUBLISH = put-if-match on the manifest key with the etag READ AT
  THE START of the commit — a concurrent committer that published
  first changes the etag and this commit RETRIES from a fresh read
  (the Delta log-version CAS / Iceberg catalog swap, minimal form).

``MemoryObjectStore`` implements the three primitives with their
real semantics (etags change on every successful put; conditional
failures raise ``PreconditionFailed``); a production deployment
swaps in a boto3/gcs client with the same three methods.
"""

from __future__ import annotations

import json
import threading
import uuid


class PreconditionFailed(Exception):
    """Conditional PUT lost the race (ETag/generation mismatch)."""


class MemoryObjectStore:
    """In-memory store with object-store CAS semantics: every
    successful put returns a fresh etag; conditional puts compare
    atomically under one lock (the store-side atomicity S3/GCS
    guarantee per key)."""

    def __init__(self) -> None:
        self._data: dict[str, tuple[bytes, str]] = {}
        self._mu = threading.Lock()

    def get(self, key: str) -> tuple[bytes | None, str | None]:
        with self._mu:
            if key not in self._data:
                return None, None
            body, etag = self._data[key]
            return body, etag

    def put_if_absent(self, key: str, body: bytes) -> str:
        with self._mu:
            if key in self._data:
                raise PreconditionFailed(f"{key} exists")
            etag = uuid.uuid4().hex
            self._data[key] = (body, etag)
            return etag

    def put_if_match(self, key: str, body: bytes, etag: str | None) -> str:
        """``etag=None`` means "expect absent" (create)."""
        with self._mu:
            cur = self._data.get(key)
            if etag is None:
                if cur is not None:
                    raise PreconditionFailed(f"{key} exists")
            elif cur is None or cur[1] != etag:
                raise PreconditionFailed(f"{key} etag mismatch")
            new_etag = uuid.uuid4().hex
            self._data[key] = (body, new_etag)
            return new_etag

    def delete(self, key: str) -> None:
        with self._mu:
            self._data.pop(key, None)


MANIFEST_KEY = "_MANIFEST"
_MAX_CAS_RETRIES = 16


def commit_files_conditional_put(
    store: MemoryObjectStore,
    files: list[dict],
    overwrite: bool = False,
) -> int:
    """Publish ``files`` into the store's manifest via the CAS loop;
    returns the committed generation. Safe under concurrent
    committers WITHOUT any lock: a lost CAS re-reads and re-merges,
    so no append is ever dropped (the lost-update the local sink's
    lock prevents is prevented here by the retry loop — the
    object-store-native shape)."""
    for _ in range(_MAX_CAS_RETRIES):
        body, etag = store.get(MANIFEST_KEY)
        if body is None:
            doc = {"generation": 1, "files": list(files)}
        else:
            prev = json.loads(body)
            merged = list(files) if overwrite else prev["files"] + list(files)
            doc = {"generation": prev["generation"] + 1, "files": merged}
        try:
            store.put_if_match(
                MANIFEST_KEY, json.dumps(doc).encode(), etag
            )
            return doc["generation"]
        except PreconditionFailed:
            continue  # someone else published; re-read and re-merge
    raise RuntimeError(f"manifest CAS lost {_MAX_CAS_RETRIES} races; giving up")


def read_committed_files(store: MemoryObjectStore) -> list[dict]:
    body, _ = store.get(MANIFEST_KEY)
    if body is None:
        return []
    return json.loads(body)["files"]
