"""Manifest storage adapters for the merge-on-read table layout.

``mor.py`` commits table state through a compare-and-swap so concurrent
writers can never tear the manifest.  Locally that CAS is an O_EXCL lock
around verify+rename; on an HTTP object store the SAME protocol is one
conditional PUT -- `If-Match: <etag>` to replace a specific committed
version, `If-None-Match: *` to create version 1 (S3 conditional writes /
any ETag-honouring store).  This module gives that backend a concrete
adapter behind a small Protocol, with the transport injectable so the
wire contract is testable without a network (the same discipline as
``functions.crypto.HttpKeyService``'s stubbed-transport tests).

The adapter carries only MANIFEST bytes.  Data files (parquet batches)
never need conditional writes: they land under unique names and are
invisible until a manifest commit references them.
"""

from __future__ import annotations

import json
from typing import Callable, Optional, Protocol

# transport signature: (method, url, headers, body) -> (status, headers, body)
Transport = Callable[
    [str, str, dict, Optional[bytes]], tuple[int, dict, Optional[bytes]]
]


class ManifestConflict(RuntimeError):
    """Another writer committed first: the store's precondition failed."""


class ManifestStore(Protocol):
    """Load/commit the committed table state with optimistic concurrency.

    ``load`` returns ``(state, token)`` -- token is whatever opaque value
    the backend needs to express "replace exactly the version I read"
    (an ETag for HTTP stores, the version number for the local lock
    store).  ``commit`` durably replaces the manifest iff the stored
    manifest still matches ``token``; raises :class:`ManifestConflict`
    otherwise, and returns the new token on success."""

    def load(self) -> tuple[Optional[dict], Optional[object]]: ...

    def commit(self, state: dict, token: Optional[object]) -> object: ...


class ConditionalPutManifestStore:
    """ManifestStore over an HTTP object store with conditional PUT.

    CAS wire shape:
      * read:   GET  <url>                      -> 200 body+ETag | 404
      * create: PUT  <url>  If-None-Match: *    -> 200/201 | 412 conflict
      * swap:   PUT  <url>  If-Match: <etag>    -> 200/204 | 412 conflict

    Each commit also lands an immutable ``.v{N}`` snapshot beside the
    manifest (unconditional PUT -- the versioned name is unique by
    construction) so time travel works identically to the local layout.
    """

    def __init__(self, manifest_url: str, transport: Transport | None = None):
        self._url = manifest_url
        self._transport = transport or _requests_transport

    def _versioned_url(self, version: int) -> str:
        return f"{self._url}.v{int(version)}"

    def load(self) -> tuple[Optional[dict], Optional[str]]:
        status, headers, body = self._transport("GET", self._url, {}, None)
        if status == 404:
            return None, None
        if status != 200:
            raise RuntimeError(f"manifest GET {self._url} -> {status}")
        etag = {k.lower(): v for k, v in headers.items()}.get("etag")
        return json.loads(body), etag

    def load_version(self, version: int) -> Optional[dict]:
        status, _, body = self._transport(
            "GET", self._versioned_url(version), {}, None
        )
        if status == 404:
            return None
        if status != 200:
            raise RuntimeError(f"manifest GET v{version} -> {status}")
        return json.loads(body)

    def commit(self, state: dict, token: Optional[str]) -> str:
        body = json.dumps(state).encode("utf-8")
        # immutable time-travel snapshot first: if the conditional swap
        # below loses its race, an orphan snapshot is harmless (unique
        # name, GC'd at compaction) -- the reverse order could commit a
        # manifest whose snapshot never landed
        status, _, _ = self._transport(
            "PUT",
            self._versioned_url(int(state["version"])),
            {"Content-Type": "application/json"},
            body,
        )
        if status not in (200, 201, 204):
            raise RuntimeError(f"manifest snapshot PUT -> {status}")
        precondition = (
            {"If-Match": token} if token is not None else {"If-None-Match": "*"}
        )
        status, headers, _ = self._transport(
            "PUT",
            self._url,
            {"Content-Type": "application/json", **precondition},
            body,
        )
        if status == 412:
            raise ManifestConflict(
                f"{self._url}: precondition {precondition} failed"
            )
        if status not in (200, 201, 204):
            raise RuntimeError(f"manifest PUT {self._url} -> {status}")
        return {k.lower(): v for k, v in headers.items()}.get("etag", "")


def cas_update(
    store: ManifestStore,
    mutate: Callable[[dict], dict],
    max_retries: int = 5,
) -> dict:
    """Optimistic-concurrency update loop shared by commuting commits
    (delta appends): load, mutate, commit; on conflict reload fresh state
    and re-apply.  ``mutate`` gets the loaded state (``{}``-normalised
    for a fresh table, never mutated in place) and returns the full next
    state including the bumped ``version``."""
    last: ManifestConflict | None = None
    for _ in range(max_retries):
        state, token = store.load()
        base = dict(state) if state else {"version": 0, "base": False, "deltas": []}
        nxt = mutate(base)
        try:
            store.commit(nxt, token)
            return nxt
        except ManifestConflict as exc:
            last = exc
    raise ManifestConflict(f"commit lost the race {max_retries} times: {last}")


def _requests_transport(
    method: str, url: str, headers: dict, body: Optional[bytes]
) -> tuple[int, dict, Optional[bytes]]:
    """Default transport for real deployments; import-gated like
    HttpKeyService (tests inject a stub instead)."""
    import requests

    resp = requests.request(method, url, headers=headers, data=body)
    return resp.status_code, dict(resp.headers), resp.content
