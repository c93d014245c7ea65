"""AES-CTR payload decryption + cached data-key service.

Semantics parity with the reference's DKS/crypto layer (steps/dks.py):
  * AES-CTR with the full 16-byte IV as the initial 128-bit counter block
    (reference steps/dks.py:124-134)
  * per-executor plaintext-key cache keyed by the encrypted data key, with
    hit/miss counters (reference steps/dks.py:96-116)
  * remote key service with bounded retry/backoff on 429/5xx
    (reference steps/dks.py:20-25,47-61)

The engine keeps the key service behind a small interface so tests and
local runs use a deterministic in-process implementation while production
points at an HTTPS endpoint.
"""

from __future__ import annotations

import base64
from typing import Optional, Protocol

try:
    from cryptography.hazmat.primitives.ciphers import Cipher, algorithms, modes

    HAVE_CRYPTO = True
except ImportError:  # pragma: no cover - crypto lib is present in CI image
    HAVE_CRYPTO = False


def aes_ctr_decrypt(ciphertext_b64: str, data_key_b64: str, iv_b64: str) -> str:
    """Decrypt base64 AES-CTR ciphertext to a UTF-8 string.

    The IV is the initial counter block: a big-endian 128-bit counter that
    increments per block, matching the reference's
    ``Counter.new(128, initial_value=int(iv))`` construction
    (reference steps/dks.py:124-134).
    """
    if not HAVE_CRYPTO:  # pragma: no cover
        raise NotImplementedError("cryptography package unavailable")
    key = base64.b64decode(data_key_b64)
    iv = base64.b64decode(iv_b64)
    ciphertext = base64.b64decode(ciphertext_b64)
    cipher = Cipher(algorithms.AES(key), modes.CTR(iv))
    decryptor = cipher.decryptor()
    return (decryptor.update(ciphertext) + decryptor.finalize()).decode("utf8")


def aes_ctr_decrypt_batch(
    ciphertexts: "list[bytes]", data_key: bytes, ivs: "list[bytes]"
) -> "list[bytes]":
    """Decrypt MANY same-key AES-CTR records with ONE cipher operation.

    CTR decryption is XOR with the keystream AES_ECB(counter blocks), so
    instead of constructing a Cipher per record (~10us of setup that
    dominates at log-record payload sizes) this builds every record's
    counter blocks vectorised in numpy -- 128-bit increments from each
    record's IV, with the same mod-2^128 wraparound as the streaming mode
    -- encrypts them in a single ECB pass, and XORs the concatenated
    ciphertexts in one vectorised sweep.  Byte-identical to per-record
    aes_ctr_decrypt (pinned by tests, including the wraparound edge);
    ~2.3x faster on 100k x 200 B batches."""
    if not HAVE_CRYPTO:  # pragma: no cover
        raise NotImplementedError("cryptography package unavailable")
    import numpy as np

    n = len(ciphertexts)
    if n == 0:
        return []
    lens = np.fromiter((len(ct) for ct in ciphertexts), dtype=np.int64, count=n)
    nblocks = (lens + 15) // 16
    iv_pairs = np.frombuffer(b"".join(ivs), dtype=">u8").reshape(-1, 2)
    base_hi = iv_pairs[:, 0].astype(np.uint64)
    base_lo = iv_pairs[:, 1].astype(np.uint64)
    total = int(nblocks.sum())
    rec_idx = np.repeat(np.arange(n), nblocks)
    starts = np.zeros(n, dtype=np.int64)
    np.cumsum(nblocks[:-1], out=starts[1:])
    k = (np.arange(total) - starts[rec_idx]).astype(np.uint64)
    lo = base_lo[rec_idx] + k  # wraps mod 2^64
    hi = base_hi[rec_idx] + (lo < k)  # carry; wraps mod 2^64 => mod 2^128 total
    blocks = np.empty((total, 2), dtype=">u8")
    blocks[:, 0] = hi
    blocks[:, 1] = lo
    keystream = (
        Cipher(algorithms.AES(data_key), modes.ECB()).encryptor().update(blocks.tobytes())
    )
    padded = b"".join(ct + b"\x00" * (-len(ct) % 16) for ct in ciphertexts)
    plain = (
        np.frombuffer(padded, dtype=np.uint8) ^ np.frombuffer(keystream, dtype=np.uint8)
    ).tobytes()
    offs = (starts * 16).tolist()
    ln = lens.tolist()
    return [plain[o : o + l] for o, l in zip(offs, ln)]


def aes_ctr_encrypt(plaintext: str, data_key_b64: str, iv_b64: str) -> str:
    """Inverse of aes_ctr_decrypt (CTR mode is symmetric); used by tests to
    build fixtures the same way the reference's test-vector generator does
    (reference steps/tests.py:23-46)."""
    if not HAVE_CRYPTO:  # pragma: no cover
        raise NotImplementedError("cryptography package unavailable")
    key = base64.b64decode(data_key_b64)
    iv = base64.b64decode(iv_b64)
    cipher = Cipher(algorithms.AES(key), modes.CTR(iv))
    encryptor = cipher.encryptor()
    return base64.b64encode(
        encryptor.update(plaintext.encode("utf8")) + encryptor.finalize()
    ).decode("ascii")


class KeyMaterialError(ValueError):
    """The key service answered but could not decrypt THIS record's key
    (refused key material) -- a per-record failure, distinct from the
    service being unreachable.  Subclasses ValueError so permissive-mode
    quarantine policy can treat it like any other bad-key-material error."""


class KeyService(Protocol):
    """Resolves an encrypted data key to its plaintext (base64)."""

    def decrypt_data_key(self, encrypted_key: str, key_encryption_key_id: str) -> str: ...


class IdentityKeyService:
    """Test/local key service: the 'encrypted' key IS the plaintext key,
    mirroring how the reference's unit tests mock DKS
    (reference steps/tests.py:49-73)."""

    def decrypt_data_key(self, encrypted_key: str, key_encryption_key_id: str) -> str:
        return encrypted_key


class HttpKeyService:
    """Remote key service over HTTPS POST with retry/backoff on transient
    statuses (reference steps/dks.py:47-94).  Import-gated: only needed in
    deployments with a real key server."""

    def __init__(
        self,
        decrypt_endpoint: str,
        correlation_id: str = "",
        certificates: Optional[tuple] = None,
        verify: object = True,
        retries: int = 3,
        backoff: float = 0.1,
    ):
        self._endpoint = decrypt_endpoint
        self._correlation_id = correlation_id
        self._certificates = certificates
        self._verify = verify
        self._retries = retries
        self._backoff = backoff
        self._session = None

    def _build_session(self):
        import requests
        from requests.adapters import HTTPAdapter
        from urllib3 import Retry

        session = requests.Session()
        adapter = HTTPAdapter(
            max_retries=Retry(
                total=self._retries,
                backoff_factor=self._backoff,
                status_forcelist=(429, 500, 502, 503, 504),
                allowed_methods=("POST", "GET"),
            )
        )
        # both schemes: production talks https, loopback integration
        # tests (and any sidecar deployment) talk plain http -- the retry
        # policy must apply identically
        session.mount("https://", adapter)
        session.mount("http://", adapter)
        return session

    def decrypt_data_key(self, encrypted_key: str, key_encryption_key_id: str) -> str:
        if self._session is None:
            self._session = self._build_session()
        response = self._session.post(
            url=self._endpoint,
            params={
                "keyId": key_encryption_key_id,
                "correlationId": self._correlation_id,
            },
            data=encrypted_key,
            cert=self._certificates,
            verify=self._verify,
        )
        content = response.json()
        if "plaintextDataKey" not in content:
            raise KeyMaterialError("key service returned no plaintextDataKey")
        return content["plaintextDataKey"]


# Per-Python-worker plaintext-key cache, namespaced by key-service class so
# differently-configured services never share entries.  MODULE-level on
# purpose: Spark's Arrow runner may rebuild UDF closures between batches, so
# closure state is not a reliable worker cache -- a module global imported
# once per worker process is (this is the engine's analogue of the
# reference's 'empty dict sent to each container', steps/ingesters.py:103).
_WORKER_KEY_CACHES: dict[str, dict[str, str]] = {}


def _worker_cache(namespace: str) -> dict[str, str]:
    return _WORKER_KEY_CACHES.setdefault(namespace, {})


class CachingKeyClient:
    """Executor-local key cache wrapper reproducing the reference's
    per-container caching with hit/miss observability
    (steps/ingesters.py:103-104, steps/dks.py:96-116).  Optional Spark
    accumulators surface hit/miss counts on the driver."""

    def __init__(self, service: KeyService, hit_acc=None, miss_acc=None, cache=None):
        self._service = service
        self._namespace = getattr(
            service, "cache_namespace", type(service).__qualname__
        )
        self._explicit_cache = cache
        self._hit_acc = hit_acc
        self._miss_acc = miss_acc
        self.hits = 0
        self.misses = 0

    @property
    def _cache(self) -> dict[str, str]:
        if self._explicit_cache is not None:
            return self._explicit_cache
        return _worker_cache(self._namespace)

    def data_key(self, encrypted_key: str, key_encryption_key_id: str) -> str:
        cached = self._cache.get(encrypted_key)
        if cached is not None:
            self.hits += 1
            if self._hit_acc is not None:
                self._hit_acc.add(1)
            return cached
        self.misses += 1
        if self._miss_acc is not None:
            self._miss_acc.add(1)
        plaintext = self._service.decrypt_data_key(encrypted_key, key_encryption_key_id)
        self._cache[encrypted_key] = plaintext
        return plaintext
