"""Persistent response cache: content-addressed, TTL'd, file-backed.

Reproduces the reference CacheManager semantics (src/shared/cache.ts:6-46):
``get(key)`` returns the stored value only while its TTL has not elapsed;
``set(key, value, ttl_ms)`` stores with an expiry stamp; the backend is
lazily initialized (cache.ts:25-45 lazy file|s3 init). Keys are the
``createCacheKey`` sha256 strings (functions.cachekey), so the on-disk
layout is content-addressed: ``root/<namespace>/<2-char shard>/<digest>``.

Differences from the reference, by design:
- values are serialized as a **fixed JSON envelope with base64 binary
  fields** — never pickle, so a tampered cache dir cannot execute code
  (same stance as the seen-set snapshots);
- an injectable ``clock`` (epoch ms callable) makes TTL expiry
  deterministic in tests (the reference uses Date.now);
- writes are atomic (temp file + rename), so concurrent fetch actors on
  one node — or across nodes on a shared filesystem — can share a cache
  without locking: last-writer-wins on identical content-addressed keys.

The reference's "cached fetch ~5 ms, re-runs skip fetched work" resume
semantics (README.md:554-557) carries over: the cache survives the
process, so a re-run's fetch stage probes it before any network work.
"""

from __future__ import annotations

import base64
import json
import os
import tempfile
import time


def _default_clock() -> int:
    return int(time.time() * 1000)


_B64_MARK = "__b64__"


def _encode(value):
    """JSON-safe deep encoding; bytes → {_B64_MARK: <base64>}."""
    if isinstance(value, (bytes, bytearray, memoryview)):
        return {_B64_MARK: base64.b64encode(bytes(value)).decode("ascii")}
    if isinstance(value, dict):
        return {k: _encode(v) for k, v in value.items()}
    if isinstance(value, (list, tuple)):
        return [_encode(v) for v in value]
    return value


def _decode(value):
    if isinstance(value, dict):
        if set(value.keys()) == {_B64_MARK}:
            return base64.b64decode(value[_B64_MARK])
        return {k: _decode(v) for k, v in value.items()}
    if isinstance(value, list):
        return [_decode(v) for v in value]
    return value


class FileCache:
    """TTL'd content-addressed file cache (cache.ts:6-46 semantics)."""

    def __init__(self, root: str, clock=None):
        self.root = root
        self.clock = clock or _default_clock
        self._initialized = False  # lazy backend init (cache.ts:25-45)

    def _ensure(self) -> None:
        if not self._initialized:
            os.makedirs(self.root, exist_ok=True)
            self._initialized = True

    def _path(self, key: str) -> str:
        # key = "<namespace>:<sha256hex>"; shard by the first 2 digest chars.
        # Components are sanitized to alphanumerics so a hostile key can
        # never traverse outside the cache root.
        namespace, _, digest = key.partition(":")
        namespace = "".join(
            c for c in (namespace or "default") if c.isalnum() or c in "-_"
        ) or "default"
        digest = "".join(c for c in (digest or "nokey") if c.isalnum()) or "nokey"
        return os.path.join(self.root, namespace, digest[:2], digest)

    def get(self, key: str):
        """Value if present and unexpired, else None (expired entries are
        deleted on read — cache.ts get() TTL check)."""
        path = self._path(key)
        try:
            with open(path, encoding="utf-8") as f:
                envelope = json.load(f)
        except (OSError, json.JSONDecodeError):
            return None
        expires = envelope.get("expires_at_ms")
        if expires is not None and self.clock() >= expires:
            try:
                os.unlink(path)
            except OSError:  # pragma: no cover - concurrent eviction
                pass
            return None
        return _decode(envelope["value"])

    def set(self, key: str, value, ttl_ms: int | None = None) -> None:
        """Store with TTL in ms (None → no expiry); atomic write."""
        self._ensure()
        path = self._path(key)
        os.makedirs(os.path.dirname(path), exist_ok=True)
        envelope = {
            "stored_at_ms": self.clock(),
            "expires_at_ms": (self.clock() + ttl_ms) if ttl_ms is not None else None,
            "value": _encode(value),
        }
        fd, tmp = tempfile.mkstemp(dir=os.path.dirname(path), suffix=".tmp")
        try:
            with os.fdopen(fd, "w", encoding="utf-8") as f:
                json.dump(envelope, f)
            os.replace(tmp, path)
        finally:
            if os.path.exists(tmp):  # pragma: no cover - replace failed
                os.unlink(tmp)

    def clear(self) -> None:
        import shutil

        if os.path.isdir(self.root):
            shutil.rmtree(self.root)
        self._initialized = False


class S3ObjectCache:
    """The reference's ``provider: 's3'`` cache backend
    (shared/cache.ts:25-45, shared/types.ts:177-186: CacheProviderConfig
    {provider, bucket, prefix, region}) behind the SAME envelope/TTL
    semantics as FileCache — interchangeable wherever a cache is injected.

    Storage is any boto3-shaped object-store client exposing
    ``get_object(Bucket=, Key=) -> {"Body": reader}``,
    ``put_object(Bucket=, Key=, Body=)`` and
    ``delete_object(Bucket=, Key=)``. The container has no AWS SDK or
    network, so ``client=None`` lazily imports boto3 (gated — raises a
    clear error here) and tests inject ``FakeS3Client`` (a dict-backed
    stand-in with the same call shapes). Keys are content-addressed:
    ``<prefix><namespace>/<2-char shard>/<digest>`` — identical layout to
    the file backend, so a cache migrates between providers by copy."""

    def __init__(self, bucket: str, prefix: str = "cache/", client=None,
                 clock=None, region: str | None = None):
        self.bucket = bucket
        self.prefix = prefix if (not prefix or prefix.endswith("/")) else prefix + "/"
        self.clock = clock or _default_clock
        self.region = region
        self._client = client
        self._initialized = client is not None  # lazy init (cache.ts:25-45)

    def _ensure(self):
        if not self._initialized:
            try:
                import boto3  # gated: not in this container

                self._client = boto3.client("s3", region_name=self.region)
            except ImportError as exc:  # pragma: no cover - env without boto3
                raise RuntimeError(
                    "S3ObjectCache needs an injected client (boto3 unavailable)"
                ) from exc
            self._initialized = True
        return self._client

    def _key(self, key: str) -> str:
        namespace, _, digest = key.partition(":")
        namespace = "".join(
            c for c in (namespace or "default") if c.isalnum() or c in "-_"
        ) or "default"
        digest = "".join(c for c in (digest or "nokey") if c.isalnum()) or "nokey"
        return f"{self.prefix}{namespace}/{digest[:2]}/{digest}"

    def get(self, key: str):
        client = self._ensure()
        okey = self._key(key)
        try:
            body = client.get_object(Bucket=self.bucket, Key=okey)["Body"].read()
            envelope = json.loads(body.decode("utf-8"))
        except Exception:  # missing key / malformed object → miss
            return None
        expires = envelope.get("expires_at_ms")
        if expires is not None and self.clock() >= expires:
            try:
                client.delete_object(Bucket=self.bucket, Key=okey)
            except Exception:  # pragma: no cover - concurrent eviction
                pass
            return None
        return _decode(envelope["value"])

    def set(self, key: str, value, ttl_ms: int | None = None) -> None:
        client = self._ensure()
        envelope = {
            "stored_at_ms": self.clock(),
            "expires_at_ms": (self.clock() + ttl_ms) if ttl_ms is not None else None,
            "value": _encode(value),
        }
        client.put_object(
            Bucket=self.bucket,
            Key=self._key(key),
            Body=json.dumps(envelope).encode("utf-8"),
        )

    def clear(self) -> None:  # pragma: no cover - test fakes clear directly
        raise NotImplementedError(
            "S3 cache clears via bucket lifecycle policies, not the client"
        )


class FakeS3Client:
    """Dict-backed boto3-shaped S3 client for tests and local dev — the
    same call subset S3ObjectCache uses. Lives here (not in tests/) so
    pipelines can run the s3 provider end-to-end without credentials."""

    class _Body:
        def __init__(self, data: bytes):
            self._data = data

        def read(self) -> bytes:
            return self._data

    def __init__(self):
        self.objects: dict[tuple[str, str], bytes] = {}

    def get_object(self, Bucket: str, Key: str):
        if (Bucket, Key) not in self.objects:
            raise KeyError(f"NoSuchKey: s3://{Bucket}/{Key}")
        return {"Body": self._Body(self.objects[(Bucket, Key)])}

    def put_object(self, Bucket: str, Key: str, Body: bytes):
        self.objects[(Bucket, Key)] = bytes(Body)
        return {}

    def delete_object(self, Bucket: str, Key: str):
        self.objects.pop((Bucket, Key), None)
        return {}


def make_cache(cache_dir: str | None, provider_config: dict | None = None,
               clock=None):
    """Provider-selecting factory — CacheManager.init (cache.ts:25-45) over
    CacheProviderConfig (types.ts:177-186): ``provider: 's3'`` routes to the
    object-store backend with ``bucket`` (required), ``prefix`` (default
    'cache/') and ``region``; anything else falls back to the file backend
    rooted at ``cache_dir``. A pre-built ``client`` in the config is passed
    through (tests inject FakeS3Client); absent that, boto3 is imported
    lazily on first use."""
    cfg = provider_config or {}
    if cfg.get("provider") == "s3":
        if not cfg.get("bucket"):
            raise ValueError("s3 cache provider requires a bucket")
        return S3ObjectCache(
            bucket=cfg["bucket"],
            prefix=cfg.get("prefix", "cache/"),
            client=cfg.get("client"),
            clock=clock,
            region=cfg.get("region"),
        )
    if cache_dir is None:
        raise ValueError("file cache provider requires cache_dir")
    return FileCache(cache_dir, clock=clock)
