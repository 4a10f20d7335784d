"""Pluggable metadata store for the versioned-table commit protocol.

The versioned layer's whole correctness story reduces to ONE
primitive — ``atomic_create``: create this object if and only if it
does not exist, atomically and with full-content visibility (the
commit point, the OCC arbiter, the tag/branch create-once contract).
Everything else the metadata layer needs is plain GET / LIST /
DELETE. This module gives that surface two flavors:

- :class:`LocalStore` — POSIX: temp-write + fsync + ``os.link`` (the
  hard link fails with ``FileExistsError`` when the target exists —
  the same create-once contract as ``O_EXCL`` — and makes the
  complete bytes visible atomically; writing through an O_EXCL fd
  would expose the path before its bytes, a real torn-JSON failure
  observed under two-thread commit races).
- :class:`S3Store` — object stores: conditional PUT with
  ``If-None-Match: "*"`` (the public S3 conditional-write semantics,
  also the commit primitive Delta/Iceberg REST catalogs lean on);
  the PUT either materializes the full object or fails with
  ``PreconditionFailed`` — torn reads are impossible by the S3 data
  model, and the 412 maps to the same ``False`` the local flavor
  returns when it loses the race.

``store_for(path)`` dispatches on the URI scheme (``s3://`` /
``s3a://`` → :class:`S3Store`, anything else → :class:`LocalStore`)
so every metadata call site stays one-line. The boto3 client honors
``AWS_ENDPOINT_URL`` (moto in tests, MinIO/on-prem in production).

Out of scope by stated contract (raise with a clear message rather
than corrupt): branch roots on object stores — branches share the
main table's data directory via a symlink, which has no object-store
equivalent until publish-time path rewriting lands.
"""

from __future__ import annotations

import json
import os
import shutil
import uuid
from typing import Any
from urllib.parse import urlparse

__all__ = ["LocalStore", "S3Store", "store_for", "is_object_store"]


def is_object_store(path: str) -> bool:
    return path.startswith("s3://") or path.startswith("s3a://")


class LocalStore:
    """POSIX flavor — the exact semantics the protocol shipped with."""

    def atomic_create(self, path: str, payload: dict[str, Any]) -> bool:
        """Create ``path`` exclusively; False if another committer won."""
        tmp = f"{path}.{uuid.uuid4().hex[:12]}.tmp"
        with open(tmp, "w") as f:
            json.dump(payload, f)
            f.flush()
            os.fsync(f.fileno())
        try:
            os.link(tmp, path)
            return True
        except FileExistsError:
            return False
        finally:
            try:
                os.unlink(tmp)
            except FileNotFoundError:
                pass  # a concurrent vacuum's .tmp sweep won the unlink

    def put_json(self, path: str, payload: Any) -> None:
        """Atomic OVERWRITE (last writer wins, never torn)."""
        tmp = f"{path}.{uuid.uuid4().hex[:12]}.tmp"
        with open(tmp, "w") as f:
            json.dump(payload, f)
            f.flush()
            os.fsync(f.fileno())
        os.replace(tmp, path)

    def read_json(self, path: str) -> Any:
        with open(path) as f:
            return json.load(f)

    def exists(self, path: str) -> bool:
        return os.path.exists(path)

    def isdir(self, path: str) -> bool:
        return os.path.isdir(path)

    def list(self, d: str) -> list[str]:
        """Immediate child names; [] when the directory is absent."""
        try:
            return sorted(os.listdir(d))
        except (FileNotFoundError, NotADirectoryError):
            return []

    def remove(self, path: str) -> None:
        os.remove(path)

    def remove_if_exists(self, path: str) -> None:
        try:
            os.remove(path)
        except FileNotFoundError:
            pass

    def makedirs(self, d: str, exist_ok: bool = True) -> None:
        os.makedirs(d, exist_ok=exist_ok)

    def getmtime(self, path: str) -> float:
        return os.path.getmtime(path)

    def walk_files(self, root: str) -> list[str]:
        """Every file path under ``root``, absolute, sorted."""
        return sorted(
            os.path.join(r, f)
            for r, _d, fs in os.walk(root)
            for f in fs
        )

    def walk_files_mtimes(self, root: str) -> list[tuple[str, float]]:
        """(path, mtime) for every file under ``root``, sorted by
        path. scandir's cached DirEntry.stat makes the mtime free —
        the maintenance sweeps use this instead of walk_files + one
        getmtime per candidate (on S3 that would be one HEAD per
        object; here the listing already carries LastModified)."""
        out: list[tuple[str, float]] = []
        stack = [root]
        while stack:
            d = stack.pop()
            try:
                with os.scandir(d) as it:
                    for ent in it:
                        if ent.is_dir(follow_symlinks=False):
                            stack.append(ent.path)
                        elif ent.is_file(follow_symlinks=True):
                            out.append(
                                (ent.path, ent.stat().st_mtime)
                            )
            except (FileNotFoundError, NotADirectoryError):
                continue
        return sorted(out)

    def cleanup_empty_dirs(self, root: str) -> None:
        """Remove now-empty subdirectories bottom-up (never root)."""
        for r, _d, _f in os.walk(root, topdown=False):
            if r != root:
                try:
                    if not os.listdir(r):
                        os.rmdir(r)
                except OSError:
                    pass

    def remove_tree(self, root: str) -> None:
        shutil.rmtree(root, ignore_errors=True)


def _split_s3(path: str) -> tuple[str, str]:
    """(bucket, key) from an s3:// or s3a:// URI; key has no leading /."""
    u = urlparse(path)
    if u.scheme not in ("s3", "s3a"):
        raise ValueError(f"not an s3 path: {path!r}")
    return u.netloc, u.path.lstrip("/")


class S3Store:
    """Object-store flavor: conditional PUT as the commit primitive.

    One boto3 client per store instance (thread-safe per boto3's
    documented contract); endpoint/credentials flow from the standard
    env/config chain — ``AWS_ENDPOINT_URL`` points it at moto/MinIO.
    """

    def __init__(self) -> None:
        import boto3  # gated: only object-store roots need it

        self._c = boto3.client("s3")

    # -- primitive ----------------------------------------------------
    def atomic_create(self, path: str, payload: dict[str, Any]) -> bool:
        from botocore.exceptions import ClientError

        bucket, key = _split_s3(path)
        try:
            self._c.put_object(
                Bucket=bucket,
                Key=key,
                Body=json.dumps(payload).encode(),
                IfNoneMatch="*",
            )
            return True
        except ClientError as e:
            code = e.response.get("Error", {}).get("Code", "")
            # 412 = lost the create-once race; 409 = concurrent
            # conditional writers raced the same key (S3 returns
            # ConditionalRequestConflict — the caller re-reads and
            # retries, identical to losing)
            if code in (
                "PreconditionFailed",
                "ConditionalRequestConflict",
                "409",
            ):
                return False
            raise

    def put_json(self, path: str, payload: Any) -> None:
        bucket, key = _split_s3(path)
        self._c.put_object(
            Bucket=bucket, Key=key, Body=json.dumps(payload).encode()
        )

    def read_json(self, path: str) -> Any:
        from botocore.exceptions import ClientError

        bucket, key = _split_s3(path)
        try:
            body = self._c.get_object(Bucket=bucket, Key=key)["Body"]
            return json.loads(body.read())
        except ClientError as e:
            if e.response.get("Error", {}).get("Code") in (
                "NoSuchKey",
                "404",
            ):
                raise FileNotFoundError(path) from e
            raise

    def exists(self, path: str) -> bool:
        from botocore.exceptions import ClientError

        bucket, key = _split_s3(path)
        try:
            self._c.head_object(Bucket=bucket, Key=key)
            return True
        except ClientError as e:
            if e.response.get("Error", {}).get("Code") in ("404", "NoSuchKey"):
                return False
            raise

    def isdir(self, path: str) -> bool:
        """Any object under the prefix ⇒ the 'directory' exists."""
        bucket, key = _split_s3(path)
        prefix = key.rstrip("/") + "/"
        r = self._c.list_objects_v2(
            Bucket=bucket, Prefix=prefix, MaxKeys=1
        )
        return r.get("KeyCount", 0) > 0

    def list(self, d: str) -> list[str]:
        """Immediate child names (files AND 'subdirs'), like listdir."""
        bucket, key = _split_s3(d)
        prefix = key.rstrip("/") + "/"
        names: set[str] = set()
        token: str | None = None
        while True:
            kw = dict(Bucket=bucket, Prefix=prefix, Delimiter="/")
            if token:
                kw["ContinuationToken"] = token
            r = self._c.list_objects_v2(**kw)
            for o in r.get("Contents", []):
                names.add(o["Key"][len(prefix):])
            for p in r.get("CommonPrefixes", []):
                names.add(p["Prefix"][len(prefix):].rstrip("/"))
            if not r.get("IsTruncated"):
                break
            token = r.get("NextContinuationToken")
        return sorted(n for n in names if n)

    def remove(self, path: str) -> None:
        # os.remove raises on a missing path; S3 DELETE is idempotent.
        # The protocol's removes are all already-observed objects, so
        # mirroring the raise would cost a HEAD per delete for nothing.
        bucket, key = _split_s3(path)
        self._c.delete_object(Bucket=bucket, Key=key)

    remove_if_exists = remove

    def makedirs(self, d: str, exist_ok: bool = True) -> None:
        pass  # prefixes need no creation

    def getmtime(self, path: str) -> float:
        from botocore.exceptions import ClientError

        bucket, key = _split_s3(path)
        try:
            lm = self._c.head_object(Bucket=bucket, Key=key)[
                "LastModified"
            ]
        except ClientError as e:
            # os.path.getmtime raises OSError on a missing path;
            # callers guard with `except OSError` (racer-drained
            # intents, vacuum sweeps) — mirror the contract
            if e.response.get("Error", {}).get("Code") in (
                "404",
                "NoSuchKey",
            ):
                raise FileNotFoundError(path) from e
            raise
        return lm.timestamp()

    def walk_files(self, root: str) -> list[str]:
        return [p for p, _m in self.walk_files_mtimes(root)]

    def walk_files_mtimes(self, root: str) -> list[tuple[str, float]]:
        """(path, LastModified) straight from the listing — no
        per-object HEAD requests for the maintenance sweeps."""
        bucket, key = _split_s3(root)
        prefix = key.rstrip("/") + "/"
        scheme = urlparse(root).scheme
        out: list[tuple[str, float]] = []
        token: str | None = None
        while True:
            kw = dict(Bucket=bucket, Prefix=prefix)
            if token:
                kw["ContinuationToken"] = token
            r = self._c.list_objects_v2(**kw)
            out.extend(
                (
                    f"{scheme}://{bucket}/{o['Key']}",
                    o["LastModified"].timestamp(),
                )
                for o in r.get("Contents", [])
            )
            if not r.get("IsTruncated"):
                break
            token = r.get("NextContinuationToken")
        return sorted(out)

    def cleanup_empty_dirs(self, root: str) -> None:
        pass  # no directories to clean

    def remove_tree(self, root: str) -> None:
        bucket, _ = _split_s3(root)
        keys = [
            _split_s3(p)[1] for p in self.walk_files(root)
        ]
        for i in range(0, len(keys), 1000):
            self._c.delete_objects(
                Bucket=bucket,
                Delete={
                    "Objects": [{"Key": k} for k in keys[i : i + 1000]]
                },
            )


_LOCAL = LocalStore()
_S3: S3Store | None = None


def store_for(path: str):
    """The metadata store owning ``path``, by URI scheme."""
    if is_object_store(path):
        global _S3
        if _S3 is None:
            _S3 = S3Store()
        return _S3
    return _LOCAL
