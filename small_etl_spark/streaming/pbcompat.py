"""Driver-side protobuf enablement for transformWithStateInPandas.

Spark 4's arbitrary-state-v2 API runs a protobuf protocol between the
JVM and Python state-server workers; ``google.protobuf`` must be
importable in the driver AND in every spawned worker. This module
makes that true in hermetic containers that ship no protobuf wheel but
do carry the pure-Python runtime inside the Google Cloud SDK, by

- appending the SDK platform dir to this process's ``sys.path`` and
  relaxing the gencode/runtime minor-version assertion (6.33 gencode
  on the SDK's 6.32 runtime — compatible for StateMessage, proven by
  the end-to-end test), and
- prepending ``_pb_shim/`` to ``$PYTHONPATH`` so its
  ``sitecustomize.py`` performs the same two steps inside every
  worker Python process the JVM spawns later.

Call :func:`enable_container_protobuf` BEFORE the first
``SparkSession`` is created: the JVM snapshots the environment at
launch, and worker PYTHONPATH derives from it.

With a real protobuf install (any cluster deploy) everything here is a
no-op that returns True immediately.
"""

from __future__ import annotations

import os
import sys

_SHIM_DIR = os.path.join(os.path.dirname(os.path.abspath(__file__)), "_pb_shim")


def _sdk_root() -> str | None:
    root = os.environ.get(
        "SPARK_GRAFT_PB_ROOT",
        "/usr/lib/google-cloud-sdk/platform/google_appengine",
    )
    if os.path.isfile(os.path.join(root, "google", "protobuf", "__init__.py")):
        return root
    return None


def _real_protobuf() -> bool:
    """True iff a REAL protobuf runtime imports. ``import
    google.protobuf`` alone is not a valid probe: Spark's
    spark-core jar sits on worker PYTHONPATHs and its
    ``google/protobuf/*.proto`` resource files satisfy that import as
    an empty PEP-420 namespace package. ``descriptor`` only exists in
    an actual runtime."""
    try:
        import google.protobuf.descriptor  # noqa: F401

        return True
    except ImportError:
        return False


def enable_container_protobuf() -> bool:
    """Make ``google.protobuf`` importable here and in future Spark
    workers. Returns True iff protobuf is (now) available."""
    if _real_protobuf():
        return True
    root = _sdk_root()
    if root is None:
        return False
    if root not in sys.path:
        sys.path.append(root)
    # Drop cached google modules ONLY when the cached top-level
    # package is the empty PEP-420 namespace portion (no __file__ —
    # Spark's jar resources). If a REAL google package is already
    # imported (google.cloud, google.auth, ...), purging it would
    # leave live references diverging from the re-imported modules;
    # in that case extend ITS __path__ with the SDK root instead so
    # google.protobuf resolves as a new subpackage without disturbing
    # the loaded ones.
    cached = sys.modules.get("google")
    if cached is not None and getattr(cached, "__file__", None) is None:
        for m in [
            m for m in sys.modules if m == "google" or m.startswith("google.")
        ]:
            del sys.modules[m]
    elif cached is not None:
        pkg_dir = os.path.join(root, "google")
        paths = list(getattr(cached, "__path__", []) or [])
        if pkg_dir not in paths:
            cached.__path__.append(pkg_dir)
    try:
        from google.protobuf import runtime_version as _rv

        _validate = _rv.ValidateProtobufRuntimeVersion

        def _lenient(gencode_domain, major, minor, *rest, **kw):  # noqa: ANN001
            # only waive the one proven-compatible pairing: 6.33
            # gencode (StateMessage) on this runtime's 6.x line; any
            # other mismatch keeps the upstream error behavior
            try:
                if (major, minor) == (_rv.MAJOR, _rv.MINOR) or (
                    major == _rv.MAJOR and minor in (_rv.MINOR, _rv.MINOR + 1)
                ):
                    return None
            except Exception:  # noqa: BLE001 - attr drift → strict path
                pass
            return _validate(gencode_domain, major, minor, *rest, **kw)

        _rv.ValidateProtobufRuntimeVersion = _lenient
        import google.protobuf.descriptor  # noqa: F401
    except Exception:  # noqa: BLE001 - any breakage means "not available"
        return False
    # future JVM/worker spawns import the sitecustomize shim
    existing = os.environ.get("PYTHONPATH", "")
    parts = existing.split(os.pathsep) if existing else []
    if _SHIM_DIR not in parts:
        os.environ["PYTHONPATH"] = (
            _SHIM_DIR + (os.pathsep + existing if existing else "")
        )
    return True
