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
    # drop any cached empty-namespace google modules so the SDK's
    # regular package wins the re-resolution
    for m in [m for m in sys.modules if m == "google" or m.startswith("google.")]:
        del sys.modules[m]
    try:
        from google.protobuf import runtime_version as _rv

        _rv.ValidateProtobufRuntimeVersion = lambda *a, **k: None
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
