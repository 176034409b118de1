"""Store-level metadata sidecar: dimension (and geometry) facts the
parquet footer cannot carry.

Parquet schemas type an embedding as ``array<double>`` with no length,
so every store whose search path indexes codes/embeddings by position
needs the dimension to validate queries against. Before round 12 each
search call paid one eager ``first()`` job to sample it; the write pass
now records it once in a ``_meta.json`` sidecar (underscore-prefixed, so
Spark's parquet listing ignores it) and searches read it driver-side —
zero extra Spark jobs per call.

Local/posix filesystems only (this harness's deployment); on an object
store or HDFS the same facts belong in catalog table properties — the
read falls back to ``None`` and callers keep their sampling guard as
the compatibility path, so pre-sidecar stores keep working.
"""

from __future__ import annotations

import json
import os
from typing import Any


def write_store_meta(path: str, **facts: Any) -> None:
    try:
        os.makedirs(path, exist_ok=True)
        with open(os.path.join(path, "_meta.json"), "w") as f:
            json.dump(facts, f)
    except OSError:
        # Non-posix path (e.g. a URI scheme): the sidecar is an
        # optimization; searches fall back to the sampling guard.
        pass


def read_store_meta(path: str) -> dict[str, Any] | None:
    try:
        with open(os.path.join(path, "_meta.json")) as f:
            return json.load(f)
    except (OSError, ValueError):
        return None
