"""Deterministic embedder (test mode) + pluggable batch-embedding UDF.

The reference calls a remote embedding API (`src/core/embedding/embedding.ts:
17-123`, batches of <=100, normalized when dim < 3072) and its tests swap in
random unit-normalized vectors (`tests/helpers/test-db.ts:127-149`). For
oracle-reproducible results we use the FIXTURES.md recipe instead: sha256 of
the text, bytes cycled into [-1, 1) floats, L2-normalized. Production would
swap `embed_series` for a real model call behind the same pandas_udf
signature — the Spark plan is identical either way (Arrow-batched, one model
call per batch, no per-row Python).
"""

from __future__ import annotations

import hashlib

import numpy as np
import pandas as pd
from pyspark.sql import functions as F
from pyspark.sql.types import ArrayType, FloatType

DEFAULT_DIM = 64  # matches the driver's embeddings.parquet test table


def embed_text(text: str, dim: int = DEFAULT_DIM) -> list[float]:
    """sha256-derived unit vector; deterministic across Python/Spark/oracle."""
    h = hashlib.sha256(text.encode("utf-8")).digest()
    raw = np.empty(dim, dtype=np.float64)
    for i in range(dim):
        b = bytes(h[(4 * i + j) % len(h)] for j in range(4))
        raw[i] = int.from_bytes(b, "big") / 2**31 - 1.0
    n = float(np.linalg.norm(raw))
    if n == 0.0:
        return [0.0] * dim
    return [float(x) for x in raw / n]


def embed_series(texts: pd.Series, dim: int = DEFAULT_DIM) -> pd.Series:
    """Vectorized batch embed — the slot where a real model call would go."""
    return texts.map(lambda t: embed_text(t if t is not None else "", dim))


def embed_udf(dim: int = DEFAULT_DIM):
    """Arrow-batched pandas_udf: STRING -> ARRAY<FLOAT>.

    Mirrors the reference's batched remote calls (<=100 texts/request) with
    Arrow batches; at 100 TB this runs one Python worker per core with
    columnar transfer, never per-row serialization.
    """

    @F.pandas_udf(ArrayType(FloatType()))
    def _embed(texts: pd.Series) -> pd.Series:
        return embed_series(texts, dim)

    return _embed
