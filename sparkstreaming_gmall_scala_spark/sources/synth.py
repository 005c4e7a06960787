"""Deterministic synthetic fixtures the shipped testdata can't provide.

The driver's `embeddings.parquet` is near-uniform on the sphere, which
caps every pruning ANN index at its coverage fraction (RECALL.md): with
no cluster structure, probing 2 of 4 IVF cells cannot exceed ~0.5 recall
no matter how good the index is. Real embedding corpora are strongly
clustered, and the informative recall measurement needs data shaped like
them — so this module generates a mixture-of-Gaussians embedding table
with the SAME schema as the testdata (`vec_id long, embedding
array<float>, label int`), fully seeded (numpy PCG64 — bit-reproducible
for a fixed seed across platforms), no RNG at query time.

Generation is driver-side numpy (a test fixture, not an operator): the
largest fixture here is ~1 MB. The at-scale analog of "make clustered
vectors" is reading a real embedding column, which the ANN operators
already do.
"""

from __future__ import annotations

import os

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq


def clustered_embeddings_arrays(
    n: int = 4000,
    dim: int = 64,
    k_clusters: int = 8,
    sigma: float = 0.15,
    seed: int = 42,
) -> tuple[np.ndarray, np.ndarray]:
    """(vectors [n, dim] float32, labels [n] int32): k unit-norm cluster
    centers, each point = its center + N(0, sigma²) noise. With sigma
    well under the inter-center distance (random unit vectors in 64-d are
    near-orthogonal, pairwise distance ≈ √2), a point's true nearest
    neighbors are overwhelmingly intra-cluster — the structure a pruning
    index exploits on real corpora."""
    rng = np.random.default_rng(seed)
    centers = rng.standard_normal((k_clusters, dim))
    centers /= np.linalg.norm(centers, axis=1, keepdims=True)
    labels = np.arange(n, dtype=np.int32) % k_clusters
    noise = rng.standard_normal((n, dim)) * sigma
    vecs = (centers[labels] + noise).astype(np.float32)
    return vecs, labels


def write_clustered_embeddings(
    out_dir: str,
    n: int = 4000,
    dim: int = 64,
    k_clusters: int = 8,
    sigma: float = 0.15,
    seed: int = 42,
) -> str:
    """Write `{out_dir}/embeddings.parquet` shaped exactly like the
    testdata table, so every catalog ANN builder runs on it unchanged
    (they take an sf_dir and read only the embeddings table). Returns
    ``out_dir``. Idempotent: skips the write only when a params sidecar
    proves the existing file was generated with THESE parameters — a
    bare existence check would silently reuse a stale fixture after any
    default change (the same staleness the persisted ANN indexes guard
    with _params_key + data fingerprints)."""
    os.makedirs(out_dir, exist_ok=True)
    path = os.path.join(out_dir, "embeddings.parquet")
    params = f"n={n},dim={dim},k={k_clusters},sigma={sigma},seed={seed}"
    sidecar = os.path.join(out_dir, "_PARAMS")
    if os.path.exists(path) and os.path.exists(sidecar):
        with open(sidecar) as fh:
            if fh.read() == params:
                return out_dir
    vecs, labels = clustered_embeddings_arrays(n, dim, k_clusters, sigma, seed)
    table = pa.table(
        {
            "vec_id": pa.array(np.arange(len(vecs), dtype=np.int64)),
            "embedding": pa.array(
                [v for v in vecs.tolist()], type=pa.list_(pa.float32())
            ),
            "label": pa.array(labels, type=pa.int32()),
        }
    )
    pq.write_table(table, path)
    with open(sidecar, "w") as fh:
        fh.write(params)
    return out_dir
