"""k-mer counting on device.

Replaces the reference's `table()` counting and gtl hash maps
(lib/DeNovoAssembler.R:135-168, lib/DeNovoAssembler.cpp:324-337) with dense
scatter-adds into 4^k bins — the k=8 table is exactly 65,536 bins, a direct
array index.
"""

from __future__ import annotations


import jax.numpy as jnp


def count_kmers(codes: jnp.ndarray, valid: jnp.ndarray, num_bins: int,
                weights: jnp.ndarray | None = None) -> jnp.ndarray:
    """Histogram of k-mer codes: counts[num_bins] (float32 if weighted,
    int32 otherwise). Invalid entries are dropped."""
    flat = codes.reshape(-1)
    v = valid.reshape(-1)
    idx = jnp.where(v, flat, num_bins)  # out-of-range -> dropped
    if weights is None:
        w = v.astype(jnp.int32)
        out = jnp.zeros(num_bins, dtype=jnp.int32)
    else:
        w = jnp.where(v, weights.reshape(-1), 0)
        out = jnp.zeros(num_bins, dtype=w.dtype)
    return out.at[idx].add(w, mode="drop")


def count_kmers_batched(codes: jnp.ndarray, valid: jnp.ndarray, num_bins: int) -> jnp.ndarray:
    """Per-row histograms: codes [B, N] -> counts [B, num_bins] int32."""
    B = codes.shape[0]
    row = jnp.arange(B, dtype=jnp.int32)[:, None]
    idx = jnp.where(valid, codes, num_bins)
    out = jnp.zeros((B, num_bins), dtype=jnp.int32)
    return out.at[row, idx].add(valid.astype(jnp.int32), mode="drop")
