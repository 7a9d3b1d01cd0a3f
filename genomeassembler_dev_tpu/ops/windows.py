"""Rolling k-mer window codes on device.

The reference extracts k-mers with vectorised `substring` in R
(lib/DeNovoAssembler.R:109-130) and hashes strings in C++; here a k-mer is an
integer built from 2-bit codes in k shifted adds — O(k) vector ops that XLA
fuses into a handful of VPU instructions, no strings anywhere.
"""

from __future__ import annotations

import jax.numpy as jnp


def kmer_window_codes(codes: jnp.ndarray, k: int, dtype=jnp.int32):
    """Big-endian codes of all k-length windows along the last axis.

    codes: [..., L] integer array with bases 0..3 (values > 3 = invalid/pad).
    Returns (window_codes [..., L-k+1] dtype, valid [..., L-k+1] bool).
    Windows touching an invalid base are marked invalid (their code is
    garbage; mask before use).
    """
    L = codes.shape[-1]
    n = L - k + 1
    if n <= 0:
        raise ValueError(f"sequence length {L} shorter than k={k}")
    base = codes.astype(dtype)
    valid_base = codes <= 3
    out = jnp.zeros(codes.shape[:-1] + (n,), dtype=dtype)
    valid = jnp.ones(codes.shape[:-1] + (n,), dtype=bool)
    for i in range(k):
        out = (out << 2) | (base[..., i : i + n] & 3)
        valid = valid & valid_base[..., i : i + n]
    return out, valid


def pack_words(codes: jnp.ndarray, word_bases: int = 16):
    """Pack 2-bit codes big-endian into uint32 words along the last axis,
    zero-padding the tail (device version of core.encoding.pack_words_np)."""
    L = codes.shape[-1]
    n_words = -(-L // word_bases)
    pad = n_words * word_bases - L
    c = codes.astype(jnp.uint32) & 3
    if pad:
        c = jnp.pad(c, [(0, 0)] * (c.ndim - 1) + [(0, pad)])
    c = c.reshape(c.shape[:-1] + (n_words, word_bases))
    shifts = jnp.arange(word_bases - 1, -1, -1, dtype=jnp.uint32) * 2
    return (c << shifts).sum(axis=-1, dtype=jnp.uint32)
