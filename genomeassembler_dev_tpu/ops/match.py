"""Exact read-in-solution matching on device.

The reference scorer does |solutions| x |distinct reads| naive
`std::string::find` calls (lib/DeNovoAssembler.cpp:354-360). Here every
solution window of read length is packed into ceil(R/16) uint32 words, and a
read matches at a window iff all words are equal — pure integer compares on
the VPU, batched over (solutions x windows x reads) with chunking over reads.
The *first* matching window per (solution, read) is returned, matching
`find`'s first-occurrence semantics.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from genomeassembler_dev_tpu.ops.windows import kmer_window_codes


def _window_words(path_codes: jnp.ndarray, read_len: int) -> jnp.ndarray:
    """Packed words of every read_len-window of each path.

    path_codes: [S, L] base codes (pad > 3). Returns [S, P, W] uint32 with
    P = L - read_len + 1, W = ceil(read_len/16). Windows containing pad
    bases never match (their packed word differs from any pure-ACGT word
    only if pad bits collide — so pad contributions are mapped to a
    sentinel word instead, see below).
    """
    S, L = path_codes.shape
    P = L - read_len + 1
    words = []
    n_words = -(-read_len // 16)
    for w in range(n_words):
        chars = min(16, read_len - 16 * w)
        codes, valid = kmer_window_codes(path_codes, chars, dtype=jnp.uint32)
        # window starting at p has word w covering [p+16w, p+16w+chars)
        start = 16 * w
        seg = codes[:, start : start + P]
        seg_valid = valid[:, start : start + P]
        shifted = seg << jnp.uint32(2 * (16 - chars))
        # invalid (pad-containing) windows get an impossible word: any value
        # with bits in the low 2*(16-chars) zone can't come from a read word
        # when chars < 16; when chars == 16 use all-ones + valid mask below.
        words.append(jnp.where(seg_valid, shifted, jnp.uint32(0xFFFFFFFF)))
    return jnp.stack(words, axis=-1)  # [S, P, W]


def _read_words(read_codes: jnp.ndarray) -> jnp.ndarray:
    """Packed words of each read: [R, Lr] -> [R, W] uint32, zero-padded tail."""
    from genomeassembler_dev_tpu.ops.windows import pack_words

    return pack_words(read_codes)


@partial(jax.jit, static_argnames=("read_chunk",))
def find_first_match(
    path_codes: jnp.ndarray,  # [S, L] base codes, pad > 3
    path_lens: jnp.ndarray,  # [S]
    read_codes: jnp.ndarray,  # [R, Lr] base codes (pure ACGT)
    read_valid: jnp.ndarray,  # [R] bool — slot actually holds a read
    read_chunk: int = 512,
):
    """First occurrence of each read in each path.

    Returns (found [S, R] bool, first_pos [S, R] int32). A read matches at
    window p iff p + Lr <= path_len and all packed words agree.
    """
    S, L = path_codes.shape
    R, Lr = read_codes.shape
    P = L - Lr + 1
    pw = _window_words(path_codes, Lr)  # [S, P, W]
    rw = _read_words(read_codes)  # [R, W]
    pos = jnp.arange(P, dtype=jnp.int32)
    in_range = pos[None, :] + Lr <= path_lens[:, None]  # [S, P]

    n_chunks = -(-R // read_chunk)
    pad_r = n_chunks * read_chunk - R
    # padding reads are excluded via the validity mask
    rw_p = jnp.pad(rw, ((0, pad_r), (0, 0)))
    rv_p = jnp.pad(read_valid, (0, pad_r))
    rw_c = rw_p.reshape(n_chunks, read_chunk, -1)
    rv_c = rv_p.reshape(n_chunks, read_chunk)

    def chunk_step(_, x):
        rwc, rvc = x  # [C, W], [C]
        eq = (pw[:, :, None, :] == rwc[None, None, :, :]).all(-1)  # [S, P, C]
        eq = eq & in_range[:, :, None] & rvc[None, None, :]
        found = eq.any(axis=1)  # [S, C]
        first = jnp.argmax(eq, axis=1).astype(jnp.int32)  # [S, C]
        return None, (found, first)

    _, (found_c, first_c) = jax.lax.scan(chunk_step, None, (rw_c, rv_c))
    # [n_chunks, S, C] -> [S, R]
    found = jnp.moveaxis(found_c, 0, 1).reshape(S, n_chunks * read_chunk)[:, :R]
    first = jnp.moveaxis(first_c, 0, 1).reshape(S, n_chunks * read_chunk)[:, :R]
    return found, first
