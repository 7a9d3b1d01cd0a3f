"""Fused pointer-doubling chase as a Pallas TPU kernel.

The dense walker's upstream chase (dbg/dense.py) runs log2(M) pointer-
doubling iterations; as XLA ops each iteration writes its [B, M, L*C]
two-level-gather intermediate to HBM and reads it back — measured ~0.9 ms
per iteration for B=256, M=1024 on v5e, ~9 ms of the headline bench step.

This kernel keeps the whole chase in VMEM: per segment the (uptr, uoff)
state is two [M] registers, each iteration builds the [M, M] one-hot gather
matrix in VMEM and contracts it on the MXU, and only the final state touches
HBM. The one-hot compare is ~M^2 VPU ops/iteration — at M=1024 that is 1M
bf16 compares, far cheaper than the HBM round-trips it replaces.

Exactness: the MXU multiplies in bf16 (8-bit mantissa), so values are split
into 8-bit limbs before the contraction — the one-hot rows are exact 0/1,
each limb is an integer < 256 (bf16-exact), and each output cell accumulates
exactly one product in the f32 accumulator. uptr < M <= 2^16 and
uoff <= M cover two limbs each.

Semantics match the pure-XLA loop in dbg/dense.py / dbg/doubling.py:
  for _ in range(n_iters): uoff += uoff[uptr]; uptr = uptr[uptr]
(the parallel list-ranking of the reference's sequential walk,
lib/DeNovoAssembler.cpp:171-189).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl

# [M, M] bf16 one-hot + [M, M] int32 iota must fit VMEM (~16 MB/core)
MAX_KERNEL_M = 1024


_SEG_BLOCK = 8  # Mosaic needs the second-to-last block dim divisible by 8


def _kernel(uptr_ref, uoff_ref, optr_ref, ooff_ref, *, n_iters, M):
    iota = jax.lax.broadcasted_iota(jnp.int32, (M, M), 1)
    for s in range(_SEG_BLOCK):
        uptr = uptr_ref[s]  # [M] int32
        uoff = uoff_ref[s].astype(jnp.int32)  # [M] (f32 in HBM, int here)
        for _ in range(n_iters):
            onehot = (uptr[:, None] == iota).astype(jnp.bfloat16)  # [M, M]
            # limbs assembled in int32 2D then cast: Mosaic only supports
            # minor-dim insertion (1D -> [M, 1]) for 32-bit types
            vals_i = jnp.concatenate(
                [
                    (uptr >> 8)[:, None],
                    (uptr & 255)[:, None],
                    (uoff >> 8)[:, None],
                    (uoff & 255)[:, None],
                ],
                axis=1,
            )  # [M, 4] 8-bit limbs, exact in bf16
            g = jnp.dot(onehot, vals_i.astype(jnp.bfloat16),
                        preferred_element_type=jnp.float32)
            uptr = (g[:, 0] * 256.0 + g[:, 1]).astype(jnp.int32)
            uoff = uoff + (g[:, 2] * 256.0 + g[:, 3]).astype(jnp.int32)
        optr_ref[s] = uptr
        ooff_ref[s] = uoff.astype(jnp.float32)


@partial(jax.jit, static_argnames=("n_iters", "interpret"))
def doubling_chase(uptr: jnp.ndarray, uoff: jnp.ndarray, n_iters: int,
                   interpret: bool = False):
    """Batched fused pointer-doubling: uptr [B, M] int32 (self-loops at
    fixpoints), uoff [B, M] float32 (integers <= M). Returns (uptr', uoff')
    after n_iters doubling steps. M must be a multiple of 128 (lane width)
    and <= MAX_KERNEL_M (one-hot + iota VMEM residency)."""
    B, M = uptr.shape
    if M % 128:
        raise ValueError(f"M={M} must be a multiple of 128")
    if M > MAX_KERNEL_M:
        raise ValueError(f"M={M} exceeds kernel VMEM bound {MAX_KERNEL_M}")
    if B % _SEG_BLOCK:
        raise ValueError(f"B={B} must be a multiple of {_SEG_BLOCK}")
    grid = (B // _SEG_BLOCK,)
    spec = pl.BlockSpec((_SEG_BLOCK, M), lambda b: (b, 0))
    return pl.pallas_call(
        partial(_kernel, n_iters=n_iters, M=M),
        grid=grid,
        in_specs=[spec, spec],
        out_specs=[spec, spec],
        out_shape=[
            jax.ShapeDtypeStruct((B, M), jnp.int32),
            jax.ShapeDtypeStruct((B, M), jnp.float32),
        ],
        interpret=interpret,
    )(uptr, uoff)


def doubling_chase_auto(uptr: jnp.ndarray, uoff: jnp.ndarray, n_iters: int):
    """Kernel on TPU, interpret-mode elsewhere (same numerics)."""
    interpret = jax.devices()[0].platform != "tpu"
    return doubling_chase(uptr, uoff, n_iters, interpret=interpret)
