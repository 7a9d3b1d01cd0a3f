"""Pallas TPU kernel for batched Levenshtein distance (NW and HW modes).

Replaces the reference's per-solution edlib calls
(lib/DeNovoAssembler.cpp:41-55; lib/BreakageScorer.cpp:41-55 for HW) for the
hot path. Same prefix-min row recurrence as ops/edit_distance.py:

    c[j]      = min(dp[j] + 1, dp[j-1] + sub_j), c[0] = row boundary
    dp_new[j] = cummin(c[j] - j) + j

but with the whole N-row loop fused inside one kernel: the DP state lives in
VMEM scratch, the prefix-min is log2(M) masked roll-min passes on the VPU,
and there is no per-row dispatch/while-loop overhead. The batch dimension is
tiled over the grid; each tile keeps [TB, Mp] lanes busy.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

INF = 1 << 28  # plain int so it folds into the kernel, not a captured array


def _round_up(x: int, m: int) -> int:
    return -(-x // m) * m


def _kernel(q_ref, qlen_ref, t_ref, out_ref, dp_ref, *, n_rows, mode, m_pad):
    TB = q_ref.shape[0]
    Mp = q_ref.shape[1]  # padded query length + boundary column
    idx = jax.lax.broadcasted_iota(jnp.int32, (TB, Mp), 1)

    q = q_ref[:]  # [TB, Mp] query codes shifted right by one (col 0 unused)
    qlen = qlen_ref[:]  # [TB, 1]
    at_end = idx == qlen  # answer column mask per row

    dp_ref[:] = jnp.where(idx <= qlen, idx, INF)
    best0 = jnp.where(at_end, dp_ref[:], INF).min(axis=1, keepdims=True)
    out_ref[:] = best0

    n_scan = max(1, (m_pad - 1).bit_length())

    def row(i, best):
        t_char = t_ref[0, i - 1]
        dp = dp_ref[:]
        sub = (q != t_char).astype(jnp.int32)
        # c[j] = min(dp[j] + 1, dp[j-1] + sub_j); dp[-1] via roll+mask
        dp_left = pltpu.roll(dp, 1, 1)
        c = jnp.minimum(dp + 1, dp_left + sub)
        boundary = jnp.int32(0) if mode == "HW" else i
        c = jnp.where(idx == 0, boundary, c)
        # prefix-min of (c - j) via log-shift passes
        y = c - idx
        for s in [1 << p for p in range(n_scan)]:
            shifted = pltpu.roll(y, s, 1)
            y = jnp.minimum(y, jnp.where(idx >= s, shifted, INF))
        dp_new = y + idx
        dp_new = jnp.where(idx <= qlen, dp_new, INF)
        dp_ref[:] = dp_new
        row_end = jnp.where(at_end, dp_new, INF).min(axis=1, keepdims=True)
        return jnp.minimum(best, row_end) if mode == "HW" else row_end

    best = jax.lax.fori_loop(1, n_rows + 1, row, best0)
    out_ref[:] = best


@partial(jax.jit, static_argnames=("mode", "block_b", "interpret"))
def batched_levenshtein_pallas(
    queries: jnp.ndarray,  # [B, M] base codes (pad arbitrary)
    query_lens: jnp.ndarray,  # [B] int32
    target: jnp.ndarray,  # [N] base codes (exact length)
    mode: str = "NW",
    block_b: int = 128,
    interpret: bool = False,
) -> jnp.ndarray:
    if mode not in ("NW", "HW"):
        raise ValueError(mode)
    B, M = queries.shape
    N = target.shape[0]
    Mp = _round_up(M + 1, 128)
    # VMEM budget: ~5 live [block_b, Mp] i32 buffers must fit in ~12MB
    fit = max(8, (12_000_000 // (5 * 4 * Mp)) // 8 * 8)
    block_b = min(block_b, fit)
    Bp = _round_up(B, block_b)

    # column j of the DP corresponds to query char j-1: shift queries right
    qs = jnp.full((Bp, Mp), 255, jnp.int32)
    qs = qs.at[:B, 1 : M + 1].set(queries.astype(jnp.int32))
    ql = jnp.zeros((Bp, 1), jnp.int32).at[:B, 0].set(query_lens.astype(jnp.int32))
    t = target.astype(jnp.int32)[None, :]  # [1, N]

    out = pl.pallas_call(
        partial(_kernel, n_rows=N, mode=mode, m_pad=Mp),
        out_shape=jax.ShapeDtypeStruct((Bp, 1), jnp.int32),
        grid=(Bp // block_b,),
        in_specs=[
            pl.BlockSpec((block_b, Mp), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((block_b, 1), lambda i: (i, 0), memory_space=pltpu.VMEM),
            # target chars are read one scalar per row step -> SMEM
            pl.BlockSpec((1, N), lambda i: (0, 0), memory_space=pltpu.SMEM),
        ],
        out_specs=pl.BlockSpec((block_b, 1), lambda i: (i, 0), memory_space=pltpu.VMEM),
        scratch_shapes=[pltpu.VMEM((block_b, Mp), jnp.int32)],
        interpret=interpret,
    )(qs, ql, t)
    return out[:B, 0]
