"""Batched Levenshtein distance on TPU.

Replaces the reference's per-solution edlib calls
(lib/DeNovoAssembler.cpp:41-55 NW mode; lib/BreakageScorer.cpp:41-55 HW mode)
with a batched DP over all solutions at once.

The row recurrence

    dp_new[j] = min(dp[j] + 1, dp[j-1] + sub_j, dp_new[j-1] + 1)

carries a sequential dependency on dp_new[j-1]. Setting
c[j] = min(dp[j]+1, dp[j-1]+sub_j) (c[0] = row boundary), the solution is

    dp_new[j] = min_{l <= j} (c[l] + (j - l)) = cummin(c[j] - j) + j

— an associative prefix-min, i.e. one vectorised `cummin` per target row
instead of an m-step serial loop. The batch dimension covers all solutions,
so each of the n sequential target steps does [B, M] vector work on the VPU.

Modes (edlib task naming):
  NW: global distance, answer dp_n[len_q].
  HW: infix — target prefix/suffix gaps free: row boundary 0, answer
      min over rows of dp_i[len_q].
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

BIG = jnp.int32(1 << 30)


@partial(jax.jit, static_argnames=("mode",))
def batched_levenshtein(
    queries: jnp.ndarray,  # [B, M] base codes (pad arbitrary)
    query_lens: jnp.ndarray,  # [B] int32
    target: jnp.ndarray,  # [N] base codes
    target_len: jnp.ndarray | int | None = None,
    mode: str = "NW",
) -> jnp.ndarray:
    """Edit distance of each query vs one shared target. Returns [B] int32.

    `target` may be padded; pass target_len for the true length (rows beyond
    it are skipped by masking their updates).
    """
    if mode not in ("NW", "HW"):
        raise ValueError(mode)
    B, M = queries.shape
    N = target.shape[0]
    if target_len is None:
        target_len = N
    target_len = jnp.asarray(target_len, dtype=jnp.int32)

    idx = jnp.arange(M + 1, dtype=jnp.int32)  # [M+1]
    dp0 = jnp.broadcast_to(idx, (B, M + 1)).astype(jnp.int32)
    q = queries.astype(jnp.int32)

    def row_step(carry, x):
        dp, best = carry
        t_char, i = x  # i is 1-based row index
        active = i <= target_len
        sub = (q != t_char).astype(jnp.int32)  # [B, M]
        c_mid = jnp.minimum(dp[:, 1:] + 1, dp[:, :-1] + sub)
        boundary = jnp.int32(0) if mode == "HW" else i
        c = jnp.concatenate(
            [jnp.full((B, 1), 0, dtype=jnp.int32) + boundary, c_mid], axis=1
        )
        dp_new = jax.lax.cummin(c - idx, axis=1) + idx
        dp = jnp.where(active, dp_new, dp)
        row_end = jnp.take_along_axis(dp, query_lens[:, None].astype(jnp.int32), axis=1)[:, 0]
        best = jnp.where(active, jnp.minimum(best, row_end), best)
        return (dp, best), None

    t = target.astype(jnp.int32)
    rows = jnp.arange(1, N + 1, dtype=jnp.int32)
    best0 = jnp.take_along_axis(dp0, query_lens[:, None].astype(jnp.int32), axis=1)[:, 0]
    (dp, best), _ = jax.lax.scan(row_step, (dp0, best0), (t, rows))
    if mode == "HW":
        return best.astype(jnp.int32)
    final = jnp.take_along_axis(dp, query_lens[:, None].astype(jnp.int32), axis=1)[:, 0]
    return final.astype(jnp.int32)


def batched_levenshtein_auto(
    queries: jnp.ndarray,
    query_lens: jnp.ndarray,
    target: jnp.ndarray,
    mode: str = "NW",
) -> jnp.ndarray:
    """Backend dispatch: the Myers bit-vector Pallas kernel on TPU (measured
    on v5e: 82 Gcell/s at 256x1024x1000, 800 Gcell/s at 2048x2048x50000 —
    2.7-26x the prefix-min kernel, ~100x the XLA scan), the scan elsewhere.
    `target` must be exact-length (unpadded)."""
    if jax.devices()[0].platform == "tpu":
        from genomeassembler_dev_tpu.ops.pallas.myers_kernel import (
            batched_levenshtein_myers,
        )

        return batched_levenshtein_myers(queries, query_lens, target, mode=mode)
    return batched_levenshtein(queries, query_lens, target, mode=mode)
