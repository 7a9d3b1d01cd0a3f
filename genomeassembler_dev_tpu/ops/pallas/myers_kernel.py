"""Myers bit-vector Levenshtein Pallas kernel (NW and HW modes).

Replaces the prefix-min row kernel (edit_distance_kernel.py) on the hot path:
instead of ~log2(M) masked roll-min passes over an [B, M+1] int32 DP row per
target char, each lane advances 32 DP cells per word-op (Myers 1999 bit
vectors, Hyyrö 2003 horizontal-delta form), so the per-target-char work drops
from O(M log M) int lanes to O(M/32) words.

Word-parallel twist: the classic multi-word ("block") algorithm chains words
sequentially through the horizontal delta (hin/hout in {-1,0,+1}) at each
word boundary. But hout depends on hin only through its *sign* (hin >= 0
leaves Eq unchanged; hin < 0 sets Eq bit 0 — the shifted-in bits affect only
the next column), so each word's hin->hout map is a 2-state boolean function,
and the whole chain resolves with a log2(W) parallel prefix of function
compositions. Every word then updates in parallel on the VPU.

Layout: state is [W, TB] uint32 — words on sublanes (rolls are sublane
rolls), queries on lanes (full 128-lane occupancy for TB >= 128).

Semantics match ops/edit_distance.batched_levenshtein exactly, i.e. edlib
NW/HW (lib/DeNovoAssembler.cpp:41-55, lib/BreakageScorer.cpp:41-55).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

import numpy as np

shr = jax.lax.shift_right_logical
# numpy scalar: folds into the kernel as a literal, not a captured jax array
MSB = np.uint32(0x80000000)


def _round_up(x: int, m: int) -> int:
    return -(-x // m) * m


def build_peq(queries: jnp.ndarray, W: int) -> jnp.ndarray:
    """[B, M] base codes -> Peq [4, W, B] uint32; bit i of word w is set iff
    query position 32w+i equals the base (pad positions match nothing)."""
    B, M = queries.shape
    pad = W * 32 - M
    q = jnp.pad(queries.astype(jnp.int32), ((0, 0), (0, pad)), constant_values=255)
    q = q.reshape(B, W, 32)
    weights = jnp.uint32(1) << jnp.arange(32, dtype=jnp.uint32)
    return jnp.stack([
        ((q == c).astype(jnp.uint32) * weights).sum(-1, dtype=jnp.uint32).T
        for c in range(4)
    ])  # [4, W, B]


def _kernel(peq_ref, qlen_ref, t_ref, out_ref, vp_ref, vn_ref, sc_ref, bs_ref,
            *, n_rows, mode, W, TB):
    qlen = qlen_ref[:].astype(jnp.int32)  # [1, TB]
    qm1 = jnp.maximum(qlen - 1, 0)
    wstar = qm1 >> 5
    bstar = (qm1 & 31).astype(jnp.uint32)  # [1, TB]
    iota_w = jax.lax.broadcasted_iota(jnp.int32, (W, TB), 0)
    sel_w = iota_w == wstar  # [W, TB] word holding the score bit
    top = iota_w == 0

    vp_ref[:] = jnp.full((W, TB), 0xFFFFFFFF, jnp.uint32)
    vn_ref[:] = jnp.zeros((W, TB), jnp.uint32)
    sc_ref[:] = qlen
    bs_ref[:] = qlen

    hin0_pos = mode == "NW"  # top-boundary horizontal delta: +1 NW, 0 HW
    n_scan = max(1, (W - 1).bit_length())

    def step(i, _):
        tc = t_ref[0, i]
        VP = vp_ref[:]
        VN = vn_ref[:]
        eq = peq_ref[0]
        for c in range(1, 4):
            eq = jnp.where(tc == c, peq_ref[c], eq)

        def flow(EqV):
            D0 = (((EqV & VP) + VP) ^ VP) | EqV | VN
            HP = VN | ~(D0 | VP)
            HN = VP & D0
            return D0, HP, HN

        # two variants of this column: hin >= 0 (Eq as-is) and hin < 0 (Eq|1)
        D0a, HPa, HNa = flow(eq)
        D0b, HPb, HNb = flow(eq | 1)

        # resolve the hin-sign chain: s_w = [hin_w < 0], s_{w+1} = s_w?B:A
        # (int32 0/1 masks: Mosaic cannot rotate i1 vectors)
        A = ((HNa & MSB) != 0).astype(jnp.int32)
        Bn = ((HNb & MSB) != 0).astype(jnp.int32)
        for sft in [1 << p for p in range(n_scan)]:
            A_prev = pltpu.roll(A, sft, 0)
            B_prev = pltpu.roll(Bn, sft, 0)
            valid = (iota_w >= sft).astype(jnp.int32)
            A_new = jnp.where((valid & A_prev) == 1, Bn, A)
            B_new = jnp.where((valid & B_prev) == 1, Bn, A)
            A, Bn = A_new, B_new
        # A[w] is now the hout sign of word w given s_0 = False (hin_0 is
        # never negative); hin sign of word w = hout sign of word w-1
        s = (pltpu.roll(A, 1, 0) == 1) & ~top

        D0 = jnp.where(s, D0b, D0a)
        HP = jnp.where(s, HPb, HPa)
        HN = jnp.where(s, HNb, HNa)

        # shifted-in bits: word w takes the MSB of word w-1 (word 0: boundary)
        hp_msb = shr(HP, np.uint32(31)).astype(jnp.int32)
        hin_pos = pltpu.roll(hp_msb, 1, 0) == 1
        hin_pos = (hin_pos & ~top) | (top if hin0_pos else jnp.zeros_like(top))
        HPs = (HP << 1) | hin_pos.astype(jnp.uint32)
        HNs = (HN << 1) | s.astype(jnp.uint32)
        vp_ref[:] = HNs | ~(D0 | HPs)
        vn_ref[:] = HPs & D0

        # score delta at pattern row qlen-1 (pre-shift HP/HN, bit bstar)
        dpos = ((shr(HP, bstar) & 1) != 0) & sel_w
        dneg = ((shr(HN, bstar) & 1) != 0) & sel_w
        sc = sc_ref[:] + dpos.any(0)[None, :].astype(jnp.int32) \
                       - dneg.any(0)[None, :].astype(jnp.int32)
        sc_ref[:] = sc
        if mode == "HW":
            bs_ref[:] = jnp.minimum(bs_ref[:], sc)
        return 0

    jax.lax.fori_loop(0, n_rows, step, 0)
    out_ref[:] = bs_ref[:] if mode == "HW" else sc_ref[:]


@partial(jax.jit, static_argnames=("mode", "block_b", "interpret"))
def batched_levenshtein_myers(
    queries: jnp.ndarray,  # [B, M] base codes (pad arbitrary)
    query_lens: jnp.ndarray,  # [B] int32
    target: jnp.ndarray,  # [N] base codes (exact length)
    mode: str = "NW",
    block_b: int = 1024,
    interpret: bool = False,
) -> jnp.ndarray:
    if mode not in ("NW", "HW"):
        raise ValueError(mode)
    B, M = queries.shape
    N = target.shape[0]
    W = max(1, -(-M // 32))
    # VMEM: ~18 live [W, TB] u32 buffers (4 peq + 2 state + temps); budget
    # 64MB of the 128MB VMEM (Mosaic's default 16MB scoped limit is raised
    # via compiler params below)
    fit = (64_000_000 // (18 * 4 * W)) // 128 * 128  # lane-dim multiple
    TB = max(128, min(block_b, fit))
    Bp = _round_up(B, TB)

    peq = jnp.zeros((4, W, Bp), jnp.uint32).at[:, :, :B].set(
        build_peq(queries, W))
    ql = jnp.zeros((1, Bp), jnp.int32).at[0, :B].set(query_lens.astype(jnp.int32))
    t = target.astype(jnp.int32)[None, :]

    out = pl.pallas_call(
        partial(_kernel, n_rows=N, mode=mode, W=W, TB=TB),
        out_shape=jax.ShapeDtypeStruct((1, Bp), jnp.int32),
        grid=(Bp // TB,),
        in_specs=[
            pl.BlockSpec((4, W, TB), lambda i: (0, 0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, TB), lambda i: (0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, N), lambda i: (0, 0), memory_space=pltpu.SMEM),
        ],
        out_specs=pl.BlockSpec((1, TB), lambda i: (0, i), memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((W, TB), jnp.uint32),
            pltpu.VMEM((W, TB), jnp.uint32),
            pltpu.VMEM((1, TB), jnp.int32),
            pltpu.VMEM((1, TB), jnp.int32),
        ],
        interpret=interpret,
        compiler_params=None if interpret else pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
    )(peq, ql, t)
    res = out[0, :B]
    # empty queries: NW distance = target length, HW distance = 0
    empty = query_lens.astype(jnp.int32) <= 0
    return jnp.where(empty, 0 if mode == "HW" else N, res)
