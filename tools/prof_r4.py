"""Round-4 ablation profile of the headline bench step.

Measures the fused per-batch cost of the full step and of ablated variants
(no octamer bincount, no dBG walk, stages isolated WITHIN one jit), plus
candidate bincount formulations, to find where the remaining ~19 ms goes.
Run on the TPU; results to stderr + studies/prof_r4.log.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import time

import numpy as np
import jax
import jax.numpy as jnp

from genomeassembler_dev_tpu.core.encoding import encode_dna
from genomeassembler_dev_tpu.core.querytable import load_default_query_table
from genomeassembler_dev_tpu.dbg.dense import contigs_dense
from genomeassembler_dev_tpu.ops.dedup import (
    dedup_with_counts, pack_read_codes, unpack_kmer_windows)
from genomeassembler_dev_tpu.ops.mxu import bincount_mxu
from genomeassembler_dev_tpu.sim.reads import n_draws_for, simulate_reads
from genomeassembler_dev_tpu.sim.segments import synthetic_genome


def log(*a):
    print(*a, file=sys.stderr, flush=True)


B, SEQ_LEN, READ_LEN, COV, DBG_K = 256, 1000, 12, 40.0, 9
MAX_WALKS, MAX_LEN, U_CAP = 256, SEQ_LEN + DBG_K, 1024
N_DRAWS = n_draws_for(COV, SEQ_LEN, READ_LEN)


def bench(fn, *args, reps=10, groups=3, label=""):
    out = fn(*args)
    jax.block_until_ready(out)
    times = []
    for _ in range(groups):
        t0 = time.perf_counter()
        for _ in range(reps):
            out = fn(*args)
        _ = np.asarray(jax.tree_util.tree_leaves(out)[0]).ravel()[0]
        times.append((time.perf_counter() - t0) / reps)
    t = min(times)
    log(f"{label:42s} {t * 1e3:8.2f} ms/batch")
    return t


def main():
    table = load_default_query_table()
    probs8 = jnp.asarray(table.probs[8], jnp.float32)
    genomes = jnp.asarray(
        np.stack([encode_dna(synthetic_genome(i, SEQ_LEN)) for i in range(B)]))
    keys = jax.random.split(jax.random.key(0), B)
    sim = jax.jit(jax.vmap(
        lambda k, g: simulate_reads(k, g, probs8, READ_LEN, N_DRAWS)))
    rs = sim(keys, genomes)
    read_codes, read_valid = rs.codes, rs.valid
    jax.block_until_ready(read_codes)

    def stage_dedup(codes, valid):
        packed = pack_read_codes(codes, valid)
        return dedup_with_counts(packed, U_CAP)

    def full(codes, valid, with_walk=True, with_oct=True, with_dedup=True):
        packed = pack_read_codes(codes, valid)
        ucodes, ucounts, n_u = dedup_with_counts(packed, U_CAP)
        uvalid = jnp.arange(U_CAP, dtype=jnp.int32) < n_u
        outs = [n_u]
        if with_walk:
            kc = unpack_kmer_windows(ucodes, READ_LEN, DBG_K)
            kv = jnp.broadcast_to(uvalid[:, None], kc.shape)
            buf, lens, wvalid, overflow, n_walks, n_nodes = contigs_dense(
                kc, kv, DBG_K, MAX_LEN, MAX_WALKS)
            outs.append(jnp.where(wvalid, lens, 0).sum())
        if with_oct:
            oc = unpack_kmer_windows(ucodes, READ_LEN, 8)
            counts8 = bincount_mxu(
                oc.reshape(-1),
                jnp.broadcast_to(uvalid[:, None], oc.shape).reshape(-1),
                4 ** 8,
                jnp.broadcast_to(ucounts[:, None], oc.shape).reshape(-1),
                weight_bits=16)
            outs.append(counts8.sum())
        return tuple(outs)

    from functools import partial
    f_full = jax.jit(jax.vmap(full))
    f_nooct = jax.jit(jax.vmap(partial(full, with_oct=False)))
    f_nowalk = jax.jit(jax.vmap(partial(full, with_walk=False)))
    f_dedup = jax.jit(jax.vmap(stage_dedup))

    t_full = bench(f_full, read_codes, read_valid, label="full step")
    t_nooct = bench(f_nooct, read_codes, read_valid, label="no octamer bincount")
    t_nowalk = bench(f_nowalk, read_codes, read_valid, label="no dBG walk")
    t_dedup = bench(f_dedup, read_codes, read_valid, label="dedup only")
    log(f"-> octamer bincount marginal: {(t_full - t_nooct) * 1e3:.2f} ms")
    log(f"-> dBG walk marginal:         {(t_full - t_nowalk) * 1e3:.2f} ms")
    log(f"-> dedup(+pack) cost:         {t_dedup * 1e3:.2f} ms")

    # --- bincount variants (isolated, same inputs as the fused op) ----------
    packed = jax.jit(jax.vmap(pack_read_codes))(read_codes, read_valid)
    ucodes, ucounts, n_u = jax.jit(jax.vmap(
        lambda p: dedup_with_counts(p, U_CAP)))(packed)
    uvalid = jnp.arange(U_CAP, dtype=jnp.int32)[None, :] < n_u[:, None]
    oc = jax.jit(jax.vmap(
        lambda u: unpack_kmer_windows(u, READ_LEN, 8)))(ucodes)
    ocv = jnp.broadcast_to(uvalid[:, :, None], oc.shape)
    ocw = jnp.broadcast_to(ucounts[:, :, None], oc.shape)
    jax.block_until_ready((oc, ocv, ocw))
    F = oc.shape[1] * oc.shape[2]

    @jax.jit
    def var_current(oc, ocv, ocw):
        return bincount_mxu(oc.reshape(B, F), ocv.reshape(B, F), 4 ** 8,
                            ocw.reshape(B, F), weight_bits=16).sum()

    bench(var_current, oc, ocv, ocw, label="bincount: current 2-limb bf16")

    @jax.jit
    def var_f32w(oc, ocv, ocw):
        # single matmul, weight as full f32 on the hi one-hot, HIGHEST
        idx, v = oc.reshape(B, F), ocv.reshape(B, F)
        w = ocw.reshape(B, F)
        hi, lo = idx >> 8, idx & 255
        ih = jnp.arange(256, dtype=jnp.int32)
        oh_hi = ((hi[..., None] == ih) & v[..., None]).astype(jnp.float32) \
            * w[..., None].astype(jnp.float32)
        oh_lo = (lo[..., None] == ih).astype(jnp.bfloat16)
        return jnp.einsum("bnh,bnl->bhl", oh_hi, oh_lo,
                          preferred_element_type=jnp.float32,
                          precision=jax.lax.Precision.HIGHEST).sum()

    bench(var_f32w, oc, ocv, ocw, label="bincount: 1 matmul f32 weights")

    @jax.jit
    def var_split_lohi(oc, ocv, ocw):
        # weight limb0 on hi side, limb1 via a second dot pair — but put
        # limb1's 4-bit value on the LO side (values < 16, bf16-exact)
        idx, v = oc.reshape(B, F), ocv.reshape(B, F)
        w = ocw.reshape(B, F)
        hi, lo = idx >> 8, idx & 255
        ih = jnp.arange(256, dtype=jnp.int32)
        ohh = (hi[..., None] == ih) & v[..., None]
        ohl = (lo[..., None] == ih)
        a0 = ohh.astype(jnp.bfloat16) * (w & 255).astype(jnp.bfloat16)[..., None]
        b0 = ohl.astype(jnp.bfloat16)
        a1 = ohh.astype(jnp.bfloat16)
        b1 = ohl.astype(jnp.bfloat16) * (w >> 8).astype(jnp.bfloat16)[..., None]
        c0 = jnp.einsum("bnh,bnl->bhl", a0, b0,
                        preferred_element_type=jnp.float32)
        c1 = jnp.einsum("bnh,bnl->bhl", a1, b1,
                        preferred_element_type=jnp.float32)
        return (c0 + c1 * 256.0).sum()

    bench(var_split_lohi, oc, ocv, ocw, label="bincount: limb1 on lo side")

    # raw (pre-dedup) unweighted variant: more rows, one limb
    from genomeassembler_dev_tpu.ops.windows import kmer_window_codes

    @jax.jit
    def var_raw(codes, valid):
        ocr, vr = jax.vmap(lambda c: kmer_window_codes(c, 8))(
            codes.reshape(-1, READ_LEN))
        vv = vr & valid.reshape(-1)[:, None]
        N = codes.shape[0]
        return bincount_mxu(
            ocr.reshape(N, -1).reshape(B, -1),
            vv.reshape(B, -1), 4 ** 8).sum()

    try:
        bench(var_raw, read_codes.reshape(B, -1, READ_LEN), read_valid,
              label="bincount: raw reads unweighted")
    except Exception as e:
        log(f"raw variant failed: {e}")


if __name__ == "__main__":
    main()
