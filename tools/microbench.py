#!/usr/bin/env python
"""Stage-level microbenchmarks on the live TPU, to direct bench headroom work.

Measures, at the headline bench workload (256 segments x ~3.3k reads,
read_len 12, k=9):
  * each fused-step component in isolation: dedup (sort + compaction),
    dense dBG build (k9 presence histogram + compaction), doubling walk,
    octamer weighted bincount;
  * int8 vs bf16 MXU one-hot histograms;
  * the device-merge vs native-merge gap at study shape.

All timings use a host fetch of one output element as the sync point
(block_until_ready can return early on the tunneled backend).
"""
from __future__ import annotations

import os, sys
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import sys
import time

import numpy as np


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def timeit(fn, *args, reps=10):
    out = fn(*args)
    _fetch(out)
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        for _ in range(reps):
            out = fn(*args)
        _fetch(out)
        best = min(best, (time.perf_counter() - t0) / reps)
    return best


def _fetch(out):
    while isinstance(out, (tuple, list)):
        out = out[0]
    # slice ON DEVICE before the host fetch: np.asarray(whole) would drag
    # the full array over the ~25-50 MB/s tunnel and poison the timing
    if hasattr(out, "ravel"):
        out = out.ravel()[:1]
    np.asarray(out)


def main():
    import jax
    import jax.numpy as jnp

    from genomeassembler_dev_tpu.core.encoding import encode_dna
    from genomeassembler_dev_tpu.core.querytable import load_default_query_table
    from genomeassembler_dev_tpu.dbg.dense import contigs_dense
    from genomeassembler_dev_tpu.ops.dedup import (
        dedup_with_counts, pack_read_codes, unpack_kmer_windows)
    from genomeassembler_dev_tpu.ops.mxu import bincount_mxu, count_kmers_mxu
    from genomeassembler_dev_tpu.sim.reads import n_draws_for, simulate_reads
    from genomeassembler_dev_tpu.sim.segments import synthetic_genome

    dev = jax.devices()[0]
    log(f"device: {dev.platform} {dev}")

    B, SEQ_LEN, READ_LEN, COV, DBG_K = 256, 1000, 12, 40.0, 9
    MAX_WALKS, MAX_LEN, U_CAP = 256, SEQ_LEN + DBG_K, 1024
    N_DRAWS = n_draws_for(COV, SEQ_LEN, READ_LEN)
    table = load_default_query_table()
    probs8 = jnp.asarray(table.probs[8], jnp.float32)

    genomes = jnp.asarray(
        np.stack([encode_dna(synthetic_genome(i, SEQ_LEN)) for i in range(B)]))
    keys = jax.random.split(jax.random.key(0), B)
    sim = jax.jit(jax.vmap(
        lambda k, g: simulate_reads(k, g, probs8, READ_LEN, N_DRAWS)))
    rs = sim(keys, genomes)
    codes, valid = rs.codes, rs.valid
    jax.block_until_ready(codes)
    log(f"sim: {timeit(lambda: sim(keys, genomes).codes)*1e3:.2f} ms")

    # --- dedup ---------------------------------------------------------------
    pack = jax.jit(jax.vmap(pack_read_codes))
    packed = pack(codes, valid)
    log(f"pack: {timeit(lambda: pack(codes, valid))*1e3:.2f} ms")
    sort_only = jax.jit(jax.vmap(jnp.sort))
    log(f"dedup sort only: {timeit(lambda: sort_only(packed))*1e3:.2f} ms")
    dd = jax.jit(jax.vmap(lambda p: dedup_with_counts(p, U_CAP)))
    ded = dd(packed)
    log(f"dedup full (sort+counts+compact): {timeit(lambda: dd(packed))*1e3:.2f} ms")
    ucodes = ded[0]
    uvalid = jax.vmap(lambda n: jnp.arange(U_CAP, dtype=jnp.int32) < n)(ded[2])
    ucounts = ded[1]

    # --- k9 presence histogram ----------------------------------------------
    unp = jax.jit(jax.vmap(
        lambda u: unpack_kmer_windows(u, READ_LEN, DBG_K)))
    kc = unp(ucodes)
    kv = jnp.broadcast_to(uvalid[:, :, None], kc.shape)
    hist = jax.jit(jax.vmap(
        lambda c, v: count_kmers_mxu(c.reshape(-1), v.reshape(-1), DBG_K)))
    log(f"k9 histogram (bf16 mxu): {timeit(lambda: hist(kc, kv))*1e3:.2f} ms")

    # int8 variant
    def hist_i8(c, v):
        flat = c.reshape(-1)
        fv = v.reshape(-1)
        bits = 2 * DBG_K
        lo_bits = bits // 2
        H, L = 1 << (bits - lo_bits), 1 << lo_bits
        hi = (flat >> lo_bits).astype(jnp.int32)
        lo = (flat & (L - 1)).astype(jnp.int32)
        oh_hi = ((hi[:, None] == jnp.arange(H, dtype=jnp.int32)) &
                 fv[:, None]).astype(jnp.int8)
        oh_lo = (lo[:, None] == jnp.arange(L, dtype=jnp.int32)).astype(jnp.int8)
        return jnp.einsum("nh,nl->hl", oh_hi, oh_lo,
                          preferred_element_type=jnp.int32).reshape(H * L)

    hist8 = jax.jit(jax.vmap(hist_i8))
    a = np.asarray(hist(kc, kv))
    b = np.asarray(hist8(kc, kv))
    assert (a.astype(np.int64) == b.astype(np.int64)).all(), "int8 hist mismatch"
    log(f"k9 histogram (int8 mxu): {timeit(lambda: hist8(kc, kv))*1e3:.2f} ms")

    # --- octamer weighted bincount ------------------------------------------
    oc = jax.jit(jax.vmap(lambda u: unpack_kmer_windows(u, READ_LEN, 8)))(ucodes)
    ov = jnp.broadcast_to(uvalid[:, :, None], oc.shape)
    ow = jnp.broadcast_to(ucounts[:, :, None], oc.shape)
    bc = jax.jit(jax.vmap(
        lambda c, v, w: bincount_mxu(c.reshape(-1), v.reshape(-1), 4 ** 8,
                                     w.reshape(-1))))
    log(f"octamer weighted bincount (3 limbs): "
        f"{timeit(lambda: bc(oc, ov, ow))*1e3:.2f} ms")

    # --- fused dense dBG + walk ---------------------------------------------
    wk = jax.jit(jax.vmap(
        lambda c, v: contigs_dense(c, v, DBG_K, MAX_LEN, MAX_WALKS)))
    log(f"dense build+walk: {timeit(lambda: wk(kc, kv))*1e3:.2f} ms")

    # --- device vs native merge at study shape ------------------------------
    try:
        from genomeassembler_dev_tpu.merge import native
        from genomeassembler_dev_tpu.merge.device import assemble_device
        from genomeassembler_dev_tpu.dbg.assemble import contigs_from_read_codes

        contigs = contigs_from_read_codes(
            np.asarray(codes[0]), np.asarray(valid[0]), DBG_K, MAX_LEN)
        log(f"merge input: {len(contigs)} contigs")
        t0 = time.perf_counter()
        sol_n = native.assemble_native(contigs, DBG_K, 1234, 10000)
        t_native = time.perf_counter() - t0
        t0 = time.perf_counter()
        sol_d = assemble_device(contigs, DBG_K, 1234, 10000)
        t_dev1 = time.perf_counter() - t0
        t0 = time.perf_counter()
        sol_d = assemble_device(contigs, DBG_K, 1234, 10000)
        t_dev = time.perf_counter() - t0
        assert set(sol_n) == set(sol_d), "device merge != native merge"
        log(f"merge 10k orderings x {len(contigs)} contigs: native "
            f"{t_native*1e3:.1f} ms, device {t_dev*1e3:.1f} ms (cold "
            f"{t_dev1*1e3:.1f} ms) -> gap {t_dev/t_native:.1f}x")
    except Exception as e:
        log(f"merge comparison skipped: {e}")


if __name__ == "__main__":
    main()
