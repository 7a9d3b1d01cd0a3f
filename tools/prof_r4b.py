"""Round-4b: in-step marginals of the dense walk sub-stages.

prof_r4 measured the walk's total marginal (13.9 ms of the 19.15 ms step)
but the sub-stage numbers (node table 4.0 / linkage 3.2 / chase 5.9 ms)
come from ISOLATED jits with a ~1 ms dispatch floor each and their inputs
materialized in HBM — the fused step fuses one-hot construction into dot
operand reads, so isolated numbers can wildly over/understate the true
marginal. This tool rebuilds the bench step with a `stop=` switch that
truncates contigs_dense after each sub-stage and measures the fused cost
of every prefix, giving exact in-step marginals.

Run on the TPU; results to stderr + studies/prof_r4b.log.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import time
from functools import partial

import numpy as np
import jax
import jax.numpy as jnp

from genomeassembler_dev_tpu.core.encoding import encode_dna
from genomeassembler_dev_tpu.core.querytable import load_default_query_table
from genomeassembler_dev_tpu.dbg.dense import PAD, _node_table_sorted
from genomeassembler_dev_tpu.ops.dedup import (
    dedup_with_counts, pack_read_codes, unpack_kmer_windows)
from genomeassembler_dev_tpu.ops.mxu import (
    bincount_mxu, compact_by_rank_mxu, permutation_gather_mxu,
    searchsorted_mxu)
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
    log(f"{label:46s} {t * 1e3:8.2f} ms/batch")
    return t


def contigs_trunc(kmer_codes, kmer_valid, k, max_len, max_walks,
                  node_cap=1024, stop="full", n_iters_override=None):
    """contigs_dense with a truncation point; mirrors dbg/dense.py."""
    V = 4 ** (k - 1)
    M = min(node_cap, V)
    max_walks = min(max_walks, 4 * M)

    nodes_c, c_nib, n_nodes = _node_table_sorted(kmer_codes, kmer_valid, k, M)
    node_ok = jnp.arange(M, dtype=jnp.int32) < n_nodes
    if stop == "table":
        return (nodes_c.sum(), n_nodes)

    bits_out = ((c_nib[:, None] >> jnp.arange(4)) & 1)
    bits_in = ((c_nib[:, None] >> (4 + jnp.arange(4))) & 1)
    out_deg_c = bits_out.sum(axis=1)
    in_deg_c = bits_in.sum(axis=1)
    branch_c = ((in_deg_c != 1) | (out_deg_c != 1)) & (out_deg_c > 0) & node_ok
    out0_c = (out_deg_c == 0) | ~node_ok
    succ_char = jnp.argmax(bits_out, axis=1).astype(jnp.int32)
    pred_char = jnp.argmax(bits_in, axis=1).astype(jnp.int32)

    succ_dense = jnp.where(node_ok & (out_deg_c == 1),
                           ((nodes_c << 2) | succ_char) & (V - 1), V)
    pred_dense = jnp.where(node_ok & (in_deg_c == 1),
                           (pred_char * V + nodes_c) >> 2, V)
    nodes_sorted = jnp.where(node_ok, nodes_c, jnp.int32(2**30))
    succ_c = jnp.where(succ_dense < V,
                       searchsorted_mxu(nodes_sorted, succ_dense), -1)
    pred_c = jnp.where(pred_dense < V,
                       searchsorted_mxu(nodes_sorted, pred_dense), -1)
    if stop == "linkage":
        return (succ_c.sum() + pred_c.sum(), n_nodes)

    nib_c = (bits_out == 1) & node_ok[:, None]
    char_c = (nodes_c & 3).astype(jnp.uint8)
    terminal = branch_c | out0_c
    self_idx = jnp.arange(M, dtype=jnp.int32)

    walk_slot_mask = (nib_c & branch_c[:, None]).reshape(M * 4)
    slot = jnp.arange(M * 4, dtype=jnp.int32)
    limbs = tuple((slot >> s) & 255
                  for s in range(0, max(1, (4 * M - 1).bit_length()), 8))
    compacted_w, n_walks = compact_by_rank_mxu(walk_slot_mask, limbs, max_walks)
    wsel = sum(c << (8 * i) for i, c in enumerate(compacted_w))
    wvalid = jnp.arange(max_walks, dtype=jnp.int32) < n_walks
    w_node = wsel >> 2
    w_char = (wsel & 3).astype(jnp.int32)
    w_prefix_code = nodes_c[w_node]
    w_start_dense = ((w_prefix_code << 2) | w_char) & (V - 1)
    w_start = jnp.where(wvalid, searchsorted_mxu(nodes_sorted, w_start_dense), -1)
    if stop == "walks":
        return (w_start.sum(), n_walks)

    head = ~terminal & ((pred_c < 0) | terminal[jnp.maximum(pred_c, 0)])
    up_ok = ~terminal & ~head & (pred_c >= 0)
    uptr = jnp.where(up_ok, jnp.maximum(pred_c, 0), self_idx)
    uoff = jnp.where(up_ok, 1, 0).astype(jnp.float32)

    n_iters = n_iters_override or max(1, min(max_len, M).bit_length())
    fM = float(M)
    for _ in range(n_iters):
        pk = uptr.astype(jnp.float32) * fM + uoff
        g = permutation_gather_mxu(pk[:, None], uptr)[:, 0]
        gp = jnp.floor(g / fM)
        uoff = uoff + (g - gp * fM)
        uptr = gp.astype(jnp.int32)
    uoff = uoff.astype(jnp.int32)
    if stop == "chase":
        return (uptr.sum() + uoff.sum(), n_walks)

    start_nonterm = wvalid & ~terminal[jnp.maximum(w_start, 0)]
    head_walk = jnp.full(M, -1, jnp.int32).at[
        jnp.where(start_nonterm, w_start, M)
    ].set(jnp.arange(max_walks, dtype=jnp.int32), mode="drop")

    flat = jnp.full(max_walks * max_len, PAD)
    OOB = jnp.int32(min(max_walks * max_len, 2**31 - 1))
    wid = head_walk[uptr]
    node_write = ~terminal & (wid >= 0)
    poss = jnp.minimum(k - 1 + uoff, max_len - 1)
    idx_i = jnp.where(node_write, wid * max_len + poss, OOB)
    flat = flat.at[idx_i].set(char_c, mode="drop")
    succ_cc = jnp.maximum(succ_c, 0)
    is_last = node_write & terminal[succ_cc]
    idx_l = jnp.where(
        is_last, wid * max_len + jnp.minimum(k + uoff, max_len - 1), OOB)
    flat = flat.at[idx_l].set(char_c[succ_cc], mode="drop")
    lrows = jnp.where(is_last, wid, max_walks)
    lens0 = jnp.zeros(max_walks, jnp.int32).at[lrows].set(k + 1 + uoff,
                                                          mode="drop")
    s_c = jnp.maximum(w_start, 0)
    start_term = wvalid & terminal[s_c]
    idx_t = jnp.where(
        start_term, jnp.arange(max_walks, dtype=jnp.int32) * max_len + (k - 1),
        OOB)
    flat = flat.at[idx_t].set(char_c[s_c], mode="drop")
    buf = flat.reshape(max_walks, max_len)
    cols = jnp.arange(k - 1, dtype=jnp.int32)
    shifts = 2 * (k - 2 - cols)
    prefix_chars = ((w_prefix_code[:, None] >> shifts[None, :]) & 3).astype(jnp.uint8)
    buf = buf.at[:, : k - 1].set(jnp.where(wvalid[:, None], prefix_chars, PAD))
    lens = jnp.where(wvalid, jnp.where(start_term, k, lens0), 0)
    return (jnp.where(wvalid, lens, 0).sum(), n_walks)


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

    def step(codes, valid, stop="full", n_iters_override=None):
        packed = pack_read_codes(codes, valid)
        ucodes, ucounts, n_u = dedup_with_counts(packed, U_CAP)
        uvalid = jnp.arange(U_CAP, dtype=jnp.int32) < n_u
        kc = unpack_kmer_windows(ucodes, READ_LEN, DBG_K)
        kv = jnp.broadcast_to(uvalid[:, None], kc.shape)
        w = contigs_trunc(kc, kv, DBG_K, MAX_LEN, MAX_WALKS, stop=stop,
                          n_iters_override=n_iters_override)
        oc = unpack_kmer_windows(ucodes, READ_LEN, 8)
        counts8 = bincount_mxu(
            oc.reshape(-1),
            jnp.broadcast_to(uvalid[:, None], oc.shape).reshape(-1),
            4 ** 8,
            jnp.broadcast_to(ucounts[:, None], oc.shape).reshape(-1),
            weight_bits=16)
        return w + (counts8.sum(),)

    ts = {}
    for stop in ("table", "linkage", "walks", "chase", "full"):
        f = jax.jit(jax.vmap(partial(step, stop=stop)))
        ts[stop] = bench(f, read_codes, read_valid, label=f"prefix thru {stop}")
    prev = None
    for stop in ("table", "linkage", "walks", "chase", "full"):
        if prev is not None:
            log(f"-> {stop} marginal: {(ts[stop] - ts[prev]) * 1e3:6.2f} ms")
        prev = stop

    # chase iteration-count sensitivity (10 is the shape default)
    for n in (10, 8, 6, 4):
        f = jax.jit(jax.vmap(partial(step, stop="chase", n_iters_override=n)))
        bench(f, read_codes, read_valid, label=f"thru chase, n_iters={n}")


if __name__ == "__main__":
    main()
