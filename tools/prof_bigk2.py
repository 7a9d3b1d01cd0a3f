#!/usr/bin/env python
"""Instrument contigs_big_k internals at BASELINE config-1 shape."""
import os, sys
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import time
from functools import partial

import numpy as np
import jax
import jax.numpy as jnp

from genomeassembler_dev_tpu.core.querytable import load_default_query_table
from genomeassembler_dev_tpu.core.encoding import encode_dna
from genomeassembler_dev_tpu.sim.reads import generate_reads
from genomeassembler_dev_tpu.sim.segments import synthetic_genome
from genomeassembler_dev_tpu.dbg.big_k import (
    kmer_pair_codes, pair_shift_right2, pair_mask_low, _rank_join)
from genomeassembler_dev_tpu.dbg.doubling import walk_contigs_doubling

U32 = (1 << 32) - 1


def bench(name, f, *a, reps=3):
    out = f(*a)
    o = out
    while isinstance(o, (tuple, list)):
        o = o[0]
    np.asarray(o).ravel()[:1]
    t0 = time.perf_counter()
    for _ in range(reps):
        out = f(*a)
    o = out
    while isinstance(o, (tuple, list)):
        o = o[0]
    np.asarray(o).ravel()[:1]
    print(f"{name}: {(time.perf_counter()-t0)/reps*1e3:.1f} ms",
          file=sys.stderr, flush=True)
    return out


table = load_default_query_table()
g = encode_dna(synthetic_genome(0, 50000))
rs = generate_reads(jax.random.key(1234), jnp.asarray(g), table, 150, 40.0, 8)
k, max_len, max_walks = 31, 100000, 4096

pc = jax.jit(partial(kmer_pair_codes, k=k))
hi, lo, kvalid = bench("pair codes (jit)", pc, rs.codes)
kvalid = kvalid & jnp.asarray(rs.valid)[:, None]

big = jnp.uint32(U32)


@jax.jit
def stage_edges(codes_hi, codes_lo, kmer_valid):
    flat_hi = jnp.where(kmer_valid.reshape(-1), codes_hi.reshape(-1), big)
    flat_lo = jnp.where(kmer_valid.reshape(-1), codes_lo.reshape(-1), big)
    E = flat_hi.shape[0]
    s_hi, s_lo = jax.lax.sort((flat_hi, flat_lo), num_keys=2)
    first = jnp.concatenate(
        [jnp.ones(1, bool), (s_hi[1:] != s_hi[:-1]) | (s_lo[1:] != s_lo[:-1])])
    edge_valid = first & ~((s_hi == big) & (s_lo == big))
    key = jnp.where(edge_valid, jnp.arange(E, dtype=jnp.int32), E)
    sel = jax.lax.sort(key)
    sel_ok = sel < E
    sel_c = jnp.minimum(sel, E - 1)
    e_hi = jnp.where(sel_ok, s_hi[sel_c], big)
    e_lo = jnp.where(sel_ok, s_lo[sel_c], big)
    return e_hi, e_lo, sel_ok


e_hi, e_lo, edge_valid = bench("edges (2 sorts + gather)", stage_edges, hi, lo, kvalid)


@jax.jit
def stage_nodes(e_hi, e_lo, edge_valid):
    E = e_hi.shape[0]
    p_hi, p_lo = pair_shift_right2(e_hi, e_lo)
    sfx_hi, sfx_lo = pair_mask_low(e_hi, e_lo, 2 * (k - 1))
    p_hi = jnp.where(edge_valid, p_hi, big)
    p_lo = jnp.where(edge_valid, p_lo, big)
    sfx_hi = jnp.where(edge_valid, sfx_hi, big)
    sfx_lo = jnp.where(edge_valid, sfx_lo, big)
    b_hi = jnp.concatenate([p_hi, sfx_hi])
    b_lo = jnp.concatenate([p_lo, sfx_lo])
    n_hi, n_lo = jax.lax.sort((b_hi, b_lo), num_keys=2)
    nfirst = jnp.concatenate(
        [jnp.ones(1, bool), (n_hi[1:] != n_hi[:-1]) | (n_lo[1:] != n_lo[:-1])])
    node_valid_raw = nfirst & ~((n_hi == big) & (n_lo == big))
    nkey = jnp.where(node_valid_raw, jnp.arange(2 * E, dtype=jnp.int32), 2 * E)
    nsel = jax.lax.sort(nkey)
    nsel_ok = nsel < 2 * E
    nsel_c = jnp.minimum(nsel, 2 * E - 1)
    node_hi = jnp.where(nsel_ok, n_hi[nsel_c], big)
    node_lo = jnp.where(nsel_ok, n_lo[nsel_c], big)
    return p_hi, p_lo, sfx_hi, sfx_lo, node_hi, node_lo, nsel_ok


p_hi, p_lo, sfx_hi, sfx_lo, node_hi, node_lo, node_valid = bench(
    "nodes (2 sorts + gathers)", stage_nodes, e_hi, e_lo, edge_valid)

rj = jax.jit(_rank_join)
p_idx = bench("rank join prefix", rj, node_hi, node_lo, node_valid,
              p_hi, p_lo, edge_valid)
s_idx = bench("rank join suffix", rj, node_hi, node_lo, node_valid,
              sfx_hi, sfx_lo, edge_valid)


@jax.jit
def stage_degrees(p_idx, s_idx, edge_valid, node_lo, node_valid):
    V = node_lo.shape[0]
    ones = edge_valid.astype(jnp.int32)
    out_deg = jnp.zeros(V, jnp.int32).at[
        jnp.where(edge_valid, p_idx, V)].add(ones, mode="drop")
    in_deg = jnp.zeros(V, jnp.int32).at[
        jnp.where(edge_valid, s_idx, V)].add(ones, mode="drop")
    branch = ((in_deg != 1) | (out_deg != 1)) & (out_deg > 0) & node_valid
    single = out_deg.at[jnp.clip(p_idx, 0, V - 1)].get() == 1
    succ = jnp.full(V, -1, jnp.int32).at[
        jnp.where(edge_valid, p_idx, V)].set(
        jnp.where(single & edge_valid, s_idx, -1), mode="drop")
    succ = jnp.where(out_deg == 1, succ, -1)
    single_in = in_deg.at[jnp.clip(s_idx, 0, V - 1)].get() == 1
    pred = jnp.full(V, -1, jnp.int32).at[
        jnp.where(edge_valid, s_idx, V)].set(
        jnp.where(single_in & edge_valid, p_idx, -1), mode="drop")
    pred = jnp.where(in_deg == 1, pred, -1)
    is_walk = edge_valid & branch[jnp.clip(p_idx, 0, V - 1)]
    n_walks = is_walk.sum().astype(jnp.int32)
    E = p_idx.shape[0]
    wkey = jnp.where(is_walk, jnp.arange(E, dtype=jnp.int32), E)
    wsel = jax.lax.sort(wkey)[:max_walks]
    wvalid = jnp.arange(max_walks) < jnp.minimum(n_walks, max_walks)
    wsel_c = jnp.minimum(wsel, E - 1)
    w_start = jnp.where(wvalid, s_idx[wsel_c], -1)
    return out_deg, branch, succ, pred, w_start, wvalid, n_walks


out_deg, branch, succ, pred, w_start, wvalid, n_walks = bench(
    "degrees/succ/pred/walks", stage_degrees, p_idx, s_idx, edge_valid,
    node_lo, node_valid)

node_char = (node_lo & 3).astype(jnp.uint8)
wd = jax.jit(partial(walk_contigs_doubling, k=k, max_len=max_len))
out = bench("doubling walk (max_len=100000)", wd, node_char, succ, pred,
            branch, out_deg, w_start, jnp.zeros(max_walks, jnp.int32), wvalid)
print("n_walks:", int(n_walks), file=sys.stderr)

# sliced-walk timing
for cap in (131072, 65536):
    nh, nl, nv = node_hi[:cap], node_lo[:cap], node_valid[:cap]
    rj2 = jax.jit(_rank_join)
    p2 = bench(f"rank join prefix cap={cap}", rj2, nh, nl, nv, p_hi, p_lo, edge_valid)
    s2 = bench(f"rank join suffix cap={cap}", rj2, nh, nl, nv, sfx_hi, sfx_lo, edge_valid)
    od, br, sc, pr, ws, wv, nw = bench(
        f"degrees cap={cap}", stage_degrees, p2, s2, edge_valid, nl, nv)
    nch = (nl & 3).astype(jnp.uint8)
    wd2 = jax.jit(partial(walk_contigs_doubling, k=k, max_len=max_len))
    bench(f"doubling walk cap={cap}", wd2, nch, sc, pr, br, od, ws,
          jnp.zeros(max_walks, jnp.int32), wv)
