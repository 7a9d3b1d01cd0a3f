"""Fine-grained stage breakdown of the headline bench step (round 3).

Isolates, at B=256 / 1 kb / read_len 12 / k=9 / M=1024:
  dedup front end (pack + sort-dedup), window unpack, node table (sorted),
  linkage searchsorteds, packed chase, buffer scatters, octamer bincount.
Stages are timed as separate jits — sums exceed the fused step (XLA overlaps
and fuses) but rank the targets.
"""
import os, sys, time
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import numpy as np
import jax, jax.numpy as jnp

LOG = open("studies/prof_r3b.log", "w", buffering=1)
def log(*a):
    print(*a, file=LOG)
    print(*a, file=sys.stderr, flush=True)

def timeit(fn, reps=10):
    out = fn()
    o = out
    while isinstance(o, (tuple, list)): o = o[0]
    np.asarray(o.ravel()[:1])
    best = 1e9
    for _ in range(3):
        t0 = time.perf_counter()
        for _ in range(reps): out = fn()
        o = out
        while isinstance(o, (tuple, list)): o = o[0]
        np.asarray(o.ravel()[:1])
        best = min(best, (time.perf_counter()-t0)/reps)
    return best * 1e3

from genomeassembler_dev_tpu.core.encoding import encode_dna
from genomeassembler_dev_tpu.core.querytable import load_default_query_table
from genomeassembler_dev_tpu.ops.dedup import dedup_with_counts, pack_read_codes, unpack_kmer_windows
from genomeassembler_dev_tpu.ops.mxu import (bincount_mxu, searchsorted_mxu,
                                             permutation_gather_mxu)
from genomeassembler_dev_tpu.dbg.dense import _node_table_sorted
from genomeassembler_dev_tpu.sim.reads import n_draws_for, simulate_reads
from genomeassembler_dev_tpu.sim.segments import synthetic_genome

dev = jax.devices()[0]
log(f"device: {dev.platform} {dev}")

B, SEQ_LEN, READ_LEN, COV, K = 256, 1000, 12, 40.0, 9
U_CAP, M = 1024, 1024
V = 4 ** (K - 1)
table = load_default_query_table()
probs8 = jnp.asarray(table.probs[8], jnp.float32)
genomes = jnp.asarray(np.stack([encode_dna(synthetic_genome(i, SEQ_LEN)) for i in range(B)]))
keys = jax.random.split(jax.random.key(0), B)
sim = jax.jit(jax.vmap(lambda k, g: simulate_reads(k, g, probs8, READ_LEN, n_draws_for(COV, SEQ_LEN, READ_LEN))))
rs = sim(keys, genomes)
jax.block_until_ready(rs.codes)
log("reads simulated")

# stage A: pack
packf = jax.jit(jax.vmap(pack_read_codes))
pk = packf(rs.codes, rs.valid)
log(f"A pack_read_codes: {timeit(lambda: packf(rs.codes, rs.valid)):.2f} ms")

# stage B: dedup (sort + compact)
dd = jax.jit(jax.vmap(lambda p: dedup_with_counts(p, U_CAP)))
o = dd(pk)
log(f"B dedup_with_counts: {timeit(lambda: dd(pk)):.2f} ms")
ucodes, ucounts, n_u = o
uvalid = jax.vmap(lambda n: jnp.arange(U_CAP, dtype=jnp.int32) < n)(n_u)

# stage C: unpack windows (k=9)
upk = jax.jit(jax.vmap(lambda u: unpack_kmer_windows(u, READ_LEN, K)))
kc = upk(ucodes)
kv = jnp.broadcast_to(uvalid[:, :, None], kc.shape)
log(f"C unpack windows k9: {timeit(lambda: upk(ucodes)):.2f} ms")

# stage D: node table (sorted)
nt = jax.jit(jax.vmap(lambda c, v: _node_table_sorted(c, v, K, M)))
ntab = nt(kc, kv)
log(f"D node table sorted: {timeit(lambda: nt(kc, kv)):.2f} ms")
nodes_c, c_nib, n_nodes = ntab

# stage E: linkage (2x searchsorted_mxu)
@jax.jit
@jax.vmap
def linkage(nodes_c, c_nib, n_nodes):
    node_ok = jnp.arange(M, dtype=jnp.int32) < n_nodes
    bits_out = ((c_nib[:, None] >> jnp.arange(4)) & 1)
    bits_in = ((c_nib[:, None] >> (4 + jnp.arange(4))) & 1)
    out_deg = bits_out.sum(axis=1)
    in_deg = bits_in.sum(axis=1)
    succ_char = jnp.argmax(bits_out, axis=1).astype(jnp.int32)
    pred_char = jnp.argmax(bits_in, axis=1).astype(jnp.int32)
    succ_dense = jnp.where(node_ok & (out_deg == 1), ((nodes_c << 2) | succ_char) & (V - 1), V)
    pred_dense = jnp.where(node_ok & (in_deg == 1), (pred_char * V + nodes_c) >> 2, V)
    nodes_sorted = jnp.where(node_ok, nodes_c, jnp.int32(2**30))
    succ_c = jnp.where(succ_dense < V, searchsorted_mxu(nodes_sorted, succ_dense), -1)
    pred_c = jnp.where(pred_dense < V, searchsorted_mxu(nodes_sorted, pred_dense), -1)
    return succ_c, pred_c
lk = linkage(nodes_c, c_nib, n_nodes)
log(f"E linkage: {timeit(lambda: linkage(nodes_c, c_nib, n_nodes)):.2f} ms")

# stage F: packed chase (10 iters)
@jax.jit
@jax.vmap
def chase(succ_c, pred_c, c_nib, n_nodes):
    node_ok = jnp.arange(M, dtype=jnp.int32) < n_nodes
    bits_out = ((c_nib[:, None] >> jnp.arange(4)) & 1)
    out_deg = bits_out.sum(axis=1)
    in_deg = (((c_nib[:, None] >> (4 + jnp.arange(4))) & 1)).sum(axis=1)
    branch = ((in_deg != 1) | (out_deg != 1)) & (out_deg > 0) & node_ok
    terminal = branch | (out_deg == 0) | ~node_ok
    self_idx = jnp.arange(M, dtype=jnp.int32)
    head = ~terminal & ((pred_c < 0) | terminal[jnp.maximum(pred_c, 0)])
    up_ok = ~terminal & ~head & (pred_c >= 0)
    uptr = jnp.where(up_ok, jnp.maximum(pred_c, 0), self_idx)
    uoff = jnp.where(up_ok, 1, 0).astype(jnp.float32)
    fM = float(M)
    for _ in range(10):
        pkd = uptr.astype(jnp.float32) * fM + uoff
        g = permutation_gather_mxu(pkd[:, None], uptr)[:, 0]
        gp = jnp.floor(g / fM)
        uoff = uoff + (g - gp * fM)
        uptr = gp.astype(jnp.int32)
    return uptr, uoff
ch = chase(lk[0], lk[1], c_nib, n_nodes)
log(f"F packed chase x10: {timeit(lambda: chase(lk[0], lk[1], c_nib, n_nodes)):.2f} ms")

# stage G: octamer windows + weighted bincount
@jax.jit
@jax.vmap
def octamer(ucodes, uvalid, ucounts):
    oc = unpack_kmer_windows(ucodes, READ_LEN, 8)
    return bincount_mxu(
        oc.reshape(-1),
        jnp.broadcast_to(uvalid[:, None], oc.shape).reshape(-1), 4**8,
        jnp.broadcast_to(ucounts[:, None], oc.shape).reshape(-1),
        weight_bits=16)
occ = octamer(ucodes, uvalid, ucounts)
log(f"G octamer bincount: {timeit(lambda: octamer(ucodes, uvalid, ucounts)):.2f} ms")

log("done")
