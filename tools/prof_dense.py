import os, sys, time
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
from functools import partial
import numpy as np
import jax, jax.numpy as jnp
from genomeassembler_dev_tpu.core.encoding import encode_dna
from genomeassembler_dev_tpu.core.querytable import load_default_query_table
from genomeassembler_dev_tpu.ops.dedup import dedup_with_counts, pack_read_codes, unpack_kmer_windows
from genomeassembler_dev_tpu.ops.mxu import (count_kmers_mxu, compact_by_rank_mxu,
                                             searchsorted_mxu, permutation_gather_mxu)
from genomeassembler_dev_tpu.sim.reads import n_draws_for, simulate_reads
from genomeassembler_dev_tpu.sim.segments import synthetic_genome

LOG = open("studies/prof_dense.log", "w", buffering=1)
def log(*a): print(*a, file=LOG)

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

B, SEQ_LEN, READ_LEN, COV, K = 256, 1000, 12, 40.0, 9
MAX_WALKS, MAX_LEN, U_CAP, M = 256, SEQ_LEN + K, 1024, 1024
table = load_default_query_table()
probs8 = jnp.asarray(table.probs[8], jnp.float32)
genomes = jnp.asarray(np.stack([encode_dna(synthetic_genome(i, SEQ_LEN)) for i in range(B)]))
keys = jax.random.split(jax.random.key(0), B)
sim = jax.jit(jax.vmap(lambda k, g: simulate_reads(k, g, probs8, READ_LEN, n_draws_for(COV, SEQ_LEN, READ_LEN))))
rs = sim(keys, genomes)
pk = jax.jit(jax.vmap(pack_read_codes))(rs.codes, rs.valid)
dd = jax.jit(jax.vmap(lambda p: dedup_with_counts(p, U_CAP)))(pk)
ucodes, n_u = dd[0], dd[2]
uvalid = jax.vmap(lambda n: jnp.arange(U_CAP, dtype=jnp.int32) < n)(n_u)
kc = jax.jit(jax.vmap(lambda u: unpack_kmer_windows(u, READ_LEN, K)))(ucodes)
kv = jnp.broadcast_to(uvalid[:, :, None], kc.shape)
jax.block_until_ready(kc)
V = 4 ** (K - 1)
four = jnp.array([1, 2, 4, 8], jnp.int32)

@jax.jit
@jax.vmap
def s1_presence_nib(kc, kv):
    presence = count_kmers_mxu(kc.reshape(-1), kv.reshape(-1), K) > 0
    nib_out = (presence.reshape(V, 4).astype(jnp.int32) * four).sum(axis=1)
    nib_in = (presence.reshape(4, V).astype(jnp.int32) * four[:, None]).sum(axis=0)
    return nib_out, nib_in

nibs = s1_presence_nib(kc, kv)
log(f"s1 presence+nib: {timeit(lambda: s1_presence_nib(kc, kv)):.2f} ms")

node = jnp.arange(V, dtype=jnp.int32)
id_limbs_shifts = list(range(0, 2 * (K - 1), 8))

@jax.jit
@jax.vmap
def s2_compact(nib_out, nib_in):
    active = (nib_out | nib_in) > 0
    id_limbs = [(node >> s) & 255 for s in id_limbs_shifts]
    compacted, n_nodes = compact_by_rank_mxu(active, tuple(id_limbs + [nib_out | (nib_in << 4)]), M)
    return tuple(compacted) + (n_nodes,)

comp = s2_compact(*nibs)
log(f"s2 compact: {timeit(lambda: s2_compact(*nibs)):.2f} ms")

nodes_c = sum(c << (8 * i) for i, c in enumerate(comp[:-2]))
c_nib = comp[-2]

@jax.jit
@jax.vmap
def s3_linkage(nodes_c, c_nib, n_nodes):
    node_ok = jnp.arange(M, dtype=jnp.int32) < n_nodes
    bits_out = ((c_nib[:, None] >> jnp.arange(4)) & 1)
    bits_in = ((c_nib[:, None] >> (4 + jnp.arange(4))) & 1)
    out_deg_c = bits_out.sum(axis=1)
    in_deg_c = bits_in.sum(axis=1)
    succ_char = jnp.argmax(bits_out, axis=1).astype(jnp.int32)
    pred_char = jnp.argmax(bits_in, axis=1).astype(jnp.int32)
    succ_dense = jnp.where(node_ok & (out_deg_c == 1), ((nodes_c << 2) | succ_char) & (V - 1), V)
    pred_dense = jnp.where(node_ok & (in_deg_c == 1), (pred_char * V + nodes_c) >> 2, V)
    nodes_sorted = jnp.where(node_ok, nodes_c, jnp.int32(2**30))
    succ_c = jnp.where(succ_dense < V, searchsorted_mxu(nodes_sorted, succ_dense), -1)
    pred_c = jnp.where(pred_dense < V, searchsorted_mxu(nodes_sorted, pred_dense), -1)
    return succ_c, pred_c

lk = s3_linkage(nodes_c, c_nib, comp[-1])
log(f"s3 linkage (2x searchsorted): {timeit(lambda: s3_linkage(nodes_c, c_nib, comp[-1])):.2f} ms")

@jax.jit
@jax.vmap
def s4_walk(succ_c, pred_c, c_nib, n_nodes):
    node_ok = jnp.arange(M, dtype=jnp.int32) < n_nodes
    bits_out = ((c_nib[:, None] >> jnp.arange(4)) & 1)
    out_deg_c = bits_out.sum(axis=1)
    in_deg_c = (((c_nib[:, None] >> (4 + jnp.arange(4))) & 1)).sum(axis=1)
    branch_c = ((in_deg_c != 1) | (out_deg_c != 1)) & (out_deg_c > 0) & node_ok
    terminal = branch_c | (out_deg_c == 0) | ~node_ok
    self_idx = jnp.arange(M, dtype=jnp.int32)
    head = ~terminal & ((pred_c < 0) | terminal[jnp.maximum(pred_c, 0)])
    up_ok = ~terminal & ~head & (pred_c >= 0)
    uptr = jnp.where(up_ok, jnp.maximum(pred_c, 0), self_idx)
    uoff = jnp.where(up_ok, 1, 0).astype(jnp.float32)
    for _ in range(max(1, min(MAX_LEN, M).bit_length())):
        gu = permutation_gather_mxu(jnp.stack([uptr.astype(jnp.float32), uoff], axis=-1), uptr)
        uoff = uoff + gu[:, 1]
        uptr = gu[:, 0].astype(jnp.int32)
    return uptr, uoff

wk = s4_walk(lk[0], lk[1], c_nib, comp[-1])
log(f"s4 doubling ({max(1, min(MAX_LEN, M).bit_length())} gathers): {timeit(lambda: s4_walk(lk[0], lk[1], c_nib, comp[-1])):.2f} ms")
