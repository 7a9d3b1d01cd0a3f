"""Round-3 regression bisect + kernel candidates, measured on the real chip.

Times, at the headline bench shape (B=256 segments, 1 kb, read_len 12, k=9,
M=1024 nodes):
  * the full fused per-segment step with the sorted vs dense node-table
    builders (the s1+s2 replacement);
  * the doubling-chase candidates: two-level gather C=2 (r2 ship), one-level
    gather C=2 (r1 ship), two-level packed C=1, and the Pallas VMEM kernel;
  * correctness asserts between all chase variants.
"""
import os, sys, time
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import numpy as np
import jax, jax.numpy as jnp

LOG = open("studies/prof_r3.log", "w", buffering=1)
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
from genomeassembler_dev_tpu.ops.mxu import bincount_mxu, permutation_gather_mxu
from genomeassembler_dev_tpu.dbg.dense import contigs_dense, _node_table_dense, _node_table_sorted
from genomeassembler_dev_tpu.sim.reads import n_draws_for, simulate_reads
from genomeassembler_dev_tpu.sim.segments import synthetic_genome

dev = jax.devices()[0]
log(f"device: {dev.platform} {dev}")

B, SEQ_LEN, READ_LEN, COV, K = 256, 1000, 12, 40.0, 9
MAX_WALKS, MAX_LEN, U_CAP, M = 256, SEQ_LEN + K, 1024, 1024
table = load_default_query_table()
probs8 = jnp.asarray(table.probs[8], jnp.float32)
genomes = jnp.asarray(np.stack([encode_dna(synthetic_genome(i, SEQ_LEN)) for i in range(B)]))
keys = jax.random.split(jax.random.key(0), B)
sim = jax.jit(jax.vmap(lambda k, g: simulate_reads(k, g, probs8, READ_LEN, n_draws_for(COV, SEQ_LEN, READ_LEN))))
rs = sim(keys, genomes)
read_codes, read_valid = rs.codes, rs.valid
jax.block_until_ready(read_codes)
log("reads simulated")

# --- full bench step, both node-table builders --------------------------
def make_step(force=None):
    def per_segment(codes, valid):
        packed = pack_read_codes(codes, valid)
        ucodes, ucounts, n_u = dedup_with_counts(packed, U_CAP)
        uvalid = jnp.arange(U_CAP, dtype=jnp.int32) < n_u
        kc = unpack_kmer_windows(ucodes, READ_LEN, K)
        kv = jnp.broadcast_to(uvalid[:, None], kc.shape)
        buf, lens, wvalid, overflow, n_walks, n_nodes = contigs_dense(
            kc, kv, K, MAX_LEN, MAX_WALKS)
        oc = unpack_kmer_windows(ucodes, READ_LEN, 8)
        counts8 = bincount_mxu(
            oc.reshape(-1),
            jnp.broadcast_to(uvalid[:, None], oc.shape).reshape(-1), 4**8,
            jnp.broadcast_to(ucounts[:, None], oc.shape).reshape(-1),
            weight_bits=16)
        return (jnp.where(wvalid, lens, 0).sum(), n_walks, counts8.sum(), n_u)
    return jax.jit(jax.vmap(per_segment))

import genomeassembler_dev_tpu.dbg.dense as dense_mod
step = make_step()
log(f"bench step (auto node table): {timeit(lambda: step(read_codes, read_valid)):.2f} ms")

# force the dense builder by flipping the dispatch threshold
orig_sorted = dense_mod._node_table_sorted
dense_mod._node_table_sorted = dense_mod._node_table_dense
contigs_dense.clear_cache()
step_d = make_step()
log(f"bench step (dense node table): {timeit(lambda: step_d(read_codes, read_valid)):.2f} ms")
dense_mod._node_table_sorted = orig_sorted
contigs_dense.clear_cache()

# --- node-table stage in isolation ---------------------------------------
pk = jax.jit(jax.vmap(pack_read_codes))(read_codes, read_valid)
dd = jax.jit(jax.vmap(lambda p: dedup_with_counts(p, U_CAP)))(pk)
ucodes, n_u = dd[0], dd[2]
uvalid = jax.vmap(lambda n: jnp.arange(U_CAP, dtype=jnp.int32) < n)(n_u)
kc = jax.jit(jax.vmap(lambda u: unpack_kmer_windows(u, READ_LEN, K)))(ucodes)
kv = jnp.broadcast_to(uvalid[:, :, None], kc.shape)
jax.block_until_ready(kc)

nt_s = jax.jit(jax.vmap(lambda c, v: _node_table_sorted(c, v, K, M)))
nt_d = jax.jit(jax.vmap(lambda c, v: _node_table_dense(c, v, K, M)))
a = nt_s(kc, kv); b = nt_d(kc, kv)
assert (np.asarray(a[0]) == np.asarray(b[0])).all(), "node ids differ"
assert (np.asarray(a[1]) == np.asarray(b[1])).all(), "nibbles differ"
assert (np.asarray(a[2]) == np.asarray(b[2])).all(), "counts differ"
log(f"node table sorted: {timeit(lambda: nt_s(kc, kv)):.2f} ms")
log(f"node table dense:  {timeit(lambda: nt_d(kc, kv)):.2f} ms")

# --- doubling-chase candidates -------------------------------------------
rng = np.random.default_rng(0)
n_iters = 10
uptr0 = np.minimum(np.arange(M), rng.integers(0, M, (B, M))).astype(np.int32)
uoff0 = (uptr0 != np.arange(M)).astype(np.float32)
up, uo = jnp.asarray(uptr0), jnp.asarray(uoff0)

@jax.jit
@jax.vmap
def chase_twolevel(uptr, uoff):
    for _ in range(n_iters):
        gu = permutation_gather_mxu(jnp.stack([uptr.astype(jnp.float32), uoff], -1), uptr)
        uoff = uoff + gu[:, 1]
        uptr = gu[:, 0].astype(jnp.int32)
    return uptr, uoff

def onelevel_gather(vals, idx):
    MM = vals.shape[-2]
    onehot = (idx[..., None] == jnp.arange(MM, dtype=jnp.int32)).astype(jnp.bfloat16)
    return jnp.einsum("...mk,...kc->...mc", onehot, vals.astype(jnp.float32),
                      preferred_element_type=jnp.float32,
                      precision=jax.lax.Precision.HIGHEST)

@jax.jit
@jax.vmap
def chase_onelevel(uptr, uoff):
    for _ in range(n_iters):
        gu = onelevel_gather(jnp.stack([uptr.astype(jnp.float32), uoff], -1), uptr)
        uoff = uoff + gu[:, 1]
        uptr = gu[:, 0].astype(jnp.int32)
    return uptr, uoff

@jax.jit
@jax.vmap
def chase_packed(uptr, uoff):
    # state packed into one f32 channel: uptr*2048 + uoff < 2^22 (exact)
    for _ in range(n_iters):
        pk = uptr.astype(jnp.float32) * 2048.0 + uoff
        g = permutation_gather_mxu(pk[:, None], uptr)[:, 0]
        gp = jnp.floor(g / 2048.0)
        uoff = uoff + (g - gp * 2048.0)
        uptr = gp.astype(jnp.int32)
    return uptr, uoff

a = chase_twolevel(up, uo)
b = chase_onelevel(up, uo)
c = chase_packed(up, uo)
assert (np.asarray(a[0]) == np.asarray(b[0])).all() and (np.asarray(a[1]) == np.asarray(b[1])).all(), "onelevel != twolevel"
assert (np.asarray(a[0]) == np.asarray(c[0])).all() and (np.asarray(a[1]) == np.asarray(c[1])).all(), "packed != twolevel"
log(f"chase two-level C=2: {timeit(lambda: chase_twolevel(up, uo)):.2f} ms")
log(f"chase one-level C=2: {timeit(lambda: chase_onelevel(up, uo)):.2f} ms")
log(f"chase packed  C=1: {timeit(lambda: chase_packed(up, uo)):.2f} ms")

# NB: a Pallas VMEM chase kernel was evaluated and DELETED: its first form
# failed Mosaic lowering ((1, M) blocks; bf16 1D->2D reshape), and the fixed
# form (8-segment blocks, int32 limb assembly) exceeded a 900 s remote
# compile budget for a theoretical ~1-2 ms upside over the packed C=1 XLA
# chase above, which is wired into dbg/dense.py instead.

log("done")
