"""Profile the sparse (k=13) study dBG stage: the own-study logs show
20-35 s per 64-segment batch for rows 3-7 — ~1000x worse per edge than the
dense bench path. Splits build_dbg / walk_starts / doubling walk."""
import os, sys, time
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import numpy as np
import jax, jax.numpy as jnp

LOG = open("studies/prof_sparse.log", "w", buffering=1)
def log(*a):
    print(*a, file=LOG)
    print(*a, file=sys.stderr, flush=True)

def timeit(fn, reps=5):
    out = fn()
    o = out
    while isinstance(o, (tuple, list, dict)):
        o = next(iter(o.values())) if isinstance(o, dict) else o[0]
    np.asarray(o.ravel()[:1])
    best = 1e9
    for _ in range(3):
        t0 = time.perf_counter()
        for _ in range(reps): out = fn()
        o = out
        while isinstance(o, (tuple, list, dict)):
            o = next(iter(o.values())) if isinstance(o, dict) else o[0]
        np.asarray(o.ravel()[:1])
        best = min(best, (time.perf_counter()-t0)/reps)
    return best * 1e3

from genomeassembler_dev_tpu.core.encoding import encode_dna
from genomeassembler_dev_tpu.core.querytable import load_default_query_table
from genomeassembler_dev_tpu.dbg.graph import build_dbg, contigs_sparse, walk_starts_sparse
from genomeassembler_dev_tpu.dbg.doubling import walk_contigs_doubling
from genomeassembler_dev_tpu.ops.windows import kmer_window_codes
from genomeassembler_dev_tpu.sim.reads import n_draws_for, simulate_reads
from genomeassembler_dev_tpu.sim.segments import plant_repeats, synthetic_genome

dev = jax.devices()[0]
log(f"device: {dev.platform} {dev}")

B, L, RL, K = 64, 1000, 16, 13
COV = 40.0
NODE_CAP, MAX_WALKS, CONTIG_CAP = 4096, 2048, 2000
table = load_default_query_table()
probs8 = jnp.asarray(table.probs[8], jnp.float32)
rng = np.random.default_rng(0)
genomes = jnp.asarray(np.stack([
    encode_dna(plant_repeats(synthetic_genome(i, L), np.random.default_rng((0, i))))
    for i in range(B)]))
keys = jax.random.split(jax.random.key(0), B)
sim = jax.jit(jax.vmap(lambda k, g: simulate_reads(k, g, probs8, RL, n_draws_for(COV, L, RL))))
rs = sim(keys, genomes)
jax.block_until_ready(rs.codes)
log(f"reads simulated: {rs.codes.shape}")

wins = jax.jit(jax.vmap(lambda c, v: kmer_window_codes(c, K)[0]))
kc = wins(rs.codes, rs.valid)
kv_fn = jax.jit(jax.vmap(lambda c, v: kmer_window_codes(c, K)[1] & v[:, None]))
kv = kv_fn(rs.codes, rs.valid)
log(f"windows: {kc.shape}")

# full fused stage (as the batch runner runs it)
full = jax.jit(jax.vmap(
    lambda c, v: contigs_sparse(c, v, K, CONTIG_CAP, MAX_WALKS, node_cap=NODE_CAP)))
out = full(kc, kv)
log(f"full contigs_sparse: {timeit(lambda: full(kc, kv)):.1f} ms")
log(f"  n_nodes max {int(np.asarray(out[5]).max())}, n_walks max {int(np.asarray(out[4]).max())}")

# split: build
bld = jax.jit(jax.vmap(lambda c, v: build_dbg(c.reshape(-1), v.reshape(-1), K, node_cap=NODE_CAP)))
g = bld(kc, kv)
log(f"build_dbg: {timeit(lambda: bld(kc, kv)):.1f} ms")

# split: walk starts
ws = jax.jit(jax.vmap(lambda gg: walk_starts_sparse(gg, MAX_WALKS)))
st = ws(g)
log(f"walk_starts: {timeit(lambda: ws(g)):.1f} ms")

# split: doubling walk
wk = jax.jit(jax.vmap(
    lambda gg, s0, pfx, val: walk_contigs_doubling(
        (gg.nodes & 3).astype(jnp.uint8), gg.succ, gg.pred, gg.branch,
        gg.out_deg, jnp.where(val, s0, -1), pfx, val, K, CONTIG_CAP)))
o3 = wk(g, st[0], st[1], st[2])
log(f"doubling walk: {timeit(lambda: wk(g, st[0], st[1], st[2])):.1f} ms")
log("done")
