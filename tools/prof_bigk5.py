import os, sys
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import time
from functools import partial
import numpy as np
import jax, jax.numpy as jnp
from genomeassembler_dev_tpu.core.querytable import load_default_query_table
from genomeassembler_dev_tpu.core.encoding import encode_dna
from genomeassembler_dev_tpu.sim.reads import generate_reads
from genomeassembler_dev_tpu.sim.segments import synthetic_genome
from genomeassembler_dev_tpu.dbg.big_k import contigs_big_k, kmer_pair_codes

LOG = open("studies/prof_bigk5.log", "w", buffering=1)
def log(*a): print(*a, file=LOG)

table = load_default_query_table()
g = encode_dna(synthetic_genome(0, 50000))
rs = generate_reads(jax.random.key(1234), jnp.asarray(g), table, 150, 40.0, 8)

t0 = time.perf_counter()
pc = jax.jit(partial(kmer_pair_codes, k=31))
hi, lo, kvalid = pc(rs.codes)
kvalid = kvalid & jnp.asarray(rs.valid)[:, None]
np.asarray(kvalid[0])[:1]
log(f"pair codes (jit, incl compile): {time.perf_counter()-t0:.2f}s")
t0 = time.perf_counter()
hi, lo, kv2 = pc(rs.codes)
np.asarray(kv2[0])[:1]
log(f"pair codes warm: {time.perf_counter()-t0:.3f}s")

@partial(jax.jit, static_argnames=("mw", "cap"))
def scalar_walk(hi, lo, kvalid, mw, cap):
    buf, lens, wv, ovf, n_total, n_nodes = contigs_big_k(
        hi, lo, kvalid, 31, 100000, mw, node_cap=cap)
    return lens.sum() + buf.astype(jnp.int32).sum(), n_total, n_nodes

for mw in (1024, 4096):
    out = scalar_walk(hi, lo, kvalid, mw, 131072)
    np.asarray(out[0])
    best = 1e9
    for _ in range(3):
        t0 = time.perf_counter()
        out = scalar_walk(hi, lo, kvalid, mw, 131072)
        np.asarray(out[0])
        best = min(best, time.perf_counter() - t0)
    log(f"scalar-return fused big_k mw={mw}: {best*1e3:.1f} ms")
