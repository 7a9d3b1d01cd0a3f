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
from genomeassembler_dev_tpu.dbg.doubling import walk_contigs_doubling

LOG = open("studies/prof_bigk4.log", "w", buffering=1)
def log(*a): print(*a, file=LOG); print(*a, file=sys.stderr, flush=True)

def bench(name, f, reps=3):
    out = f(); o = out
    while isinstance(o, (tuple, list)): o = o[0]
    np.asarray(o).ravel()[:1]
    t0 = time.perf_counter()
    for _ in range(reps): out = f()
    o = out
    while isinstance(o, (tuple, list)): o = o[0]
    np.asarray(o).ravel()[:1]
    log(f"{name}: {(time.perf_counter()-t0)/reps*1e3:.1f} ms")
    return out

t0 = time.perf_counter()
table = load_default_query_table()
g = encode_dna(synthetic_genome(0, 50000))
rs = generate_reads(jax.random.key(1234), jnp.asarray(g), table, 150, 40.0, 8)
pc = jax.jit(partial(kmer_pair_codes, k=31))
hi, lo, kvalid = pc(rs.codes)
kvalid = kvalid & jnp.asarray(rs.valid)[:, None]
np.asarray(kvalid)[:1]
log(f"setup: {time.perf_counter()-t0:.1f}s")

for mw in (1024, 4096):
    for cap in (131072,):
        bench(f"fused big_k mw={mw} cap={cap}",
              lambda: contigs_big_k(hi, lo, kvalid, 31, 100000, mw, node_cap=cap))

# walk-only at cap using arrays built on device from a quick fused run
out = contigs_big_k(hi, lo, kvalid, 31, 100000, 1024, node_cap=131072)
log(f"n_walks={int(out[4])} n_nodes={int(out[5])}")

# isolate: build-only variant by running with max_len tiny (walk iters ~10)
bench("fused big_k max_len=1024 (short-walk control)",
      lambda: contigs_big_k(hi, lo, kvalid, 31, 1024, 1024, node_cap=131072))
