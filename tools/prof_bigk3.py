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

table = load_default_query_table()
g = encode_dna(synthetic_genome(0, 50000))
rs = generate_reads(jax.random.key(1234), jnp.asarray(g), table, 150, 40.0, 8)
pc = jax.jit(partial(kmer_pair_codes, k=31))
hi, lo, kvalid = pc(rs.codes)
kvalid = kvalid & jnp.asarray(rs.valid)[:, None]
np.asarray(kvalid)[:1]

def t(msg, f, reps=3):
    out = f(); o=out
    while isinstance(o,(tuple,list)): o=o[0]
    np.asarray(o).ravel()[:1]
    t0=time.perf_counter()
    for _ in range(reps): out=f()
    o=out
    while isinstance(o,(tuple,list)): o=o[0]
    np.asarray(o).ravel()[:1]
    print(f"{msg}: {(time.perf_counter()-t0)/reps*1e3:.1f} ms", file=sys.stderr, flush=True)
    return out

t0=time.perf_counter(); _=np.asarray(pc(rs.codes)[0])[:1]
print(f"pair codes jit warm: {time.perf_counter()-t0:.2f}s", file=sys.stderr)
out = t("contigs_big_k node_cap=131072", lambda: contigs_big_k(hi, lo, kvalid, 31, 100000, 4096, node_cap=131072))
print("n_walks:", int(out[4]), "n_nodes:", int(out[5]), file=sys.stderr)
out2 = t("contigs_big_k node_cap=65536", lambda: contigs_big_k(hi, lo, kvalid, 31, 100000, 4096, node_cap=65536))
from genomeassembler_dev_tpu.dbg.assemble import dedup_contigs
a = dedup_contigs(np.asarray(out[0][:1]), np.asarray(out[1][:1]), np.asarray(out[2][:1]), np.asarray(out[3][:1]))
b = dedup_contigs(np.asarray(out2[0][:1]), np.asarray(out2[1][:1]), np.asarray(out2[2][:1]), np.asarray(out2[3][:1]))
assert a == b and len(a) == 1 and len(a[0]) == 49995, (len(a), len(a[0]) if a else 0)
print("contigs equal across caps, len", len(a[0]), file=sys.stderr)
