import os, sys, time
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import numpy as np
import jax, jax.numpy as jnp
from genomeassembler_dev_tpu.core.querytable import load_default_query_table
from genomeassembler_dev_tpu.core.encoding import encode_dna
from genomeassembler_dev_tpu.sim.reads import generate_reads
from genomeassembler_dev_tpu.sim.segments import synthetic_segment_store
from genomeassembler_dev_tpu.dbg import assemble as asm
from genomeassembler_dev_tpu.dbg.big_k import contigs_big_k

LOG = open("studies/prof_bigk6.log", "w", buffering=1)
def log(*a): print(*a, file=LOG)

table = load_default_query_table()
store = synthetic_segment_store(1234, 50000, 10)
g = encode_dna(store.seqs[0])
rs = generate_reads(jax.random.key(1234), jnp.asarray(g), table, 150, 40.0, 8)
codes, valid = rs.codes, rs.valid
jax.block_until_ready(codes)

for rep in range(2):
    t0 = time.perf_counter()
    hi, lo, kvalid = asm._pair_codes_jit(codes, 31)
    np.asarray(kvalid[0])[:1]
    t1 = time.perf_counter()
    kvalid = kvalid & jnp.asarray(valid)[:, None]
    np.asarray(kvalid[0])[:1]
    t2 = time.perf_counter()
    out = contigs_big_k(hi, lo, kvalid, 31, 100000, 4096, node_cap=131072)
    n_total, n_nodes = int(out[4]), int(out[5])
    t3 = time.perf_counter()
    contigs = asm._fetch_dedup_contigs(out)
    t4 = time.perf_counter()
    log(f"rep{rep}: pair={t1-t0:.2f}s mask={t2-t1:.2f}s fused={t3-t2:.2f}s "
        f"fetch+dedup={t4-t3:.2f}s n_total={n_total} n_nodes={n_nodes} "
        f"contigs={len(contigs)}")

# full path as the pipeline calls it
for rep in range(2):
    t0 = time.perf_counter()
    cs = asm.contigs_from_read_codes(np.asarray(codes), np.asarray(valid), 31, 100000)
    log(f"contigs_from_read_codes rep{rep}: {time.perf_counter()-t0:.2f}s ({len(cs)} contigs)")
