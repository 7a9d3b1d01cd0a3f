import os, sys
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import time, sys
import numpy as np
import jax, jax.numpy as jnp

from genomeassembler_dev_tpu.core.encoding import encode_dna
from genomeassembler_dev_tpu.core.querytable import load_default_query_table
from genomeassembler_dev_tpu.sim.reads import generate_reads
from genomeassembler_dev_tpu.sim.segments import synthetic_genome
from genomeassembler_dev_tpu.dbg.big_k import contigs_big_k, kmer_pair_codes
from genomeassembler_dev_tpu.dbg.assemble import dedup_contigs

def t(msg, f):
    t0 = time.perf_counter(); out = f()
    jax.block_until_ready(out) if hasattr(out, 'block_until_ready') or isinstance(out, (tuple, jnp.ndarray)) else None
    # fetch sync
    o = out
    while isinstance(o, (tuple, list)): o = o[0]
    try: np.asarray(o).ravel()[:1]
    except Exception: pass
    print(f"{msg}: {time.perf_counter()-t0:.2f}s", file=sys.stderr, flush=True)
    return out

table = load_default_query_table()
g = encode_dna(synthetic_genome(1234 if False else 0, 50000))
# replicate store seed: use cli path seed --synthetic seed=1234 index0
rs = t("sim", lambda: generate_reads(jax.random.key(1234), jnp.asarray(g), table, 150, 40.0, 8))
codes = rs.codes; valid = rs.valid
print("reads:", codes.shape, file=sys.stderr)

hi, lo, kvalid = t("pair codes", lambda: kmer_pair_codes(jnp.asarray(codes), 31))
kvalid = kvalid & jnp.asarray(valid)[:, None]
for rep in range(3):
    out = t(f"contigs_big_k run{rep}", lambda: contigs_big_k(hi, lo, kvalid, 31, 100000, 4096))
buf, lens, wv, ovf, n_total, n_nodes = out
print("n_walks:", int(n_total), "n_nodes:", int(n_nodes), file=sys.stderr)
t("host fetch buf", lambda: np.asarray(buf))
t0 = time.perf_counter()
cset = dedup_contigs(np.asarray(buf), np.asarray(lens), np.asarray(wv), np.asarray(ovf))
print(f"dedup_contigs host: {time.perf_counter()-t0:.2f}s, {len(cset)} contigs", file=sys.stderr)
