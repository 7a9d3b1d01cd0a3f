import os, sys, time
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import numpy as np
import jax, jax.numpy as jnp
from genomeassembler_dev_tpu.core.querytable import load_default_query_table, QueryTable
from genomeassembler_dev_tpu.core.encoding import encode_dna
from genomeassembler_dev_tpu.sim.reads import generate_reads, dedup_reads
from genomeassembler_dev_tpu.sim.segments import synthetic_segment_store
from genomeassembler_dev_tpu.dbg import assemble as asm
from genomeassembler_dev_tpu.merge.engine import assemble_solutions
from genomeassembler_dev_tpu.pipeline.assembler import pack_strings, pad_reads
from genomeassembler_dev_tpu.score.breakscore import breakscore
from genomeassembler_dev_tpu.ops.edit_distance import batched_levenshtein_auto
from genomeassembler_dev_tpu.ops.ks import batched_ks_2samp

LOG = open("studies/prof_score.log", "w", buffering=1)
def log(*a): print(*a, file=LOG)

table = load_default_query_table()
store = synthetic_segment_store(1234, 50000, 10)
g = encode_dna(store.seqs[0])
rs = generate_reads(jax.random.key(1234), jnp.asarray(g), table, 150, 40.0, 8)
codes, valid = np.asarray(rs.codes), np.asarray(rs.valid)
contigs = asm.contigs_from_read_codes(codes, valid, 31, 100000)
sols = assemble_solutions(contigs, 31, 1234, 10000)
log(f"{len(sols)} solutions")

for rep in range(2):
    t0 = time.perf_counter()
    pmat, plens = pack_strings(sols, s_multiple=64, l_multiple=128)
    t1 = time.perf_counter()
    uniq, counts = dedup_reads(codes, valid)
    rcodes, rcounts, rvalid = pad_reads(uniq, counts, 512)
    t2 = time.perf_counter()
    bs = breakscore(jnp.asarray(pmat), jnp.asarray(plens), jnp.asarray(rcodes),
                    jnp.asarray(rcounts), jnp.asarray(rvalid),
                    jnp.asarray(table.combined, jnp.float32),
                    break_kmer=8, read_chunk=512)
    np.asarray(bs.bp_score)[:1]
    t3 = time.perf_counter()
    lev = batched_levenshtein_auto(jnp.asarray(pmat), jnp.asarray(plens),
                                   jnp.asarray(encode_dna(store.seqs[0])), mode="NW")
    np.asarray(lev)[:1]
    t4 = time.perf_counter()
    ks = batched_ks_2samp(bs.path_freq, rs.track)
    np.asarray(ks)[:1]
    t5 = time.perf_counter()
    log(f"rep{rep}: pack={t1-t0:.2f}s dedup_reads={t2-t1:.2f}s "
        f"breakscore={t3-t2:.2f}s lev={t4-t3:.2f}s ks={t5-t4:.2f}s "
        f"pmat={pmat.shape} reads={rcodes.shape}")
