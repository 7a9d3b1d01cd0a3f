"""Time the batched-eval sub-ops (score / lev / KS / random dots) at the
bench-extra e2e shape: 32 experiments, k=9, 1 kb, plain synthetic segments.
The overlapped merge+eval stage measures 13.5 s warm; find the payer."""
import os, sys, time
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import numpy as np
import jax, jax.numpy as jnp

LOG = open("studies/prof_eval.log", "w", buffering=1)
def log(*a):
    print(*a, file=LOG)
    print(*a, file=sys.stderr, flush=True)

def timeit(fn, reps=5):
    out = fn()
    o = out
    while isinstance(o, (tuple, list)): o = o[0]
    np.asarray(np.asarray(o).ravel()[:1])
    best = 1e9
    for _ in range(3):
        t0 = time.perf_counter()
        for _ in range(reps): out = fn()
        o = out
        while isinstance(o, (tuple, list)): o = o[0]
        np.asarray(np.asarray(o).ravel()[:1])
        best = min(best, (time.perf_counter()-t0)/reps)
    return best * 1e3

from genomeassembler_dev_tpu.core.encoding import encode_dna
from genomeassembler_dev_tpu.core.querytable import QueryTable, load_default_query_table
from genomeassembler_dev_tpu.dbg.assemble import contigs_from_read_codes
from genomeassembler_dev_tpu.merge.engine import assemble_solutions
from genomeassembler_dev_tpu.ops.edit_distance import batched_levenshtein_auto
from genomeassembler_dev_tpu.pipeline.assembler import pack_strings, pad_reads
from genomeassembler_dev_tpu.pipeline.batch_runner import _ks_jit, _score_jit
from genomeassembler_dev_tpu.ops.mxu import dot_f32
from genomeassembler_dev_tpu.sim.reads import dedup_reads, generate_reads
from genomeassembler_dev_tpu.sim.segments import synthetic_genome as sg

dev = jax.devices()[0]
log(f"device: {dev.platform} {dev}")
table = load_default_query_table()
uni = QueryTable.uniform()
probs_all = jnp.asarray(table.combined, jnp.float32)
uni_all = jnp.asarray(uni.combined, jnp.float32)

G = 8  # group size for S<=128 buckets
segs = [sg(1000 + i, 1000) for i in range(G)]
packed = []
sols_count = []
for s in segs:
    codes = encode_dna(s)
    rs = generate_reads(jax.random.key(1234), codes, table, 12, 40.0)
    rc, rv = np.asarray(rs.codes), np.asarray(rs.valid)
    contigs = contigs_from_read_codes(rc, rv, 9, 2000)
    sols = assemble_solutions(contigs, 9, 1234, 10000)
    sols_count.append(len(sols))
    # one shared bucket so the group stacks (the runner groups by bucket)
    pm, pl = pack_strings(sols, s_multiple=512, l_multiple=128)
    uq, ct = dedup_reads(rc, rv)
    rcd, rcn, rvl = pad_reads(uq, ct, 512)
    packed.append((pm, pl, rcd, rcn, rvl, codes, np.asarray(rs.track)))
log(f"solutions per segment: {sols_count}")
Lmax = max(p[0].shape[1] for p in packed)
packed = [(np.pad(p[0], ((0, 0), (0, Lmax - p[0].shape[1]))),) + p[1:]
          for p in packed]
pm = jnp.asarray(np.stack([p[0] for p in packed]))
pl = jnp.asarray(np.stack([p[1] for p in packed]))
rc = jnp.asarray(np.stack([p[2] for p in packed]))
rn = jnp.asarray(np.stack([p[3] for p in packed]))
rv = jnp.asarray(np.stack([p[4] for p in packed]))
gm = jnp.asarray(np.stack([p[5] for p in packed]))
tr = jnp.asarray(np.stack([p[6] for p in packed]))
log(f"shapes pm={pm.shape} rc={rc.shape}")

score6 = _score_jit(8, 512, None)
bs = score6(pm, pl, rc, rn, rv, probs_all)
def run_score():
    out = score6(pm, pl, rc, rn, rv, probs_all)
    return (out.bp_score,)
log(f"score_fn: {timeit(run_score):.1f} ms")

def lev_fn():
    return np.stack([
        np.asarray(batched_levenshtein_auto(pm[gi], pl[gi], gm[gi], mode="NW"))
        for gi in range(pm.shape[0])])
log(f"lev (per-member Myers): {timeit(lev_fn):.1f} ms")

ks = _ks_jit(None)
log(f"ks full-S: {timeit(lambda: ks(bs.path_freq, tr)):.1f} ms")

def dots():
    a = dot_f32(bs.site_counts, uni_all)
    total = jnp.maximum(bs.kmer_breaks, 1).astype(jnp.float32)
    b = dot_f32(bs.site_counts / total[..., None], uni_all)
    return a, b
log(f"random dots: {timeit(dots):.1f} ms")
log("done")
