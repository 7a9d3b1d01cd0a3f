"""On-hardware (TPU) correctness lane.

The main suite forces CPU + 8 virtual devices (conftest.py); Pallas kernels
there run in interpret mode. This lane spawns a subprocess WITHOUT the CPU
override and checks compiled-kernel correctness on the real chip:

  * dense dBG + doubling walk contigs == native C++ engine,
  * Myers bit-vector Levenshtein (NW + HW) == spec DP,
  * breakscore == spec on a small scored pipeline.

Skips cleanly when no TPU is reachable (or another process holds the chip —
e.g. a running study): the probe runs under a hard timeout.
"""

from __future__ import annotations

import os
import subprocess
import sys
import textwrap

import pytest

# real-chip probe lane: contends with any study occupying the TPU and pays
# on-hardware compiles — full lane only
pytestmark = pytest.mark.slow

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

_SCRIPT = textwrap.dedent("""
    import sys
    sys.path.insert(0, %r)
    import jax
    # rely on the environment's default platform order (axon tunnel first);
    # bail out cleanly when only CPU is reachable
    dev = jax.devices()[0]
    if dev.platform not in ("tpu", "axon"):
        print("NO_TPU", dev.platform)
        sys.exit(0)
    import numpy as np
    import jax.numpy as jnp

    from genomeassembler_dev_tpu.core.encoding import encode_dna
    from genomeassembler_dev_tpu.core.querytable import load_default_query_table
    from genomeassembler_dev_tpu.dbg.assemble import contigs_from_read_codes
    from genomeassembler_dev_tpu.merge import native
    from genomeassembler_dev_tpu.ops.pallas.myers_kernel import (
        batched_levenshtein_myers)
    from genomeassembler_dev_tpu.pipeline.assembler import pack_strings, pad_reads
    from genomeassembler_dev_tpu.score.breakscore import breakscore
    from genomeassembler_dev_tpu.sim.reads import dedup_reads
    from genomeassembler_dev_tpu.sim.segments import synthetic_genome
    from genomeassembler_dev_tpu.spec import reference_semantics as spec

    # 1. dense dBG + walk vs the native engine
    g = synthetic_genome(42, 400)
    reads = [g[i:i+12] for i in range(0, 388, 3)]
    codes = np.stack([encode_dna(r) for r in reads])
    valid = np.ones(len(reads), bool)
    tpu_contigs = contigs_from_read_codes(codes, valid, 9, 800)
    if native.available():
        assert tpu_contigs == native.contigs_from_reads_native(reads, 9), \\
            "TPU contigs != native"
    assert tpu_contigs == spec.get_contig_set(
        [r[i:i+9] for r in reads for i in range(len(r) - 8)], 9), \\
        "TPU contigs != spec"

    # 2. Myers kernel vs spec DP (compiled, not interpret mode)
    rng = np.random.default_rng(0)
    tgt = synthetic_genome(7, 700)
    qs = [synthetic_genome(100 + i, 300) for i in range(8)] + [tgt[50:350]]
    M = max(len(q) for q in qs)
    qm = np.full((len(qs), M), 0, np.uint8)
    ql = np.array([len(q) for q in qs], np.int32)
    for i, q in enumerate(qs):
        qm[i, : len(q)] = encode_dna(q)
    for mode in ("NW", "HW"):
        got = np.asarray(batched_levenshtein_myers(
            jnp.asarray(qm), jnp.asarray(ql), jnp.asarray(encode_dna(tgt)),
            mode=mode))
        want = [spec.levenshtein(q, tgt, mode=mode) for q in qs]
        assert got.tolist() == want, (mode, got.tolist(), want)

    # 3. breakscore vs spec
    table = load_default_query_table()
    paths = [g, g[:250], g[100:]]
    sreads = [g[i:i+12] for i in range(0, 380, 7)]
    pm, pl = pack_strings(paths, s_multiple=8, l_multiple=128)
    rc0 = np.stack([encode_dna(r) for r in sreads])
    uq, ct = dedup_reads(rc0, np.ones(len(sreads), bool))
    rc, rn, rv = pad_reads(uq, ct, 128)
    bs = breakscore(jnp.asarray(pm), jnp.asarray(pl), jnp.asarray(rc),
                    jnp.asarray(rn), jnp.asarray(rv),
                    jnp.asarray(table.combined, jnp.float32))
    want = spec.calc_breakscore(paths, sreads, g, 8, table)
    np.testing.assert_allclose(np.asarray(bs.bp_score)[:3],
                               want["bp_score"], rtol=2e-5)
    np.testing.assert_array_equal(np.asarray(bs.kmer_breaks)[:3],
                                  want["kmer_breaks"])

    # 4. biased traversal (sparse, compiled) produces walks for every
    # branch out-edge and substrings consistent with the k-mer set
    from genomeassembler_dev_tpu.dbg.biased import biased_contigs_sparse
    from genomeassembler_dev_tpu.dbg.assemble import dedup_contigs
    from genomeassembler_dev_tpu.ops.windows import kmer_window_codes

    k13 = 13
    codes13 = np.stack([encode_dna(r) for r in [g[i:i+20] for i in range(0, 380, 2)]])
    kc13, kv13 = kmer_window_codes(jnp.asarray(codes13), k13)
    probs8 = jnp.asarray(table.probs[8], jnp.float32)
    ob = biased_contigs_sparse(kc13, kv13, probs8, k13, 500, 64, node_cap=512)
    got_b = dedup_contigs(np.asarray(ob[0]), np.asarray(ob[1]),
                          np.asarray(ob[2]), np.asarray(ob[3]) & False)
    kset = {r[i:i+k13] for r in [g[j:j+20] for j in range(0, 380, 2)]
            for i in range(20 - k13 + 1)}
    assert got_b and all(
        all(c[i:i+k13] in kset for i in range(len(c) - k13 + 1))
        for c in got_b), "biased contigs contain foreign k-mers"
    print("TPU_LANE_OK")
""" % REPO)


@pytest.mark.skipif(os.environ.get("SKIP_TPU_LANE") == "1",
                    reason="explicitly disabled")
def test_compiled_kernels_on_tpu():
    env = {k: v for k, v in os.environ.items()
           if k not in ("JAX_PLATFORMS",)}
    env["XLA_FLAGS"] = ""  # no forced host device count
    try:
        r = subprocess.run([sys.executable, "-c", _SCRIPT], env=env,
                           capture_output=True, text=True, timeout=600)
    except subprocess.TimeoutExpired:
        pytest.skip("TPU unreachable (probe timed out — tunnel wedged or "
                    "chip held by another process)")
    if "NO_TPU" in r.stdout:
        pytest.skip(f"no TPU in subprocess: {r.stdout.strip()}")
    if r.returncode != 0 and any(s in r.stderr for s in (
            "RESOURCE_EXHAUSTED", "initialization failed",
            "No jellyfish device", "ABORTED")):
        pytest.skip("TPU busy or unreachable (held by another process?)")
    assert r.returncode == 0, r.stderr[-3000:]
    assert "TPU_LANE_OK" in r.stdout
