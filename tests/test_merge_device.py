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
