"""Tests for the executable spec (pure-Python reference semantics)."""

import numpy as np
import pytest

from genomeassembler_dev_tpu.core.querytable import QueryTable, TOTAL
from genomeassembler_dev_tpu.spec import reference_semantics as spec


def sliding_kmers(s: str, k: int) -> list[str]:
    return [s[i : i + k] for i in range(len(s) - k + 1)]


class TestContigs:
    def test_linear_genome_single_contig(self):
        g = "ACGTTGCAAGGTC"
        kmers = sliding_kmers(g, 5)
        contigs = spec.get_contig_set(kmers, 5)
        assert contigs == [g]

    def test_contig_set_read_order_invariant(self):
        g = "ACGTACGGACGTTACGA"
        kmers = sliding_kmers(g, 4)
        a = spec.get_contig_set(kmers, 4)
        b = spec.get_contig_set(list(reversed(kmers)), 4)
        c = spec.get_contig_set(kmers * 3, 4)  # multiplicity discarded
        assert a == b == c

    def test_branching_hand_case(self):
        # Two 4-mers sharing the prefix ACG: branch at node ACG (out=2).
        kmers = ["ACGT", "ACGA"]
        contigs = spec.get_contig_set(kmers, 4)
        # node ACG: in=0,out=2 -> branch. Walks: ACG->CGT (dead end: emits T),
        # ACG->CGA (dead end: emits A).
        assert contigs == ["ACGA", "ACGT"]

    def test_repeat_creates_branch(self):
        # genome with an exact repeat long enough to split contigs
        g = "AACGTACCCGTACTT"  # 'CGTAC' appears twice
        k = 4
        contigs = spec.get_contig_set(sliding_kmers(g, k), k)
        # The full genome must be reconstructable by merging contigs
        sols = spec.assemble_solutions(
            spec.shuffled_orderings(contigs, 1234, 50), k
        )
        assert g in sols

    def test_isolated_cycle_unreachable(self):
        # A pure cycle has no branch nodes -> no walks -> no contigs,
        # matching the reference (walks only start at branch nodes).
        kmers = ["ACA", "CAC"]  # ACA -> CA -> AC -> CA ... cycle AC<->CA
        assert spec.get_contig_set(kmers, 3) == []


class TestMerge:
    def test_simple_overlap(self):
        out = spec.merge_one_ordering(["ACGT", "GTAA"], 3)  # k starts at 2
        assert out == ["ACGTAA"]

    def test_no_overlap(self):
        # no suffix/prefix overlap at any k in {2,1}
        out = spec.merge_one_ordering(["AACC", "GGTT"], 3)
        assert sorted(out) == ["AACC", "GGTT"]

    def test_equal_strings_not_merged(self):
        # self-overlapping duplicates are skipped by the != guard
        out = spec.merge_one_ordering(["ACAC", "ACAC"], 3)
        assert out == ["ACAC", "ACAC"]

    def test_order_dependence(self):
        # classic ambiguity: B can attach to A or C first depending on order
        a, b, c = "AACG", "CGTT", "CGAA"
        r1 = spec.merge_one_ordering([a, b, c], 3)
        r2 = spec.merge_one_ordering([a, c, b], 3)
        # both merge a with one of b/c at k=2 first; results may differ
        assert r1 != [] and r2 != []
        flat = spec.assemble_solutions([[a, b, c], [a, c, b]], 3)
        assert len(flat) >= len(set(r1) | set(r2)) - 0  # dedup sanity

    def test_j_descending_scan_matches_fixpoint(self):
        # chain that only closes after multiple passes
        pieces = ["TTAA", "AAGG", "GGCC", "CCTT"]
        out = spec.merge_one_ordering(list(reversed(pieces)), 3)
        assert any(len(s) > 6 for s in out)

    def test_assemble_sorted_by_length_desc(self):
        sols = spec.assemble_solutions([["ACGT", "GGTT"], ["GGTT", "ACGT"]], 3)
        lens = [len(s) for s in sols]
        assert lens == sorted(lens, reverse=True)


class TestLevenshtein:
    def brute(self, a, b):
        # classic full-matrix DP, independent implementation
        m, n = len(a), len(b)
        dp = [[0] * (n + 1) for _ in range(m + 1)]
        for i in range(m + 1):
            dp[i][0] = i
        for j in range(n + 1):
            dp[0][j] = j
        for i in range(1, m + 1):
            for j in range(1, n + 1):
                dp[i][j] = min(
                    dp[i - 1][j] + 1,
                    dp[i][j - 1] + 1,
                    dp[i - 1][j - 1] + (a[i - 1] != b[j - 1]),
                )
        return dp[m][n]

    def test_known_cases(self):
        assert spec.levenshtein("kitten", "sitting") == 3
        assert spec.levenshtein("", "ACGT") == 4
        assert spec.levenshtein("ACGT", "") == 4
        assert spec.levenshtein("ACGT", "ACGT") == 0

    def test_vs_brute_random(self):
        rng = np.random.default_rng(0)
        bases = "ACGT"
        for _ in range(60):
            a = "".join(rng.choice(list(bases), size=rng.integers(0, 12)))
            b = "".join(rng.choice(list(bases), size=rng.integers(0, 12)))
            assert spec.levenshtein(a, b) == self.brute(a, b), (a, b)

    def test_hw_mode_infix(self):
        assert spec.levenshtein("CGT", "AACGTTT", mode="HW") == 0
        assert spec.levenshtein("CGA", "AACGTTT", mode="HW") == 1
        # query longer than target: must pay the difference
        assert spec.levenshtein("ACGTACGT", "CGT", mode="HW") == 5


class TestKS:
    def test_identical(self):
        x = np.array([1.0, 2.0, 3.0])
        assert spec.ks_2samp(x, x) == 0.0

    def test_disjoint(self):
        assert spec.ks_2samp([0.0, 0.1], [5.0, 6.0]) == 1.0

    def test_vs_scipy(self):
        scipy_stats = pytest.importorskip("scipy.stats")
        rng = np.random.default_rng(1)
        for _ in range(20):
            x = rng.normal(size=rng.integers(2, 50))
            y = rng.normal(size=rng.integers(2, 50))
            ours = spec.ks_2samp(x, y)
            ref = scipy_stats.ks_2samp(x, y).statistic
            assert np.isclose(ours, ref), (ours, ref)

    def test_heavy_ties(self):
        scipy_stats = pytest.importorskip("scipy.stats")
        x = np.zeros(100)
        x[:5] = [0.1, 0.2, 0.2, 0.3, 0.4]
        y = np.array([0.0, 0.2, 0.25])
        assert np.isclose(spec.ks_2samp(x, y), scipy_stats.ks_2samp(x, y).statistic)


class TestBreakscore:
    def test_break_site_edges(self):
        path = "ACGTACGTACGT"
        # pos >= 4: octamer centered at pos-4
        assert spec.break_site(path, 4, 8) == (0, "ACGTACGT")
        assert spec.break_site(path, 5, 8) == (1, "CGTACGTA")
        # start-of-path shrinkage ladder
        assert spec.break_site(path, 0, 8) == (0, "ACGTACGT")
        assert spec.break_site(path, 1, 8) == (0, "AC")
        assert spec.break_site(path, 2, 8) == (0, "ACGT")
        assert spec.break_site(path, 3, 8) == (0, "ACGTAC")

    def test_scoring_hand_case(self):
        table = QueryTable.uniform()
        p = 1.0 / TOTAL
        path = "ACGTACGTAACC"
        reads = ["ACGTACGT", "ACGTACGT", "GTAACC", "TTTTTT"]
        res = spec.calc_breakscore([path], reads, path, 8, table)
        # ACGTACGT matches at 0 (count 2, octamer ACGTACGT), GTAACC at 4
        # (count 1, octamer ACGTACGT too: start=0,len8) -> wait pos=4 ->
        # start=0 -> octamer path[0:8] = ACGTACGT. TTTTTT unmatched.
        assert res["kmer_breaks"][0] == 3
        assert np.isclose(res["bp_score"][0], 3 * p)
        assert np.isclose(res["bp_score_norm_by_break_freqs"][0], p)
        assert np.isclose(res["bp_score_norm_by_len"][0], 3 * p / len(path))
        assert res["lev_dist_vs_true"][0] == 0
        # path_freq sums to 1 over the table
        assert np.isclose(np.nansum(res["path_freq"][0]), 1.0)

    def test_no_match_gives_nan_freq(self):
        table = QueryTable.uniform()
        res = spec.calc_breakscore(["ACGTACGTA"], ["TTTTTTTTTTTT"], "ACGTACGTA", 8, table)
        assert res["kmer_breaks"][0] == 0
        assert np.isnan(res["path_freq"][0]).all()
        assert res["bp_score"][0] == 0.0

    def test_first_occurrence_only(self):
        table = QueryTable.uniform()
        # read occurs twice in path; only first occurrence's site counts
        path = "AAAACGTTTTTTAAAACGTTTT"
        reads = ["AACGT"]
        res = spec.calc_breakscore([path], reads, path, 8, table)
        assert res["kmer_breaks"][0] == 1


class TestEndToEndSpec:
    def test_tiny_pipeline(self):
        table = QueryTable.uniform()
        g = "ACGGTCATTGCAAGCTTACGGATCC"
        read_len, dbg_k = 8, 5
        starts = sorted(set(range(0, len(g) - read_len + 1, 2)) | {len(g) - read_len})
        reads = [g[i : i + read_len] for i in starts]
        kmers = [km for r in reads for km in sliding_kmers(r, dbg_k)]
        contigs = spec.get_contig_set(kmers, dbg_k)
        assert contigs, "contigs produced"
        orderings = spec.shuffled_orderings(contigs, 1234, 30)
        sols = spec.assemble_solutions(orderings, dbg_k)
        res = spec.calc_breakscore(sols, reads, g, 8, table)
        assert len(res["sequence"]) == len(sols)
        # the true genome should be among the solutions for this clean case
        assert g in sols
        i = sols.index(g)
        assert res["lev_dist_vs_true"][i] == 0
