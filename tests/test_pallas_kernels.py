"""Pallas kernels vs spec (interpret mode on CPU)."""

import numpy as np
import pytest
import jax.numpy as jnp

from genomeassembler_dev_tpu.core.encoding import encode_dna
from genomeassembler_dev_tpu.ops.pallas.edit_distance_kernel import (
    batched_levenshtein_pallas,
)
from genomeassembler_dev_tpu.spec import reference_semantics as spec


def rand_dna(rng, n):
    return "".join(rng.choice(list("ACGT"), size=n))


class TestPallasLevenshtein:
    @pytest.mark.parametrize("mode", ["NW", "HW"])
    def test_vs_spec(self, mode):
        rng = np.random.default_rng(0)
        target = rand_dna(rng, 90)
        queries = [rand_dna(rng, int(rng.integers(1, 120))) for _ in range(9)]
        queries += [target, target[10:40]]
        M = max(len(q) for q in queries)
        qmat = np.zeros((len(queries), M), np.uint8)
        qlen = np.array([len(q) for q in queries], np.int32)
        for i, q in enumerate(queries):
            qmat[i, : len(q)] = encode_dna(q)
        out = np.asarray(batched_levenshtein_pallas(
            jnp.asarray(qmat), jnp.asarray(qlen), jnp.asarray(encode_dna(target)),
            mode=mode, block_b=16, interpret=True,
        ))
        expect = [spec.levenshtein(q, target, mode=mode) for q in queries]
        assert out.tolist() == expect

    def test_large_padding(self):
        rng = np.random.default_rng(1)
        target = rand_dna(rng, 40)
        q = rand_dna(rng, 200)  # query longer than a lane tile
        out = batched_levenshtein_pallas(
            jnp.asarray(encode_dna(q))[None, :], jnp.asarray([200], jnp.int32),
            jnp.asarray(encode_dna(target)), interpret=True, block_b=8,
        )
        assert int(out[0]) == spec.levenshtein(q, target)


class TestPallasHistogram:
    @pytest.mark.parametrize("k", [4, 8, 9])
    def test_matches_einsum_version(self, k):
        from genomeassembler_dev_tpu.ops.mxu import count_kmers_mxu
        from genomeassembler_dev_tpu.ops.pallas.histogram_kernel import (
            count_kmers_mxu_pallas,
        )

        rng = np.random.default_rng(k)
        codes = rng.integers(0, 4**k, size=(2, 700)).astype(np.int32)
        valid = rng.random((2, 700)) < 0.9
        a = np.asarray(count_kmers_mxu_pallas(
            jnp.asarray(codes), jnp.asarray(valid), k, chunk=256, interpret=True
        ))
        b = np.asarray(count_kmers_mxu(jnp.asarray(codes), jnp.asarray(valid), k))
        np.testing.assert_array_equal(a, b)


class TestMyersLevenshtein:
    @pytest.mark.parametrize("mode", ["NW", "HW"])
    def test_vs_spec(self, mode):
        from genomeassembler_dev_tpu.ops.pallas.myers_kernel import (
            batched_levenshtein_myers,
        )

        rng = np.random.default_rng(0)
        target = rand_dna(rng, 90)
        queries = [rand_dna(rng, int(rng.integers(1, 120))) for _ in range(9)]
        queries += [target, target[10:40]]
        M = max(len(q) for q in queries)
        qmat = np.zeros((len(queries), M), np.uint8)
        qlen = np.array([len(q) for q in queries], np.int32)
        for i, q in enumerate(queries):
            qmat[i, : len(q)] = encode_dna(q)
        out = np.asarray(batched_levenshtein_myers(
            jnp.asarray(qmat), jnp.asarray(qlen), jnp.asarray(encode_dna(target)),
            mode=mode, block_b=128, interpret=True,
        ))
        expect = [spec.levenshtein(q, target, mode=mode) for q in queries]
        assert out.tolist() == expect

    @pytest.mark.parametrize("mode", ["NW", "HW"])
    def test_multiword_and_empty(self, mode):
        # query spanning several 32-bit words + empty-query edge case
        from genomeassembler_dev_tpu.ops.pallas.myers_kernel import (
            batched_levenshtein_myers,
        )

        rng = np.random.default_rng(1)
        target = rand_dna(rng, 150)
        queries = [rand_dna(rng, 200), target + "ACGT" * 10, ""]
        M = max(len(q) for q in queries)
        qmat = np.zeros((len(queries), M), np.uint8)
        qlen = np.array([len(q) for q in queries], np.int32)
        for i, q in enumerate(queries):
            if q:
                qmat[i, : len(q)] = encode_dna(q)
        out = np.asarray(batched_levenshtein_myers(
            jnp.asarray(qmat), jnp.asarray(qlen), jnp.asarray(encode_dna(target)),
            mode=mode, block_b=128, interpret=True,
        ))
        expect = [spec.levenshtein(q, target, mode=mode) for q in queries]
        assert out.tolist() == expect
