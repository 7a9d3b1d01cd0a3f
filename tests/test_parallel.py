"""Sharded steps on the 8-virtual-device CPU mesh vs unsharded references."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp
import optax

from genomeassembler_dev_tpu.core.querytable import TOTAL, load_default_query_table
from genomeassembler_dev_tpu.models import breakage_model as bm
from genomeassembler_dev_tpu.parallel import mesh as pmesh
from genomeassembler_dev_tpu.parallel import sharding as psh
from genomeassembler_dev_tpu.score.breakscore import breakscore
from genomeassembler_dev_tpu.sim.segments import synthetic_genome
from genomeassembler_dev_tpu.core.encoding import encode_dna


@pytest.fixture(scope="module")
def table():
    return load_default_query_table()


def test_mesh_shapes():
    m = pmesh.make_mesh(seg=2, read=2, tp=2)
    assert m.shape == {"seg": 2, "read": 2, "tp": 2}
    m2 = pmesh.make_mesh(read=2)
    assert m2.shape["seg"] == len(jax.devices()) // 2


class TestSimCount:
    def test_read_shard_merges(self, table):
        mesh = pmesh.make_mesh(seg=2, read=4, tp=1)
        B, L, rlen, k = 4, 256, 12, 4
        genomes = np.stack([encode_dna(synthetic_genome(i, L)) for i in range(B)])
        seeds = np.arange(B, dtype=np.int32)
        step = psh.make_sim_count_step(mesh, rlen, n_draws=64, count_k=k)
        counts = np.asarray(step(
            jnp.asarray(genomes), jnp.asarray(seeds),
            jnp.asarray(table.probs[8], jnp.float32),
        ))
        assert counts.shape == (B, 4**k)
        # each segment contributes 64 draws (minus boundary discards), each
        # read has rlen-k+1 k-mers
        per_read_kmers = rlen - k + 1
        assert (counts.sum(axis=1) <= 64 * per_read_kmers).all()
        assert (counts.sum(axis=1) > 0).all()

    def test_seg_axis_independence(self, table):
        # same segments, different mesh splits -> same counts
        B, L, rlen, k = 2, 200, 10, 3
        genomes = np.stack([encode_dna(synthetic_genome(i + 7, L)) for i in range(B)])
        seeds = np.arange(B, dtype=np.int32)
        probs = jnp.asarray(table.probs[8], jnp.float32)
        out = {}
        for segs, reads in [(1, 4), (2, 2), (2, 4)]:
            if segs * reads * 1 > len(jax.devices()):
                continue
            mesh = pmesh.make_mesh(seg=segs, read=reads, tp=1)
            step = psh.make_sim_count_step(mesh, rlen, n_draws=32, count_k=k)
            out[(segs, reads)] = np.asarray(step(jnp.asarray(genomes), jnp.asarray(seeds), probs))
        # read-axis split changes the key folding, so only compare same read counts
        if (1, 4) in out and (2, 4) in out:
            np.testing.assert_array_equal(out[(1, 4)], out[(2, 4)])


class TestShardedBreakscore:
    def test_matches_unsharded(self, table):
        rng = np.random.default_rng(0)
        mesh = pmesh.make_mesh(seg=2, read=2, tp=2)
        B, S, L, U, R = 2, 3, 64, 8, 12
        paths = rng.integers(0, 4, size=(B, S, L)).astype(np.uint8)
        plens = np.full((B, S), L, np.int32)
        # reads: slices of the paths
        rcodes = np.zeros((B, U, R), np.uint8)
        for b in range(B):
            for u in range(U):
                s = int(rng.integers(0, S))
                st = int(rng.integers(0, L - R))
                rcodes[b, u] = paths[b, s, st : st + R]
        rcounts = np.ones((B, U), np.int32)
        rvalid = np.ones((B, U), bool)
        probs = jnp.asarray(table.combined, jnp.float32)

        step = psh.make_breakscore_step(mesh)
        got = np.asarray(step(
            jnp.asarray(paths), jnp.asarray(plens), jnp.asarray(rcodes),
            jnp.asarray(rcounts), jnp.asarray(rvalid), probs,
        ))

        for b in range(B):
            bs = breakscore(
                jnp.asarray(paths[b]), jnp.asarray(plens[b]), jnp.asarray(rcodes[b]),
                jnp.asarray(rcounts[b]), jnp.asarray(rvalid[b]), probs,
                read_chunk=128,
            )
            np.testing.assert_allclose(got[b], np.asarray(bs.bp_score), rtol=1e-5)


class TestShardedTrain:
    def test_loss_decreases_and_matches_unsharded(self, table):
        mesh = pmesh.make_mesh(seg=2, read=2, tp=2)
        opt = optax.adam(1e-3)
        step, pshard, bshard = psh.make_sharded_train_step(mesh, opt)
        params = bm.init_params(jax.random.key(0), hidden=64)
        opt_state = opt.init(params)
        logp = jnp.log(jnp.asarray(table.probs[8], jnp.float32))
        key = jax.random.key(1)
        losses = []
        for i in range(5):
            key, sub = jax.random.split(key)
            codes = jax.random.randint(sub, (256,), 0, logp.shape[0])
            params, opt_state, loss = step(params, opt_state, codes, logp[codes])
            losses.append(float(loss))
        assert losses[-1] < losses[0]
