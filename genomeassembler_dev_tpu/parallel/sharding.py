"""Sharded pipeline steps: the multi-chip execution path.

Three demonstrable shardings, matching SURVEY.md §2.2's required inventory:

  * simulate+count (seg x read): each (segment-shard, read-shard) device
    simulates its slice of the breakpoint draws and counts k-mers locally;
    partial histograms merge with psum over the read axis — the reference's
    per-segment serial loop (scripts/02_…:33-53) becomes pure data
    parallelism, and its k-mer counting becomes a collective reduction.
  * breakscore (seg x read x tp): reads sharded over `read` (partial break
    counts psum'd), probability table row-sharded over `tp` (partial dots
    psum'd) — the sharded-QueryTable path.
  * MLP train step (dp x tp): batch sharded over (seg, read) as dp, hidden
    dimension sharded over tp via parameter shardings; GSPMD inserts the
    collectives.

All steps are shard_map/jit programs over a mesh from parallel.mesh and run
identically on a virtual CPU mesh (tests) and a real slice.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import optax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P
from jax import shard_map

from genomeassembler_dev_tpu.models import breakage_model as bm
from genomeassembler_dev_tpu.score.breakscore import breakscore
from genomeassembler_dev_tpu.sim.reads import simulate_reads
from genomeassembler_dev_tpu.ops.mxu import dot_f32


def make_sim_count_step(mesh: Mesh, read_len: int, n_draws: int, count_k: int,
                        break_kmer: int = 8):
    """Returns step(genomes [B, L], seeds [B] int32, probs_k8 [65536]) ->
    counts [B, 4^count_k] int32, reads/valid per shard merged over `read`.

    B must divide by the seg axis; n_draws splits over the read axis.
    """
    n_read = mesh.shape["read"]
    if n_draws % n_read:
        raise ValueError(f"n_draws={n_draws} not divisible by read axis {n_read}")
    draws_local = n_draws // n_read

    @partial(
        shard_map,
        mesh=mesh,
        in_specs=(P("seg", None), P("seg"), P()),
        out_specs=P("seg", None),
        check_vma=False,
    )
    def step(genomes, seeds, probs_k8):
        read_idx = jax.lax.axis_index("read")

        def per_segment(genome, seed):
            key = jax.random.fold_in(jax.random.key(seed), read_idx)
            rs = simulate_reads(key, genome, probs_k8, read_len, draws_local,
                                break_kmer)
            from genomeassembler_dev_tpu.ops.histogram import count_kmers
            from genomeassembler_dev_tpu.ops.windows import kmer_window_codes

            codes, valid = kmer_window_codes(rs.codes, count_k)
            valid = valid & rs.valid[:, None]
            return count_kmers(codes, valid, 4**count_k)

        local = jax.vmap(per_segment)(genomes, seeds)  # [Bl, 4^k]
        return jax.lax.psum(local, "read")

    return step


def make_breakscore_step(mesh: Mesh, break_kmer: int = 8, read_chunk: int = 128):
    """Returns step(paths [B,S,L], plens [B,S], rcodes [B,U,R], rcounts [B,U],
    rvalid [B,U], probs [TOTAL]) -> bp_score [B, S] float32.

    Reads sharded over `read` (U axis), table rows sharded over `tp`.
    """

    @partial(
        shard_map,
        mesh=mesh,
        in_specs=(
            P("seg", None, None), P("seg", None),
            P("seg", "read", None), P("seg", "read"), P("seg", "read"),
            P("tp"),
        ),
        out_specs=P("seg", None),
        check_vma=False,
    )
    def step(paths, plens, rcodes, rcounts, rvalid, probs_shard):
        # local break counts from the local read shard
        counts_local = jax.vmap(
            lambda pa, pl, rc, rn, rv: _site_counts(pa, pl, rc, rn, rv,
                                                    break_kmer, read_chunk)
        )(paths, plens, rcodes, rcounts, rvalid)  # [Bl, S, TOTAL]
        counts = jax.lax.psum(counts_local, "read")

        # row-sharded table: local slice dot, reduced over tp
        tp_idx = jax.lax.axis_index("tp")
        shard_size = probs_shard.shape[0]
        lo = tp_idx * shard_size
        local_counts = jax.lax.dynamic_slice_in_dim(counts, lo, shard_size, axis=2)
        partial_dot = dot_f32(local_counts, probs_shard)
        return jax.lax.psum(partial_dot, "tp")

    return step


def _site_counts(paths, plens, rcodes, rcounts, rvalid, break_kmer, read_chunk):
    """Break-count matrix only (no table needed)."""
    bs = breakscore(paths, plens, rcodes, rcounts, rvalid,
                    jnp.zeros((69904,), jnp.float32),
                    break_kmer=break_kmer, read_chunk=read_chunk)
    return bs.site_counts


def make_sharded_train_step(mesh: Mesh, optimizer: optax.GradientTransformation):
    """dp x tp sharded MLP train step via parameter/batch shardings; XLA
    (GSPMD) inserts the all-reduces."""
    dp = ("seg", "read")

    param_specs = {
        "w1": P(None, "tp"), "b1": P("tp"),
        "w2": P("tp", None), "b2": P(),
        "w3": P(None, None), "b3": P(),
    }

    def sharding(spec):
        return NamedSharding(mesh, spec)

    param_shardings = {k: sharding(v) for k, v in param_specs.items()}
    batch_sharding = sharding(P(dp))

    @partial(jax.jit, donate_argnums=(0, 1))
    def train_step(params, opt_state, codes, target_logp):
        params = jax.lax.with_sharding_constraint(params, param_shardings)
        codes = jax.lax.with_sharding_constraint(codes, batch_sharding)
        loss, grads = jax.value_and_grad(bm.loss_fn)(params, codes, target_logp)
        updates, opt_state = optimizer.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        params = jax.lax.with_sharding_constraint(params, param_shardings)
        return params, opt_state, loss

    return train_step, param_shardings, batch_sharding
