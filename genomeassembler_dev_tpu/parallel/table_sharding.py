"""Hash-sharded QueryTable lookups with all-to-all exchange.

The k=8 table is only 64Ki floats, so replication is the right default
(SURVEY.md §2.2). This module is the demonstration of the N-host path for
tables that do NOT fit per-device (larger k, learned models): the table is
row-sharded by the code's high bits, and lookups route each query code to its
owning shard and the probabilities back — two `all_to_all` collectives
around a local gather.

Routing uses fixed-capacity buckets (static shapes): each device prepares
`cap` query slots per destination shard; overflow is detected and reported
so callers can re-run with a larger cap (counts are data-dependent, shapes
cannot be).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax import shard_map
from jax.sharding import Mesh, PartitionSpec as P


def make_sharded_table_lookup(mesh: Mesh, table_size: int, axis: str = "tp",
                              cap: int | None = None):
    """Returns fn(codes [B, Nl-sharded], table [table_size-sharded]) ->
    (probs [B, N], overflow_count scalar).

    codes sharded over `axis` along N; table rows sharded over `axis`.
    """
    n_shard = mesh.shape[axis]
    if table_size % n_shard:
        raise ValueError("table size must divide the shard count")
    rows_local = table_size // n_shard

    @partial(
        shard_map,
        mesh=mesh,
        in_specs=(P(None, axis), P(axis)),
        out_specs=(P(None, axis), P()),
        check_vma=False,
    )
    def lookup(codes, table_shard):
        B, Nl = codes.shape
        flat = codes.reshape(-1).astype(jnp.int32)
        n = flat.shape[0]
        bucket_cap = cap or max(64, (2 * n) // n_shard)

        dest = flat // rows_local  # owning shard of each code
        # stable order of queries per destination bucket
        order = jnp.argsort(dest, stable=True)
        sorted_dest = dest[order]
        # position of each query within its destination bucket
        ones = jnp.ones_like(sorted_dest)
        seg_start = jnp.searchsorted(sorted_dest, jnp.arange(n_shard))
        pos_in_bucket = jnp.arange(n) - seg_start[sorted_dest]

        # scatter queries into [n_shard, cap] slots (+ their origin index)
        slot_ok = pos_in_bucket < bucket_cap
        rows = jnp.where(slot_ok, sorted_dest, n_shard)
        cols = jnp.minimum(pos_in_bucket, bucket_cap - 1)
        send_codes = jnp.full((n_shard, bucket_cap), 0, jnp.int32).at[
            rows, cols
        ].set(flat[order], mode="drop")
        send_valid = jnp.zeros((n_shard, bucket_cap), bool).at[
            rows, cols
        ].set(slot_ok, mode="drop")
        overflow = (~slot_ok).sum()

        # route queries to owners, gather locally, route results back
        recv_codes = jax.lax.all_to_all(send_codes, axis, 0, 0, tiled=False)
        recv_valid = jax.lax.all_to_all(send_valid, axis, 0, 0, tiled=False)
        local = recv_codes - jax.lax.axis_index(axis) * rows_local
        local = jnp.clip(local, 0, rows_local - 1)
        vals = jnp.where(recv_valid, table_shard[local], 0.0)
        back = jax.lax.all_to_all(vals, axis, 0, 0, tiled=False)

        # un-bucket: value for sorted query q is back[dest_q, pos_q]
        got_sorted = back[rows.clip(0, n_shard - 1), cols]
        out = jnp.zeros(n, back.dtype).at[order].set(
            jnp.where(slot_ok, got_sorted, jnp.nan)
        )
        return out.reshape(B, Nl), jax.lax.psum(overflow, axis)

    return lookup
