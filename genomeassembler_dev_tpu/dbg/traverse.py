"""Vectorised contig traversal: every walk advances one node per step.

The reference walks from each branch node along each out-edge sequentially
(lib/DeNovoAssembler.cpp:171-189). Here all walks advance together in a
`while_loop`: at step t each active walk emits the last base of its current
node into column k-1+t and hops to succ[node]. A walk deactivates after
emitting a branch node or a dead end (matching the reference's stop-at-branch
and dict-empty break, cpp:179-186).

Walks cannot revisit a pass-through node: re-entering an (in=1, out=1) node
would require a second in-edge, contradicting in=1 — so walk length is
bounded by the node count and the loop terminates (the reference relies on
the same invariant).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from genomeassembler_dev_tpu.dbg.graph import DBG

PAD = jnp.uint8(255)


@partial(jax.jit, static_argnames=("max_len",))
def walk_contigs(g: DBG, max_len: int):
    """Walk every (branch-node, out-edge) pair to the next branch/dead end.

    Returns (contigs [E, max_len] uint8 codes PAD-padded, lens [E] int32,
    walk_valid [E] bool, overflow [E] bool). One walk per edge slot; slots
    whose edge prefix is not a branch node are invalid.
    """
    E = g.edges.shape[0]
    V = g.nodes.shape[0]
    k = g.k

    prefix = g.edges >> 2
    km1_mask = jnp.int32((1 << (2 * (k - 1))) - 1)
    suffix = g.edges & km1_mask
    p_idx = jnp.minimum(jnp.searchsorted(g.nodes, prefix), V - 1).astype(jnp.int32)
    s_idx = jnp.minimum(jnp.searchsorted(g.nodes, suffix), V - 1).astype(jnp.int32)

    walk_valid = g.edge_valid & g.branch[p_idx]

    # first k-1 columns: the branch prefix's characters
    cols = jnp.arange(max_len, dtype=jnp.int32)
    shifts = 2 * (k - 2 - cols[: k - 1])
    prefix_chars = ((prefix[:, None] >> shifts[None, :]) & 3).astype(jnp.uint8)
    buf0 = jnp.full((E, max_len), PAD)
    buf0 = buf0.at[:, : k - 1].set(jnp.where(walk_valid[:, None], prefix_chars, PAD))

    def cond(state):
        t, cur, active, buf, lens, overflow = state
        return active.any() & (t + k - 1 < max_len)

    def body(state):
        t, cur, active, buf, lens, overflow = state
        node_code = g.nodes[cur]
        ch = (node_code & 3).astype(jnp.uint8)
        col = k - 1 + t
        buf = buf.at[:, col].set(jnp.where(active, ch, buf[:, col]))
        lens = jnp.where(active, col + 1, lens)
        terminal = g.branch[cur] | (g.out_deg[cur] == 0)
        nxt = g.succ[cur]
        still = active & ~terminal & (nxt >= 0)
        cur = jnp.where(still, jnp.maximum(nxt, 0), cur)
        return t + 1, cur, still, buf, lens, overflow

    t0 = jnp.int32(0)
    active0 = walk_valid
    lens0 = jnp.where(walk_valid, k - 1, 0).astype(jnp.int32)
    overflow0 = jnp.zeros(E, bool)
    t, cur, active, buf, lens, overflow = jax.lax.while_loop(
        cond, body, (t0, s_idx, active0, buf0, lens0, overflow0)
    )
    overflow = active  # ran out of buffer while still walking
    return buf, lens, walk_valid, overflow
