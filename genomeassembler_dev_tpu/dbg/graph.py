"""Device de Bruijn graph over integer k-mer codes.

The reference builds the graph with string hash maps
(lib/DeNovoAssembler.cpp:104-169). Key observation: because the adjacency map
stores *unique* suffixes per prefix (cpp:111-121), the edge set is exactly the
set of unique k-mer codes — (prefix, suffix) <-> k-mer bijectively. So the
whole graph is:

  * sort the k-mer codes, mark unique entries  (edges),
  * nodes = unique (k-1)-mer codes among prefixes+suffixes,
  * in/out-degree by scatter-add over node indices,
  * branch nodes: (in != 1 or out != 1) and out > 0   (cpp:160-169),
  * successor index for out==1 nodes (the only ones walks pass through).

All arrays are fixed-capacity with sentinel padding (code SENTINEL sorts
last), so every step is static-shape and jit-compatible.
"""

from __future__ import annotations

from dataclasses import dataclass
from functools import partial

import jax
import jax.numpy as jnp

SENTINEL = jnp.int32(2**31 - 1)


@partial(
    jax.tree_util.register_dataclass,
    data_fields=[
        "edges", "edge_valid", "nodes", "node_valid",
        "in_deg", "out_deg", "branch", "succ", "n_edges", "n_nodes",
    ],
    meta_fields=["k"],
)
@dataclass
class DBG:
    """Fixed-capacity device graph. E = edge capacity (= #input k-mers),
    V = node capacity (= 2E). Valid entries are a prefix of each array."""

    k: int
    edges: jnp.ndarray  # [E] sorted unique k-mer codes, SENTINEL-padded
    edge_valid: jnp.ndarray  # [E] bool
    nodes: jnp.ndarray  # [V] sorted unique (k-1)-mer codes, SENTINEL-padded
    node_valid: jnp.ndarray  # [V] bool
    in_deg: jnp.ndarray  # [V] int32
    out_deg: jnp.ndarray  # [V] int32
    branch: jnp.ndarray  # [V] bool
    succ: jnp.ndarray  # [V] int32 node index of unique successor, -1 otherwise
    n_edges: jnp.ndarray  # scalar int32
    n_nodes: jnp.ndarray  # scalar int32


def _sorted_unique(vals: jnp.ndarray, valid: jnp.ndarray):
    """Sort with invalids as SENTINEL; return (sorted, unique_mask, count)."""
    v = jnp.where(valid, vals, SENTINEL)
    s = jnp.sort(v)
    uniq = (s != SENTINEL) & jnp.concatenate(
        [jnp.ones((1,), bool), s[1:] != s[:-1]]
    )
    return s, uniq, uniq.sum()


@partial(jax.jit, static_argnames=("k",))
def build_dbg(kmer_codes: jnp.ndarray, kmer_valid: jnp.ndarray, k: int) -> DBG:
    """Build the graph from (possibly repeated) k-mer codes [N]."""
    n = kmer_codes.shape[0]
    s, uniq, n_edges = _sorted_unique(kmer_codes.astype(jnp.int32), kmer_valid)
    # compact unique edges to the front, SENTINEL elsewhere
    edges = jnp.sort(jnp.where(uniq, s, SENTINEL))
    edge_valid = edges != SENTINEL

    km1_mask = jnp.int32((1 << (2 * (k - 1))) - 1)
    prefix = jnp.where(edge_valid, edges >> 2, SENTINEL)
    suffix = jnp.where(edge_valid, edges & km1_mask, SENTINEL)

    both = jnp.concatenate([prefix, suffix])
    bs, buniq, n_nodes = _sorted_unique(both, both != SENTINEL)
    nodes = jnp.sort(jnp.where(buniq, bs, SENTINEL))
    node_valid = nodes != SENTINEL
    V = nodes.shape[0]

    # node index lookup by binary search (nodes sorted, SENTINEL at end)
    p_idx = jnp.searchsorted(nodes, prefix).astype(jnp.int32)
    s_idx = jnp.searchsorted(nodes, suffix).astype(jnp.int32)
    p_idx = jnp.where(edge_valid, p_idx, V)  # out-of-range -> dropped
    s_idx = jnp.where(edge_valid, s_idx, V)

    ones = edge_valid.astype(jnp.int32)
    out_deg = jnp.zeros(V, jnp.int32).at[p_idx].add(ones, mode="drop")
    in_deg = jnp.zeros(V, jnp.int32).at[s_idx].add(ones, mode="drop")

    branch = ((in_deg != 1) | (out_deg != 1)) & (out_deg > 0) & node_valid

    # successor: for out==1 prefixes exactly one edge writes; for out>1 all
    # writes store -1; out==0 slots keep the initial -1.
    single = out_deg.at[jnp.minimum(p_idx, V - 1)].get() == 1
    succ_val = jnp.where(single & edge_valid, s_idx, -1)
    succ = jnp.full(V, -1, jnp.int32).at[p_idx].set(succ_val, mode="drop")
    # out>1 nodes may have had a -1 or s_idx raced in .set (unordered);
    # force them to -1 explicitly:
    succ = jnp.where(out_deg == 1, succ, -1)

    return DBG(
        k=k,
        edges=edges,
        edge_valid=edge_valid,
        nodes=nodes,
        node_valid=node_valid,
        in_deg=in_deg,
        out_deg=out_deg,
        branch=branch,
        succ=succ,
        n_edges=n_edges.astype(jnp.int32),
        n_nodes=n_nodes.astype(jnp.int32),
    )
