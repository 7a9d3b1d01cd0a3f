"""Host glue: reads -> device dBG -> canonical contig set.

Chooses the dense direct-indexed graph (no sorts; k <= DENSE_MAX_K) or the
sparse sorted-unique graph, walks contigs by pointer doubling, and compacts
the fixed-capacity buffers to the canonical (sorted, deduplicated) contig
list that the merge stage and the reference semantics operate on
(ref: lib/DeNovoAssembler.cpp:192).
"""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp

from genomeassembler_dev_tpu.core.encoding import decode_dna
from genomeassembler_dev_tpu.dbg.dense import contigs_dense
from genomeassembler_dev_tpu.dbg.graph import contigs_sparse
from genomeassembler_dev_tpu.ops.windows import kmer_window_codes
from genomeassembler_dev_tpu.utils.compat import flaky_backend_retry

# 4^10 = 1M presence bins per segment; beyond this the sparse path wins
DENSE_MAX_K = 10


@flaky_backend_retry
def contigs_from_read_codes(
    read_codes: np.ndarray,  # [N, R] base codes
    read_valid: np.ndarray,  # [N] bool
    dbg_kmer: int,
    max_contig_len: int,
    max_walks: int | None = None,
) -> list[str]:
    """Canonical contig set from packed reads. Raises if a walk overflows
    max_contig_len or the walk capacity (caller retries with larger caps)."""
    codes = jnp.asarray(read_codes)
    if dbg_kmer > 31:
        raise ValueError("dbg_kmer > 31 is not supported (62-bit code limit)")
    if dbg_kmer > 15:
        # two-word code path for large k (standard for 100-150bp reads)
        from genomeassembler_dev_tpu.dbg.big_k import contigs_big_k, kmer_pair_codes

        hi, lo, kvalid = kmer_pair_codes(codes, dbg_kmer)
        kvalid = kvalid & jnp.asarray(read_valid)[:, None]
        if max_walks is None:
            max_walks = int(hi.size)
        buf, lens, valid, overflow, n_total, _ = contigs_big_k(
            hi, lo, kvalid, dbg_kmer, max_contig_len, max_walks
        )
        if int(n_total) > max_walks:
            raise ValueError(
                f"{int(n_total)} walks exceed capacity {max_walks}; raise max_walks"
            )
        return dedup_contigs(
            np.asarray(buf), np.asarray(lens), np.asarray(valid), np.asarray(overflow)
        )
    kcodes, kvalid = kmer_window_codes(codes, dbg_kmer)
    kvalid = kvalid & jnp.asarray(read_valid)[:, None]
    if max_walks is None:
        max_walks = int(kcodes.size)
    if dbg_kmer <= DENSE_MAX_K:
        node_cap = 1024
        while True:
            out = contigs_dense(kcodes, kvalid, dbg_kmer, max_contig_len,
                                max_walks, node_cap)
            if int(out[5]) <= node_cap:
                break
            node_cap = 1 << int(out[5] - 1).bit_length()  # retry, larger cap
        buf, lens, valid, overflow, n_total, _ = out
    else:
        buf, lens, valid, overflow, n_total, _ = contigs_sparse(
            kcodes, kvalid, dbg_kmer, max_contig_len, max_walks
        )
    if int(n_total) > max_walks:
        raise ValueError(
            f"{int(n_total)} walks exceed capacity {max_walks}; raise max_walks"
        )
    return dedup_contigs(
        np.asarray(buf), np.asarray(lens), np.asarray(valid), np.asarray(overflow)
    )


def dedup_contigs(
    buf: np.ndarray, lens: np.ndarray, walk_valid: np.ndarray, overflow: np.ndarray
) -> list[str]:
    if (overflow & walk_valid).any():
        raise ValueError("contig walk overflowed max_contig_len; increase the cap")
    out = set()
    for row, ln, ok in zip(buf, lens, walk_valid):
        if ok:
            out.add(decode_dna(row[:ln]))
    return sorted(out)
