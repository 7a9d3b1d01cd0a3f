"""Host glue: reads -> device dBG -> canonical contig set.

The device produces fixed-capacity walk buffers; this module compacts them to
the canonical (sorted, deduplicated) contig list that the merge stage and the
reference semantics operate on (ref: lib/DeNovoAssembler.cpp:192).
"""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp

from genomeassembler_dev_tpu.core.encoding import decode_dna
from genomeassembler_dev_tpu.dbg.graph import build_dbg
from genomeassembler_dev_tpu.dbg.traverse import walk_contigs
from genomeassembler_dev_tpu.ops.windows import kmer_window_codes


def contigs_from_read_codes(
    read_codes: np.ndarray,  # [N, R] base codes
    read_valid: np.ndarray,  # [N] bool
    dbg_kmer: int,
    max_contig_len: int,
) -> list[str]:
    """Canonical contig set from packed reads. Raises if any walk overflows
    max_contig_len (caller should retry with a larger cap)."""
    codes = jnp.asarray(read_codes)
    kcodes, kvalid = kmer_window_codes(codes, dbg_kmer)
    kvalid = kvalid & jnp.asarray(read_valid)[:, None]
    g = build_dbg(kcodes.reshape(-1), kvalid.reshape(-1), dbg_kmer)
    buf, lens, walk_valid, overflow = walk_contigs(g, max_contig_len)
    return dedup_contigs(
        np.asarray(buf), np.asarray(lens), np.asarray(walk_valid), np.asarray(overflow)
    )


def dedup_contigs(
    buf: np.ndarray, lens: np.ndarray, walk_valid: np.ndarray, overflow: np.ndarray
) -> list[str]:
    if (overflow & walk_valid).any():
        raise ValueError(
            "contig walk overflowed max_contig_len; increase the cap"
        )
    out = set()
    for row, ln, ok in zip(buf, lens, walk_valid):
        if ok:
            out.add(decode_dna(row[:ln]))
    return sorted(out)
