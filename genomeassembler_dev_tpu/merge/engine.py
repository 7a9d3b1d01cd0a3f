"""Solution assembly: shuffled ordering ensemble -> merged, deduplicated,
canonically sorted solution list.

Semantics follow the reference exactly (10,000 orderings own path, 20,000
velvet path; lib/DeNovoAssembler.cpp:194-305, lib/BreakageScorer.cpp:79-174)
with one documented divergence: the reference's final length sort is
std::sort (unstable), so its equal-length tie order is unspecified; we order
ties lexicographically. The solution *set* is bit-identical.

Dispatches to the native threaded engine when available, else the spec.
"""

from __future__ import annotations

from genomeassembler_dev_tpu.merge import native
from genomeassembler_dev_tpu.spec import reference_semantics as spec


def assemble_solutions(
    contigs: list[str],
    dbg_kmer: int,
    seed: int,
    n_orderings: int = 10000,
    backend: str = "auto",
    n_threads: int | None = None,
) -> list[str]:
    """Merge the shuffled ordering ensemble of `contigs` into solutions,
    sorted by (-length, lexicographic)."""
    if backend == "auto":
        backend = "native" if native.available() else "spec"
    if backend == "native":
        return native.assemble_native(contigs, dbg_kmer, seed, n_orderings, n_threads)
    if backend == "device":
        from genomeassembler_dev_tpu.merge.device import assemble_device

        return assemble_device(contigs, dbg_kmer, seed, n_orderings)
    if backend == "spec":
        orderings = spec.shuffled_orderings(contigs, seed, n_orderings)
        return spec.assemble_solutions(orderings, dbg_kmer)
    raise ValueError(f"unknown backend {backend!r}")
