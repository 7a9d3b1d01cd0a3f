"""genomeassembler_dev_tpu — a TPU-native de novo genome assembly framework.

A from-scratch JAX/XLA/Pallas re-design of the capabilities of
SahakyanLab/GenomeAssembler_dev (reference layout: lib/GenerateReads.R,
lib/DeNovoAssembler.R, lib/DeNovoAssembler.cpp, lib/BreakageScorer.cpp):

* simulate ultrasonication-biased NGS reads from genome segments, weighted by
  per-position octamer breakage probability (ref: lib/GenerateReads.R:235-484),
* assemble reads into contigs with a weighted de Bruijn graph
  (ref: lib/DeNovoAssembler.cpp:85-206),
* merge shuffled contig orderings greedily into candidate solutions
  (ref: lib/DeNovoAssembler.cpp:214-305),
* score every solution by breakage probability, Kolmogorov-Smirnov statistic
  and Levenshtein distance (ref: lib/DeNovoAssembler.cpp:316-477,
  lib/DeNovoAssembler.R:318-479).

Unlike the reference (single-threaded R + Rcpp/C++17), the compute path here is
2-bit-packed integer k-mer math on TPU: dense QueryTable lookups, sort/segment
de Bruijn graph construction, batched exact-match scoring, and a prefix-scan
formulation of the edit-distance DP, with jax.sharding meshes for multi-chip
scale-out. The branchy per-ordering merge fixpoint runs in a multithreaded C++
native engine (also the single-core baseline for benchmarks).
"""

__version__ = "0.1.0"

import os as _os

# Remote TPU compiles in tunneled environments can take minutes per program;
# the persistent cache turns every repeat (across processes and study runs)
# into a few seconds. Opt out with GADEV_NO_COMPILE_CACHE=1.
if not _os.environ.get("GADEV_NO_COMPILE_CACHE"):
    try:
        import jax as _jax

        _jax.config.update(
            "jax_compilation_cache_dir",
            _os.environ.get("GADEV_COMPILE_CACHE_DIR",
                            _os.path.expanduser("~/.cache/jax_gadev")),
        )
        _jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:  # pragma: no cover - cache is best-effort
        pass

from genomeassembler_dev_tpu.core import encoding, kmers, querytable  # noqa: F401
