"""Core building blocks: DNA encoding, integer k-mer math, QueryTable assets,
and C++-compatible RNG replay for determinism contracts."""
