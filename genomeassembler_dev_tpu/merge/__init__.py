"""Shuffled-ensemble greedy contig merging."""

from genomeassembler_dev_tpu.merge.engine import assemble_solutions  # noqa: F401
