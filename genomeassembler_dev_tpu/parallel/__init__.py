"""Multi-chip scale-out: meshes, sharded pipeline steps, sharded tables."""
