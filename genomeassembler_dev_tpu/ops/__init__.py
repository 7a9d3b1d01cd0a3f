"""Device (JAX/XLA/Pallas) compute kernels: rolling k-mer windows, counting,
exact-match search, edit distance, and order statistics."""
