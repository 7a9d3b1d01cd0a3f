"""De Bruijn graph construction and contig traversal, TPU-native."""
