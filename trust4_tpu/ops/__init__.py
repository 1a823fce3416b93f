"""Tensor-program building blocks: k-mer codes, indexes, counts."""
