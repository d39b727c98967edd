"""Pallas TPU kernels for the post-processing hot path."""
