"""Pallas TPU kernels for the NLSPN hot path."""
