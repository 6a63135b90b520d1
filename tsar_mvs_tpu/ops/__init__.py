"""Compute kernels: sampling, NCC cost, checkerboard propagation, WMF,
SLIC, connectivity."""
