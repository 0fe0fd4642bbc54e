"""Scalar kernels: cell index, geometry, images, hashing, text."""
