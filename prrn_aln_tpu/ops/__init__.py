"""Compute kernels: banded anti-diagonal wavefront DP and profile ops."""
