"""Compute kernels: the CSR oracle, per-pattern CSX executors, vector algebra."""
