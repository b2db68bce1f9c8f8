"""Input loaders: MatrixMarket files and CSR views."""

from sparsex_tpu.io.mmf import MMF, load_mmf
from sparsex_tpu.io.csr import CSR

__all__ = ["MMF", "load_mmf", "CSR"]
