"""Device execution of CSX tables (single-chip executor).

The TPU replacement for the reference JIT subsystem (``include/sparsex/
internals/CsxJit.hpp:59-107``, ``src/templates/*.c``): instead of
Clang/LLVM-compiling a specialized C routine per thread from the set of
encoded patterns, the set of tables present *is* the specialization — the
jitted function's trace contains exactly one vectorized kernel per table
(see ``ops/kernels.py`` for the kernel classes and their TPU cost
rationale).

The jitted function takes the table arrays as arguments (a pytree), so the
compiled executable is cached per table *signature* (shapes + static
pattern metadata), mirroring how the reference caches one compiled routine
per pattern set.
"""

from __future__ import annotations

import functools
from typing import Optional, Tuple

import numpy as np

from sparsex_tpu.ops.kernels import local_contrib, static_meta, tables_to_arrays
from sparsex_tpu.preprocess.tables import CsxTables

# Re-exported for backward compatibility.
_static_meta = static_meta


@functools.lru_cache(maxsize=128)
def _compiled(meta: Tuple, dtype_str: str, use_pallas: bool = False):
    """Build + jit the executor for one static table signature.

    ``meta`` may carry a 6th element ``("dpages", T, q, npages)`` when the
    delta table uses the page-bucketed Pallas layout.
    """
    import jax
    import jax.numpy as jnp

    nrows, ncols = meta[0], meta[1]

    def fn(arrs, x, alpha, beta, y0):
        acc, _ = local_contrib(meta, arrs, x, nrows_part=nrows, ncols=ncols,
                               use_pallas=use_pallas)
        return alpha * acc + beta * y0

    return jax.jit(fn)


def _pallas_mode() -> Optional[bool]:
    """None = auto; True/False = forced."""
    from sparsex_tpu.config import Config
    mode = Config.instance().use_pallas
    if mode == "off":
        return False
    if mode == "on":
        return True
    return None


def _resolve_use_pallas(tables: CsxTables = None) -> bool:
    """Per-matrix policy for the fused DIA Pallas kernel.

    Measured on v5e: the XLA DIA window-sum overlaps with (hides under) the
    serial delta gather when leftover singles dominate, so a Pallas custom
    call there only adds serialization; when diagonals dominate (banded
    matrices) the fused Pallas kernel runs at HBM speed-of-light, ~6.5x the
    XLA formulation.  "auto" therefore picks Pallas iff the delta path is
    cheaper than the XLA DIA passes it would otherwise hide under:
    delta_nnz * ~16 ns  <  dia_rows * ~32 B / HBM_BW.
    """
    forced = _pallas_mode()
    if forced is not None:
        return forced
    from sparsex_tpu.ops.pallas_kernels import dia_pallas_ok
    if not dia_pallas_ok():
        return False
    if tables is None:
        return True
    delta_nnz = tables.delta.nnz if tables.delta else 0
    dia_rows = sum(t.ndiags for t in tables.dias) * tables.nrows
    return delta_nnz * 16e-9 < dia_rows * 32.0 / 600e9


class CsxExecutor:
    """Callable SpMV executor for one encoded partition.

    Keeps two array/meta variants: the plain-table form (always available;
    used when Pallas is off or the backend lacks it) and, built lazily, the
    page-bucketed delta form (see ``pallas_kernels.build_delta_pages`` —
    the single applicability gate).  The per-call config decides which
    variant executes.
    """

    def __init__(self, tables: CsxTables):
        self.tables = tables
        self.meta = static_meta(tables)
        self.arrays = tables_to_arrays(tables)
        self._dtype = str(np.dtype(tables.delta.vals.dtype)
                          if tables.delta is not None else "float64")
        self._pages_tried = False
        self._pages_meta = None
        self._pages_arrays = None

    def _maybe_build_pages(self) -> None:
        """Lazily reorganize the delta table into the page-bucketed layout
        (host-side argsort by column; done once per executor).
        ``build_delta_pages`` itself decides applicability."""
        if self._pages_tried:
            return
        self._pages_tried = True
        d = self.tables.delta
        if d is None or not d.nnz:
            return
        from sparsex_tpu.ops.pallas_kernels import build_delta_pages
        rep, leftover = build_delta_pages(
            np.asarray(d.cols, dtype=np.int64),
            np.asarray(d.row_ids, dtype=np.int64),
            np.asarray(d.vals), self.tables.ncols, self.tables.nrows)
        if rep is None:
            return
        q, npages = rep.pop("q"), rep.pop("npages")
        T = rep["plo"].size
        arrays = dict(self.arrays)
        arrays["delta_pages"] = rep
        if leftover.size:
            lo = np.sort(leftover)
            arrays["delta"] = {
                "row_ids": d.row_ids[lo], "cols": d.cols[lo],
                "vals": d.vals[lo]}
        else:
            arrays["delta"] = None
        self._pages_arrays = arrays
        self._pages_meta = self.meta + (("dpages", T, q, npages),)

    def _pages_active(self) -> bool:
        if _pallas_mode() is False:
            return False
        from sparsex_tpu.ops.pallas_kernels import dia_pallas_ok
        if not dia_pallas_ok():
            return False
        self._maybe_build_pages()
        return self._pages_meta is not None

    def __call__(self, x, alpha=1.0, beta=0.0, y=None):
        import jax.numpy as jnp
        meta, arrays = self.meta, self.arrays
        if self._pages_active():
            meta, arrays = self._pages_meta, self._pages_arrays
        x = jnp.asarray(x)
        y0 = (jnp.zeros(meta[0], dtype=x.dtype)
              if y is None else jnp.asarray(y))
        fn = _compiled(meta, self._dtype, _resolve_use_pallas(self.tables))
        return fn(arrays, x, x.dtype.type(alpha), x.dtype.type(beta), y0)
