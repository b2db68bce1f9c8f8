"""Device execution of CSX tables.

The TPU replacement for the reference JIT subsystem (``include/sparsex/
internals/CsxJit.hpp:59-107``, ``src/templates/*.c``): instead of
Clang/LLVM-compiling a specialized C routine per thread from the set of
encoded patterns, the set of tables present *is* the specialization — this
module builds one jitted JAX function whose trace contains exactly one
vectorized kernel per table:

- delta table  -> sorted segment-sum over ``vals * x[cols]``
  (ref ``delta_tmpl.c`` gap decode loop);
- run tables   -> 2-D gather of x at ``col + dc*j``, elementwise FMA with the
  padded unit values, then a row reduce + scatter-add at ``row + dr*j``
  (ref ``horiz_tmpl.c``/``vert_tmpl.c``/``diag_tmpl.c``/``rdiag_tmpl.c``);
- block tables -> batched (U, br, bc) x (U, bc) matvec on the MXU + strided
  scatter-add (ref ``block_row_tmpl.c``/``block_col_tmpl.c``).

Padded lanes carry zero values and clamped indices, contributing exactly 0.
The jitted function takes the table arrays as arguments (a pytree), so the
compiled executable is cached per table *signature* (shapes + static pattern
metadata), mirroring how the reference caches one compiled routine per
pattern set.
"""

from __future__ import annotations

import functools
from typing import Any, Dict, List, Tuple

import numpy as np

from sparsex_tpu.preprocess.encodings import EncType
from sparsex_tpu.preprocess.tables import CsxTables
from sparsex_tpu.preprocess.xform import run_step


def tables_to_arrays(tables: CsxTables) -> Dict[str, Any]:
    """Extract the array pytree (host numpy; device transfer on first call)."""
    arrs: Dict[str, Any] = {"delta": None, "runs": [], "blocks": []}
    if tables.delta is not None and tables.delta.nnz:
        arrs["delta"] = {
            "row_ids": tables.delta.row_ids,
            "cols": tables.delta.cols,
            "vals": tables.delta.vals,
        }
    for t in tables.runs:
        arrs["runs"].append({"rows": t.rows, "cols": t.cols, "vals": t.vals})
    for t in tables.blocks:
        arrs["blocks"].append({"rows": t.rows, "cols": t.cols, "vals": t.vals})
    return arrs


def _static_meta(tables: CsxTables) -> Tuple:
    runs = tuple((int(t.enc), t.delta, t.width) for t in tables.runs)
    blocks = tuple((int(t.enc), t.br, t.bc) for t in tables.blocks)
    return (tables.nrows, tables.ncols, runs, blocks)


@functools.lru_cache(maxsize=128)
def _compiled(meta: Tuple, dtype_str: str):
    """Build + jit the executor for one static table signature."""
    import jax
    import jax.numpy as jnp

    nrows, ncols, run_meta, block_meta = meta

    def fn(arrs, x, alpha, beta, y0):
        dtype = x.dtype
        acc = jnp.zeros(nrows, dtype=dtype)
        d = arrs["delta"]
        if d is not None:
            prod = d["vals"] * jnp.take(x, d["cols"], mode="clip")
            acc = acc + jax.ops.segment_sum(
                prod, d["row_ids"], num_segments=nrows,
                indices_are_sorted=True)
        for (enc_i, delta, width), t in zip(run_meta, arrs["runs"]):
            enc = EncType(enc_i)
            sr, sc = run_step(enc)
            lane = jnp.arange(width, dtype=jnp.int32)
            gidx = t["cols"][:, None] + (sc * delta) * lane[None, :]
            xg = jnp.take(x, jnp.clip(gidx, 0, ncols - 1), axis=0)
            contrib = t["vals"] * xg
            if sr == 0:
                # horizontal: one output row per unit
                acc = acc.at[t["rows"]].add(
                    jnp.sum(contrib, axis=1), mode="drop")
            else:
                ridx = t["rows"][:, None] + (sr * delta) * lane[None, :]
                acc = acc.at[jnp.clip(ridx, 0, nrows - 1).ravel()].add(
                    contrib.ravel(), mode="drop")
        for (enc_i, br, bc), t in zip(block_meta, arrs["blocks"]):
            cidx = t["cols"][:, None] + jnp.arange(bc, dtype=jnp.int32)[None, :]
            xg = jnp.take(x, jnp.clip(cidx, 0, ncols - 1), axis=0)  # (U, bc)
            contrib = jnp.einsum(
                "urc,uc->ur", t["vals"], xg,
                preferred_element_type=dtype)  # (U, br)
            ridx = t["rows"][:, None] + jnp.arange(br, dtype=jnp.int32)[None, :]
            acc = acc.at[jnp.clip(ridx, 0, nrows - 1).ravel()].add(
                contrib.astype(dtype).ravel(), mode="drop")
        return alpha * acc + beta * y0

    return jax.jit(fn)


class CsxExecutor:
    """Callable SpMV executor for one encoded partition."""

    def __init__(self, tables: CsxTables):
        self.tables = tables
        self.meta = _static_meta(tables)
        self.arrays = tables_to_arrays(tables)
        self._dtype = str(np.dtype(tables.delta.vals.dtype)
                          if tables.delta is not None else "float64")

    def __call__(self, x, alpha=1.0, beta=0.0, y=None):
        import jax.numpy as jnp
        x = jnp.asarray(x)
        y0 = (jnp.zeros(self.meta[0], dtype=x.dtype)
              if y is None else jnp.asarray(y))
        fn = _compiled(self.meta, self._dtype)
        return fn(self.arrays, x, x.dtype.type(alpha), x.dtype.type(beta), y0)
