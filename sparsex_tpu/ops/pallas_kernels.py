"""Pallas TPU kernels for the hot SpMV paths.

The reference JIT-compiles per-pattern C loops (``src/templates/*.c``); on
TPU the hand-tuned inner loop is a Pallas kernel.  This module provides the
**fused multi-diagonal (DIA) kernel**: the XLA formulation of the DIA path
(sum of statically shifted x windows) re-reads x from HBM once per
diagonal; this kernel tiles the rows, loads each x tile (plus the offsets'
halo blocks) into VMEM once, and computes every diagonal's multiply-add
from VMEM — HBM traffic drops to one dv stream + one x pass + one y write,
the speed of light for banded SpMV.

Offsets are trace-time constants (part of the executor's meta signature),
so each matrix gets a specialized kernel — the TPU analogue of the
reference generating one C routine per encoded pattern set
(``CsxJit.hpp:417-673``).

Layout: offsets are grouped by block quotient ``q = (o + pad_lo) // TILE``;
each group reads x blocks ``i + q`` and ``i + q + 1`` (a within-2-block
window), and each diagonal is a static slice of that window.  Anti-diagonal
tables run the same kernel over the reversed x (an anti-diagonal is a
diagonal of the flipped frame).
"""

from __future__ import annotations

import functools
from typing import List, Sequence, Tuple

import numpy as np

TILE = 32 * 1024  # rows per grid step; x/dv blocks are (TILE,) f32 in VMEM
MAX_DIAGS_PALLAS = 64  # beyond this, fall back to the XLA window sum


def _ceil_to(x: int, m: int) -> int:
    return -(-x // m) * m


@functools.lru_cache(maxsize=64)
def _build_dia_kernel(offsets: Tuple[int, ...], nrows_pad: int,
                      xp_len: int, pad_lo: int, dtype_str: str):
    """Compile the fused DIA kernel for one static offset set.

    Returns ``fn(dv (D, nrows_pad), xp (xp_len,)) -> y (nrows_pad,)`` with
    ``y[r] = sum_k dv[k, r] * xp[r + offsets[k] + pad_lo]``.
    """
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    dtype = jnp.dtype(dtype_str)
    D = len(offsets)
    n_tiles = nrows_pad // TILE

    # group offsets by which x block (relative to the row tile) they start in
    qs = sorted({(o + pad_lo) // TILE for o in offsets})
    q_index = {q: i for i, q in enumerate(qs)}
    shifts = [(o + pad_lo) % TILE for o in offsets]
    groups = [q_index[(o + pad_lo) // TILE] for o in offsets]
    n_groups = len(qs)

    def kernel(dv_ref, *x_refs_and_out):
        x_lo = x_refs_and_out[:n_groups]
        x_hi = x_refs_and_out[n_groups:2 * n_groups]
        out_ref = x_refs_and_out[2 * n_groups]
        wins = [jnp.concatenate([x_lo[g][:], x_hi[g][:]])
                for g in range(n_groups)]
        total = jnp.zeros((TILE,), dtype=dtype)
        for k in range(D):
            w = wins[groups[k]]
            total = total + dv_ref[k, :] * jax.lax.slice(
                w, (shifts[k],), (shifts[k] + TILE,))
        out_ref[:] = total

    in_specs = [pl.BlockSpec((D, TILE), lambda i: (0, i),
                             memory_space=pltpu.VMEM)]
    for q in qs:
        in_specs.append(pl.BlockSpec(
            (TILE,), functools.partial(lambda i, q=q: (i + q,)),
            memory_space=pltpu.VMEM))
    for q in qs:
        in_specs.append(pl.BlockSpec(
            (TILE,), functools.partial(lambda i, q=q: (i + q + 1,)),
            memory_space=pltpu.VMEM))

    call = pl.pallas_call(
        kernel,
        grid=(n_tiles,),
        in_specs=in_specs,
        out_specs=pl.BlockSpec((TILE,), lambda i: (i,),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((nrows_pad,), dtype),
    )

    def fn(dv, xp):
        return call(dv, *([xp] * (2 * n_groups)))

    return fn


def dia_pallas_ok() -> bool:
    """Whether the Pallas DIA kernel can run on the current backend."""
    import jax
    try:
        return jax.default_backend() in ("tpu",)
    except Exception:
        return False


def dia_spmv_pallas(offsets: Sequence[int], dv, x, nrows_part: int,
                    ncols: int):
    """Fused multi-diagonal SpMV partial: y[r] = sum_k dv[k,r]*x[r+o_k].

    ``offsets`` static python ints; ``dv`` (D, nrows_part); returns
    (nrows_part,).  Caller guarantees dv == 0 wherever r + o is outside
    [0, ncols).
    """
    import jax.numpy as jnp

    offsets = tuple(int(o) for o in offsets)
    D = len(offsets)
    nrows_pad = _ceil_to(max(nrows_part, 1), TILE)
    pad_lo = _ceil_to(max(0, -min(offsets)), TILE)
    # xp must cover block (i + q_max + 1) * TILE for the last tile
    q_max = max((o + pad_lo) // TILE for o in offsets)
    xp_len = max(_ceil_to(ncols + pad_lo, TILE),
                 (nrows_pad // TILE + q_max + 2) * TILE)
    xp = jnp.zeros(xp_len, dtype=x.dtype)
    xp = xp.at[pad_lo: pad_lo + ncols].set(x)
    dvp = dv
    if nrows_pad != nrows_part:
        dvp = jnp.pad(dv, ((0, 0), (0, nrows_pad - nrows_part)))
    fn = _build_dia_kernel(offsets, nrows_pad, xp_len, pad_lo,
                           str(np.dtype(x.dtype)))
    y = fn(dvp, xp)
    return y[:nrows_part]
