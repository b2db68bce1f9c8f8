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
from typing import Sequence, Tuple

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


# ---------------------------------------------------------------------------
# Page-bucketed delta (leftover singles) gather kernel
# ---------------------------------------------------------------------------
# XLA serializes arbitrary gathers (~6.6 ns/element on v5e).  Mosaic's only
# vectorized gather is within one (8, 128) VREG (dynamic_gather along
# sublanes or lanes), so the x side of the delta SpMV is reorganized at
# build time: elements are sorted by column; consecutive 1024-element tiles
# then cover a *contiguous* range of Q x-pages (one page = 1024 elements =
# one (8,128) VREG tile), and the kernel gathers each tile's x values from
# VMEM with Q*8 lane-shuffles + selects.  The y-side scatter stays in XLA
# (it has no page locality), so the delta path cost drops from
# gather+segsum (~15 ns/el) to scatter-only (~7 ns/el).

PAGE = 1024           # x elements per page = one f32 VREG tile
DELTA_TILE = 1024     # elements per kernel tile = (8, 128)
MAX_Q = 8             # max contiguous pages one tile may span
MIN_PAGE_NNZ = 1 << 14  # below this the XLA gather is cheaper than a plan
# (x pages are streamed HBM->VMEM by the pipeline; ncols is unbounded)


def build_delta_pages(cols: np.ndarray, rows: np.ndarray, vals: np.ndarray,
                      ncols: int, nrows_part: int, q_force: int = 0,
                      t_force: int = 0, sort_key=None, group_ids=None):
    """Host-side layout for the page-bucketed delta kernel.

    Returns (pages_rep, leftover_idx) where ``pages_rep`` is None when the
    layout isn't applicable; ``leftover_idx`` indexes elements whose tile
    would span more than MAX_Q pages (they stay on the XLA path).

    ``q_force``/``t_force`` pad the window width / tile count up to a given
    value (>= the computed ones) — the sharded executor uses this to give
    every shard the same static kernel signature.  ``sort_key`` overrides
    the element ordering (default: by column); pass
    ``route.fold_sort_key`` so the scatter-route planner can size its
    instances per capacity fold.
    """
    m = cols.size
    if m < MIN_PAGE_NNZ:
        return None, None
    order = np.argsort(cols if sort_key is None else sort_key,
                       kind="stable")
    npages = -(-ncols // PAGE)

    # Vectorized tiling (the old per-tile Python loop dominated pt on
    # large matrices): optional group labels partition the sorted stream
    # into tile-aligned segments (the fused route pipeline aligns chunk
    # folds to product tiles this way); each group's elements fill
    # DELTA_TILE-sized tiles, ragged tails padded.
    if group_ids is None:
        el_tile = np.arange(m, dtype=np.int64) // DELTA_TILE
        lane = np.arange(m, dtype=np.int64) % DELTA_TILE
    else:
        g = np.asarray(group_ids)[order]
        # group start positions in the sorted stream (caller's sort_key
        # must make groups contiguous)
        new_grp = np.empty(m, dtype=bool)
        new_grp[0] = True
        np.not_equal(g[1:], g[:-1], out=new_grp[1:])
        starts = np.flatnonzero(new_grp)
        gi = np.cumsum(new_grp) - 1                    # dense group index
        pos_in_grp = np.arange(m, dtype=np.int64) - starts[gi]
        sizes = np.diff(np.append(starts, m))
        tiles_per_grp = -(-sizes // DELTA_TILE)
        tile_base = np.concatenate(
            [[0], np.cumsum(tiles_per_grp)[:-1]])
        el_tile = tile_base[gi] + pos_in_grp // DELTA_TILE
        lane = pos_in_grp % DELTA_TILE

    csort = cols[order].astype(np.int64)
    pages = csort // PAGE
    # per-tile page span via reduceat (el_tile is nondecreasing; every
    # tile index in [0, T_all) is hit because groups fill tiles densely)
    tile_starts = np.flatnonzero(
        np.concatenate([[True], el_tile[1:] != el_tile[:-1]]))
    T_all = int(el_tile[-1]) + 1
    pmin = np.minimum.reduceat(pages, tile_starts)
    pmax = np.maximum.reduceat(pages, tile_starts)
    span = pmax - pmin + 1
    keepm = span <= MAX_Q

    keep_el = keepm[el_tile]
    kept_pos = np.flatnonzero(keep_el)
    if kept_pos.size < max(m // 2, 1):
        return None, None
    leftover_idx = order[~keep_el]

    kt = np.flatnonzero(keepm)
    T = kt.size
    q = int(span[kt].max())
    q = max(q, q_force)
    # clamp p_lo so the Q-page window stays inside x2; t_force pads with
    # all-zero dummy tiles (vals 0, rows = sentinel -> dropped)
    newt_of_tile = np.cumsum(keepm) - 1                # tile -> kept index
    plo_kept = np.minimum(pmin[kt],
                          max(0, npages - q)).astype(np.int32)
    T_out = max(T, t_force)
    plo_arr = np.zeros(T_out, dtype=np.int32)
    plo_arr[:T] = plo_kept
    # combined window offset sl = sub*128 + lane (< q*1024 <= 8192): ONE
    # int16 stream instead of separate sub/lane arrays — the delta path is
    # bandwidth-bound metadata (the reference picks 8/16/32-bit deltas for
    # the same reason, GetDeltaSize CsxManager.hpp:635-682).  q <= 8 so
    # the offset always fits int16; kernels upcast at load.
    sl = np.zeros((T_out, DELTA_TILE), dtype=np.int16)
    v = np.zeros((T_out, DELTA_TILE), dtype=vals.dtype)
    r = np.full((T_out, DELTA_TILE), nrows_part, dtype=np.int32)
    sel = order[kept_pos]
    ti = newt_of_tile[el_tile[kept_pos]]
    la = lane[kept_pos]
    sl[ti, la] = (csort[kept_pos]
                  - plo_arr[ti].astype(np.int64) * PAGE).astype(np.int16)
    v[ti, la] = vals[sel]
    r[ti, la] = rows[sel]
    rep = {
        "plo": plo_arr,
        "sl": sl.reshape(T_out, 8, 128),
        "vals": v.reshape(T_out, 8, 128),
        "rows": r.reshape(T_out * DELTA_TILE),
        "q": int(q),
        "npages": int(npages),
    }
    if group_ids is not None:
        # per kept tile: its group label (t_force dummy tiles get -1);
        # the fused route planner cuts chunks at group boundaries
        tg = np.full(T_out, -1, dtype=np.int64)
        tg[:T] = np.asarray(group_ids)[order[tile_starts[kt]]]
        rep["tile_group"] = tg
    return rep, leftover_idx


@functools.lru_cache(maxsize=64)
def _build_delta_kernel(T: int, q: int, dtype_str: str):
    """Kernel: per tile, gather 1024 x values from the tile's q-page window
    and multiply by the element values -> products tile.

    The q pages are streamed HBM->VMEM by the pipeline via scalar-prefetch
    index maps (page j of tile i = x2 block ``plo[i] + j``), so x never
    needs to be VMEM-resident and ncols is unbounded.
    """
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    dtype = jnp.dtype(dtype_str)

    def kernel(plo_ref, sl_ref, val_ref, *page_refs_and_out):
        page_refs = page_refs_and_out[:q]
        out_ref = page_refs_and_out[q]
        sl = sl_ref[0].astype(jnp.int32)   # sl streams are int16 in HBM
        sub = jax.lax.shift_right_logical(sl, jnp.int32(7))
        lane = jax.lax.bitwise_and(sl, jnp.int32(127))
        total = jnp.zeros((8, 128), dtype=dtype)
        for j in range(q):
            xpage = page_refs[j][0]  # (8, 128)
            for k in range(8):
                rowk = jax.lax.broadcast_in_dim(xpage[k, :], (8, 128), (1,))
                tk = jnp.take_along_axis(rowk, lane, axis=1)
                total = total + jnp.where(sub == j * 8 + k, tk,
                                          jnp.zeros((), dtype))
        out_ref[0] = total * val_ref[0]

    tile_specs = [pl.BlockSpec((1, 8, 128), lambda i, m: (i, 0, 0),
                               memory_space=pltpu.VMEM) for _ in range(2)]
    page_specs = [pl.BlockSpec(
        (1, 8, 128), functools.partial(lambda i, m, j=j: (m[i] + j, 0, 0)),
        memory_space=pltpu.VMEM) for j in range(q)]

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(T,),
        in_specs=tile_specs + page_specs,
        out_specs=pl.BlockSpec((1, 8, 128), lambda i, m: (i, 0, 0),
                               memory_space=pltpu.VMEM),
    )

    call = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((T, 8, 128), dtype),
    )

    def fn(plo, sl, vals, x2):
        return call(plo, sl, vals, *([x2] * q))

    return fn


def pad_x_pages(x, ncols: int, q: int, npages: int):
    """x zero-padded + reshaped to (npages_pad, 8, 128) page form.

    Callers with several paged tables should build this ONCE with the max
    q/npages across their plans and pass it to every helper — each copy is
    a full pass over an ncols-sized buffer.
    """
    import jax.numpy as jnp
    npages_pad = max(npages, q)
    x2 = jnp.zeros(npages_pad * PAGE, dtype=x.dtype).at[: ncols].set(x)
    return x2.reshape(npages_pad, 8, 128)


def delta_pages_products(rep_meta, rep, x, ncols: int, x2=None):
    """(T*1024,) products (value * gathered x) in tile order."""
    T, q, npages = rep_meta
    if x2 is None:
        x2 = pad_x_pages(x, ncols, q, npages)
    fn = _build_delta_kernel(T, q, str(np.dtype(x.dtype)))
    return fn(rep["plo"], rep["sl"], rep["vals"], x2).reshape(-1)


def delta_pages_spmv(rep_meta, rep, x, nrows_part: int, ncols: int, acc,
                     x2=None):
    """acc += scatter(products) for the page-bucketed delta elements."""
    prods = delta_pages_products(rep_meta, rep, x, ncols, x2=x2)
    return acc.at[rep["rows"]].add(prods, mode="drop")


# ---------------------------------------------------------------------------
# Generic paged gather (unit tables: horizontal runs, blocks)
# ---------------------------------------------------------------------------
# Same VREG-gather trick as the delta kernel, but with NO output scatter:
# units are reordered (a table is an unordered set of units) so that
# pageable tiles form a prefix; each tile holds g whole units (g*W <= 1024
# elements + padding), so the kernel's (T, 8, 128) output reshapes straight
# back to (U, W) gathered-x — feeding the existing FMA/einsum unchanged.


def build_unit_pages(flat_cols: np.ndarray, W: int, ncols: int,
                     q_force: int = 0, min_elems: int = 1 << 13):
    """Plan a paged gather for a (U, W) column-index table.

    ``flat_cols``: (U*W,) the x indices unit-major (already clipped to
    [0, ncols)).  Returns (unit_order, n_pageable_units, plan) where
    ``plan`` is None if not applicable; units [0, n_pageable) of the
    reordered table are gathered by the kernel, the rest via jnp.take.
    ``q_force`` pads the page-window width (the sharded executor unifies
    signatures across shards with it).
    """
    M = flat_cols.size
    U = M // W
    if U * W != M or M < min_elems or W > DELTA_TILE:
        return None, 0, None
    g = max(1, DELTA_TILE // W)  # units per tile
    cu = flat_cols.reshape(U, W)
    # order units by their min column so tiles cluster into few pages
    umin = cu.min(axis=1)
    umax = cu.max(axis=1)
    order = np.argsort(umin, kind="stable")
    npages = -(-ncols // PAGE)

    pageable, spilled = [], []
    for t0 in range(0, U, g):
        t1 = min(U, t0 + g)
        sel = order[t0:t1]
        p_lo = int(umin[sel].min() // PAGE)
        p_hi = int(umax[sel].max() // PAGE)
        if p_hi - p_lo + 1 <= MAX_Q and t1 - t0 == g:
            pageable.append((sel, p_lo))
        else:
            spilled.append(sel)
    if not pageable or len(pageable) * g < U // 2:
        return None, 0, None

    T = len(pageable)
    q = max(int(umax[sel].max() // PAGE) - plo + 1
            for sel, plo in pageable)
    q = max(q, q_force)
    sl = np.zeros((T, DELTA_TILE), dtype=np.int32)
    plo_arr = np.zeros(T, dtype=np.int32)
    unit_order = np.concatenate(
        [np.concatenate([sel for sel, _ in pageable])]
        + ([np.concatenate(spilled)] if spilled else []))
    for ti, (sel, plo) in enumerate(pageable):
        plo = min(plo, max(0, npages - q))
        plo_arr[ti] = plo
        off = (cu[sel].reshape(-1) - plo * PAGE).astype(np.int64)
        n = off.size  # g * W
        sl[ti, :n] = off.astype(np.int32)
    plan = {
        "plo": plo_arr,
        "sl": sl.reshape(T, 8, 128),
        "T": T, "q": int(q), "g": int(g), "npages": int(npages),
    }
    return unit_order, T * g, plan


@functools.lru_cache(maxsize=128)
def _build_gather_kernel(T: int, q: int, dtype_str: str):
    """Kernel: per tile, gather 1024 x values from the tile's q-page window
    (pages streamed HBM->VMEM via scalar-prefetch index maps)."""
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    dtype = jnp.dtype(dtype_str)
    # group tiles per grid step where the tile count allows: the
    # per-step DMA issue tax dominated the one-tile-per-step grid
    GT = 8 if T % 8 == 0 else 1

    def kernel(plo_ref, sl_ref, *page_refs_and_out):
        page_refs = page_refs_and_out[:GT * q]
        out_ref = page_refs_and_out[GT * q]
        for t in range(GT):
            sl = sl_ref[t].astype(jnp.int32)   # int16 or int32 in HBM
            sub = jax.lax.shift_right_logical(sl, jnp.int32(7))
            lane = jax.lax.bitwise_and(sl, jnp.int32(127))
            total = jnp.zeros((8, 128), dtype=dtype)
            for j in range(q):
                xpage = page_refs[t * q + j][0]
                for k in range(8):
                    rowk = jax.lax.broadcast_in_dim(xpage[k, :],
                                                    (8, 128), (1,))
                    tk = jnp.take_along_axis(rowk, lane, axis=1)
                    total = total + jnp.where(sub == j * 8 + k, tk,
                                              jnp.zeros((), dtype))
            out_ref[t] = total

    tile_specs = [pl.BlockSpec((GT, 8, 128), lambda i, m: (i, 0, 0),
                               memory_space=pltpu.VMEM)]
    page_specs = [pl.BlockSpec(
        (1, 8, 128),
        functools.partial(lambda i, m, t=t, j=j: (m[i * GT + t] + j, 0, 0)),
        memory_space=pltpu.VMEM) for t in range(GT) for j in range(q)]
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(T // GT,),
        in_specs=tile_specs + page_specs,
        out_specs=pl.BlockSpec((GT, 8, 128), lambda i, m: (i, 0, 0),
                               memory_space=pltpu.VMEM),
    )
    call = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((T, 8, 128), dtype),
        name="paged_gather",
    )

    def fn(plo, sl, x2):
        return call(plo, sl, *([x2] * (GT * q)))

    return fn


def paged_gather(plan_meta, plan, x, ncols: int, W: int, x2=None):
    """Gathered x for the pageable prefix: returns (T*g, W).

    NOTE: the trailing reshape to a thin (U, W) layout is an XLA strided
    copy at ~11 GB/s for small W (measured r3) — grid-form consumers
    should call :func:`paged_gather_grid` instead."""
    T, q, g, npages = plan_meta
    if x2 is None:
        x2 = pad_x_pages(x, ncols, q, npages)
    fn = _build_gather_kernel(T, q, str(np.dtype(x.dtype)))
    out = fn(plan["plo"], plan["sl"], x2)
    return out.reshape(T, DELTA_TILE)[:, : g * W].reshape(T * g, W)


def paged_gather_grid(plan_meta, plan, x, ncols: int, x2=None):
    """Gathered x in raw (T, 8, 128) grid form (element/tile order)."""
    T, q, g, npages = plan_meta
    if x2 is None:
        x2 = pad_x_pages(x, ncols, q, npages)
    fn = _build_gather_kernel(T, q, str(np.dtype(x.dtype)))
    return fn(plan["plo"], plan["sl"], x2)


def dia_pallas_ok() -> bool:
    """Whether the Pallas kernels can run on the current backend."""
    import jax
    try:
        return jax.default_backend() in ("tpu",)
    except Exception:
        return False


def pallas_dtype_ok(dtype) -> bool:
    """The kernels use (8, 128) f32 tiles; Mosaic cannot tile f64 at all
    and bf16 needs (16, 128) sublanes — both fall back to XLA."""
    return np.dtype(dtype) == np.float32


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
