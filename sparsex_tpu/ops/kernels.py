"""Device kernel composition — shared by every SpMV execution path.

The TPU replacement for the reference JIT subsystem (``include/sparsex/
internals/CsxJit.hpp:59-107``, ``src/templates/*.c``): the set of tables
present *is* the specialization — one vectorized kernel per table, composed
into a single traced function.  Used by the single-chip executor
(``ops/exec.py``), the symmetric executor (``symmetric.py``) and the
sharded SPMD program (``parallel/shard.py``).

Execution classes, chosen by measured TPU cost (v5e: arbitrary
gather/scatter ~6.6 ns/element — serialized — vs dense elementwise at HBM
speed):

- **DIA tables** (diagonal / anti-diagonal runs folded onto dense offsets):
  ``lax.scan`` over offsets, each step one ``dynamic_slice`` window of x and
  a fused multiply-add — zero gathers, HBM-bandwidth bound.  This replaces
  the reference's ``diag_tmpl.c``/``rdiag_tmpl.c`` ctl walk.
- **delta table** (leftover singles; ref ``delta_tmpl.c``): x gather +
  sorted segment-sum.
- **run tables** (horizontal/vertical + low-fill diagonals; ref
  ``horiz_tmpl.c``/``vert_tmpl.c``): 2-D x gather, FMA with padded unit
  values, row reduce; horizontal scatters one partial per *unit*, strided
  types scatter per element (penalized by the tpu heuristic).
- **block tables** (ref ``block_row_tmpl.c``/``block_col_tmpl.c``): batched
  (U,br,bc)x(U,bc) einsum on the MXU + per-(unit,row) scatter.

Padded lanes carry zero values and clamped indices, contributing exactly 0.
"""

from __future__ import annotations

from typing import Any, Dict, Optional, Tuple

import numpy as np

from sparsex_tpu.preprocess.encodings import EncType
from sparsex_tpu.preprocess.tables import CsxTables
from sparsex_tpu.preprocess.xform import run_step


def static_meta(tables: CsxTables) -> Tuple:
    """Static trace signature of one partition's tables.

    DIA offsets are part of the signature: baking them in lets every
    diagonal lower to a *statically sliced* fused multiply-add (no dynamic
    slices, no padding) — trace-time specialization per matrix, exactly the
    reference's JIT-per-pattern-set design (``CsxJit.hpp``).  The sharded
    executor instead passes ``(anti, None, D)`` (offsets as data) because
    one SPMD program covers shards with different offsets.
    """
    runs = tuple((int(t.enc), t.delta, t.width) for t in tables.runs)
    blocks = tuple((int(t.enc), t.br, t.bc) for t in tables.blocks)
    dias = tuple((t.anti, tuple(int(o) for o in t.offsets), t.ndiags)
                 for t in tables.dias)
    return (tables.nrows, tables.ncols, runs, blocks, dias)


def tables_to_arrays(tables: CsxTables) -> Dict[str, Any]:
    """Extract the array pytree (host numpy; device transfer on first call)."""
    arrs: Dict[str, Any] = {"delta": None, "runs": [], "blocks": [],
                            "dias": []}
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
    for t in tables.dias:
        arrs["dias"].append({"offsets": t.offsets.astype(np.int32),
                             "vals": t.vals})
    return arrs


def _dia_contrib_static(meta_dias, dias, x, nrows_part: int, ncols: int,
                        acc, z=None, x_own=None, nrows_glob: int = 0,
                        use_pallas: bool = False, z_off: int = 0):
    """DIA contributions with trace-time-static offsets.

    Every diagonal becomes a statically-bounded fused multiply-add over its
    exact valid row range — XLA fuses all diagonals of a table into one
    elementwise pass (one x read + one y write + the dv stream).
    DIAGONAL: ``y[r] += dv[r] * x[r + o]`` for r in [max(0,-o),
    min(nrows, ncols-o)); ANTI: ``y[r] += av[r] * x[s - r]`` for r in
    [max(0, s-ncols+1), min(nrows, s+1)).  Symmetric transposed
    contributions are the mirrored static windows of ``z``.
    """
    import jax
    import jax.numpy as jnp

    if use_pallas:
        from sparsex_tpu.ops.pallas_kernels import (
            MAX_DIAGS_PALLAS, dia_spmv_pallas, pallas_dtype_ok)
        use_pallas = pallas_dtype_ok(x.dtype) and x.ndim == 1

    mm = x.ndim == 2  # SpMM: x is (ncols, k); windows become row slabs

    def _win(xp, s0, length):
        if mm:
            return jax.lax.slice(xp, (s0, 0), (s0 + length, xp.shape[1]))
        return jax.lax.slice(xp, (s0,), (s0 + length,))

    def _bcast(dvk):
        return dvk[:, None] if mm else dvk

    def _pad(v, lo, hi):
        if not (lo or hi):
            return v
        return jnp.pad(v, ((lo, hi), (0, 0)) if mm else (lo, hi))

    for (anti, offsets, _nd), t in zip(meta_dias, dias):
        dv = t["vals"]
        if (use_pallas and z is None and offsets
                and len(offsets) <= MAX_DIAGS_PALLAS):
            # Fused Pallas kernel: one x pass for all diagonals.  An
            # anti-diagonal s is a diagonal o = ncols-1-s of the flipped x.
            if anti:
                offs = [ncols - 1 - s for s in offsets]
                acc = acc + dia_spmv_pallas(offs, dv, x[::-1],
                                            nrows_part, ncols)
            else:
                acc = acc + dia_spmv_pallas(list(offsets), dv, x,
                                            nrows_part, ncols)
            continue
        if not anti:
            # One zero-padded x frame; each diagonal is a static full-length
            # window of it.  Summing full-length windows (instead of
            # chaining .at[r0:r1].add updates) lets XLA fuse all D
            # multiply-adds into a single elementwise pass over the rows.
            # dv is zero wherever no element is stored, so out-of-matrix
            # lanes contribute exactly 0.
            pad_lo = max(0, max((-o for o in offsets), default=0))
            pad_hi = max(0, max((o + nrows_part - ncols for o in offsets),
                                default=0))
            xp = _pad(x, pad_lo, pad_hi)
            total = acc
            for k, o in enumerate(offsets):
                s0 = o + pad_lo
                total = total + _bcast(dv[k]) * _win(xp, s0, nrows_part)
            acc = total
            if z is not None:
                # transposed: z[r + o] += dv[r] * x_own[r] — each diagonal
                # is a static window of the padded product vector.
                for k, o in enumerate(offsets):
                    prod = _bcast(dv[k]) * x_own
                    oz = o + z_off   # halo-sym: cols rebased, z global
                    z0 = max(0, oz)
                    z1 = min(nrows_glob, nrows_part + oz)
                    if z1 > z0:
                        z = z.at[z0:z1].add(prod[z0 - oz: z1 - oz])
        else:
            # anti-diagonal s = r + c: x[s - r] = reversed-x window.
            xr = x[::-1]  # xr[i] = x[ncols-1-i] (row-flip for SpMM)
            pad_lo = max(0, max((s - (ncols - 1) for s in offsets),
                                default=0))
            pad_hi = max(0, max(((nrows_part - 1) - s for s in offsets),
                                default=0))
            xrp = _pad(xr, pad_lo, pad_hi)
            total = acc
            for k, s in enumerate(offsets):
                # x[s - r] for r in [0, nrows) = xr[ncols-1-s+r]
                s0 = ncols - 1 - s + pad_lo
                total = total + _bcast(dv[k]) * _win(xrp, s0, nrows_part)
            acc = total
            if z is not None:
                for k, s in enumerate(offsets):
                    prod = (_bcast(dv[k]) * x_own)[::-1]  # r -> nrows-1-r
                    sz = s + z_off
                    # z[sz - r] += prod_rev[nrows-1-r]: start sz-nrows+1
                    z0 = max(0, sz - nrows_part + 1)
                    z1 = min(nrows_glob, sz + 1)
                    if z1 > z0:
                        p0 = z0 - (sz - nrows_part + 1)
                        z = z.at[z0:z1].add(prod[p0: p0 + (z1 - z0)])
    return acc, z


def dia_contrib(meta_dias, dias, x, nrows_part: int, row_start,
                acc, z=None, x_own=None, nrows_glob: int = 0,
                ncols: Optional[int] = None, use_pallas: bool = False,
                z_off: int = 0):
    """Dense-diagonal contributions (and transposed ones when symmetric).

    ``offsets`` are partition-local: DIAGONAL ``o = col - row_local`` (x
    window starts at o), ANTI_DIAGONAL ``s = row_local + col`` (reversed x
    window).  Transposed (symmetric) contributions are dense windows of the
    global partial ``z``: diag mirrors onto ``z[row_local + o]``, anti onto
    ``z[s - row_local]``.

    Dispatches to the static-offset fast path when the meta signature
    carries the offsets (single-chip executor); the dynamic ``lax.scan``
    path below serves the sharded SPMD program, whose offsets are per-shard
    data.
    """
    import jax
    import jax.numpy as jnp

    if meta_dias and meta_dias[0][1] is not None:
        return _dia_contrib_static(
            meta_dias, dias, x, nrows_part,
            ncols if ncols is not None else x.shape[0],
            acc, z=z, x_own=x_own, nrows_glob=nrows_glob,
            use_pallas=use_pallas, z_off=z_off)

    pad = nrows_part
    xp = jnp.pad(x, (pad, pad))
    zp = zrp = None
    if z is not None:
        zp = jnp.pad(z, (pad, pad))
        zrp = jnp.flip(zp)
        Lz = nrows_glob + 2 * pad
    xr = jnp.flip(xp)
    L = x.shape[0] + 2 * pad

    for (anti, _offs, _nd), t in zip(meta_dias, dias):
        offs, dv = t["offsets"], t["vals"]

        if not anti:
            def body(carry, od):
                a, zpl = carry
                o, v = od
                win = jax.lax.dynamic_slice(xp, (o + pad,), (nrows_part,))
                a = a + v * win
                if zpl is not None:
                    # transposed: z[r + o + z_off] += v[r] * x_own[r]
                    zwin = jax.lax.dynamic_slice(zpl, (o + z_off + pad,),
                                                 (nrows_part,))
                    zpl = jax.lax.dynamic_update_slice(
                        zpl, zwin + v * x_own, (o + z_off + pad,))
                return (a, zpl), ()
            (acc, zp), _ = jax.lax.scan(body, (acc, zp), (offs, dv))
        else:
            def body_a(carry, od):
                a, zrpl = carry
                s, v = od
                # x[s - r] for r in [0, nrows_part): reversed window
                start = (L - 1 - pad) - s
                win = jax.lax.dynamic_slice(xr, (start,), (nrows_part,))
                a = a + v * win
                if zrpl is not None:
                    # transposed: z[s + z_off - r] += v[r]*x_own[r] (rev)
                    zstart = (Lz - 1 - pad) - (s + z_off)
                    zwin = jax.lax.dynamic_slice(zrpl, (zstart,),
                                                 (nrows_part,))
                    zrpl = jax.lax.dynamic_update_slice(
                        zrpl, zwin + v * x_own, (zstart,))
                return (a, zrpl), ()
            (acc, zrp), _ = jax.lax.scan(body_a, (acc, zrp), (offs, dv))

    if z is not None:
        z = zp[pad: pad + nrows_glob] + jnp.flip(zrp)[pad: pad + nrows_glob]
        return acc, z
    return acc, None


def local_contrib(meta, arrs, x, *, nrows_part: int, ncols: int,
                  row_start=0, symmetric: bool = False,
                  dvals=None, nrows_glob: Optional[int] = None,
                  use_pallas: bool = False, z_off: int = 0,
                  skip_dias: bool = False):
    # ``z_off``: halo-symmetric rebasing — x-side coordinates (cols, DIA
    # offsets) are in WINDOW coordinates while z destinations stay
    # GLOBAL; every z index derived from a column adds z_off.
    """One partition's SpMV contribution.

    Returns ``(acc, z)``: ``acc`` dense over the partition's ``nrows_part``
    rows; ``z`` (symmetric only) dense over all ``nrows_glob`` rows with the
    transposed (upper-mirror) contributions, else None.

    ``meta`` is the tuple from :func:`static_meta`; ``arrs`` the pytree from
    :func:`tables_to_arrays`.  ``row_start`` may be a traced scalar (the
    sharded path passes a per-device value).
    """
    import jax
    import jax.numpy as jnp

    _nr, _nc, run_meta, block_meta, dia_meta = meta[:5]
    dtype = x.dtype
    mm = x.ndim == 2  # SpMM: x is (ncols, k)
    kdim = x.shape[1] if mm else None
    acc = jnp.zeros((nrows_part, kdim) if mm else nrows_part, dtype=dtype)
    z = None
    x_own = None
    if symmetric:
        nrows_glob = int(nrows_glob if nrows_glob is not None else ncols)
        z = jnp.zeros((nrows_glob, kdim) if mm else nrows_glob, dtype=dtype)
        if mm:
            x_own = jax.lax.dynamic_slice(
                jnp.pad(x, ((0, nrows_part), (0, 0))), (row_start, 0),
                (nrows_part, kdim))
            if dvals is not None:
                acc = acc + dvals[:, None] * x_own
        else:
            x_own = jax.lax.dynamic_slice(
                jnp.pad(x, (0, nrows_part)), (row_start,), (nrows_part,))
            if dvals is not None:
                acc = acc + dvals * x_own

    # meta[5:] holds tagged extras: ("dfused", fmeta) for the fused delta
    # pipeline, ("k3dias", dia_offs, anti_offs) when the DIA tables ride
    # the shared K3, ("dpages", T, q, npages) for the legacy paged delta,
    # ("dpagesT", ...) for the symmetric transposed one.  One padded x2
    # page-form is shared by every legacy paged consumer.
    extras = {e[0]: e[1:] for e in meta[5:] if e}

    # --- fused pipeline: every routed contribution (delta elements, run
    # partials, block rows) lands in ONE shared K3 with the DIA tables —
    # y is written exactly once (ops/fused.py).  Segments queue their
    # (e1, g3) pairs here; residual XLA adds are deferred past the K3.
    dfused = extras.get("dfused")
    k3dias = extras.get("k3dias")
    fall = extras.get("fall")
    k3_pending = []
    k3_post = []
    fall_pieces = []
    fall_flats = {}
    # ONE padded page grid of x shared by every fused K1 call (each
    # private pad copy showed as ~12us of pad/copy fusions, r3 trace);
    # rounded to 8 pages so every style's q8 window rounding divides it
    x2f = None
    if dfused is not None or any(len(e) > 5 and e[5]
                                 and e[5][0] == "frun" for e in run_meta):
        np8 = max(8, -(-(-(-ncols // 1024)) // 8) * 8)
        if np8 * 1024 == ncols:
            x2f = x.reshape(np8, 8, 128)
        else:
            x2f = jnp.zeros(np8 * 1024, dtype=x.dtype).at[:ncols].set(
                x).reshape(np8, 8, 128)
    if dfused is not None:
        # the executor builds this variant only for 1-D non-symmetric
        # dispatch (SpMM reaches it through the per-column lax.map)
        assert not mm and not symmetric, "fused pipeline is 1-D only"
        from sparsex_tpu.ops.fused import fused_delta_a1, fused_delta_e1s
        fmeta = dfused[0]
        far = arrs["fused"]
        if fall is not None:
            fall_pieces.append(fused_delta_a1(fmeta, far, x, ncols,
                                              x2=x2f))
        else:
            k3_pending += fused_delta_e1s(fmeta, far, x, ncols,
                                          nrows_part, x2=x2f)
            if fmeta[4]:   # over-capacity residuals (per-segment plan)
                k3_post.append(("prod", far["res_vals"],
                                far["res_cols"], far["res_dest"]))
        if fmeta[5]:   # unpageable spill
            k3_post.append(("prod", far["left_vals"], far["left_cols"],
                            far["left_rows"]))

    # --- dense diagonals (elementwise, HBM-bound) ---
    if dia_meta and k3dias is None and not skip_dias:
        acc, z2 = dia_contrib(dia_meta, arrs["dias"], x, nrows_part,
                              row_start, acc,
                              z=z if symmetric else None,
                              x_own=x_own, nrows_glob=nrows_glob or 0,
                              ncols=ncols, use_pallas=use_pallas,
                              z_off=z_off)
        if symmetric:
            z = z2
    # --- sharded fused delta: K1 (lane-placed product, raw grids) ->
    # per-instance G1/T1/K2 -> K3, stacked with a union signature
    # (parallel/shard.stack_fused_delta).  DIA stays on the dense
    # dynamic-offset path — per-shard offsets are data here.
    if "dsfused" in extras and "delta_fused" in arrs:
        # the sharded SpMM maps 1-D columns through this path; a 2-D x
        # here would silently drop the delta elements (emptied at stack
        # time), so fail loudly instead
        assert not mm, "dsfused path is 1-D; map SpMM columns"
        from sparsex_tpu.ops.fused import (fused_delta_a1, k3_combine,
                                           merged_e1s)
        (T_pad, qf, npagesf, inst_meta_s, has_res_s,
         style_s) = extras["dsfused"]
        df = arrs["delta_fused"]
        a1_meta = (T_pad, qf, npagesf, (), 0, 0, style_s)
        k1_arrs = {"plo": df["plo"], "mg": df["mg"], "vals": df["vals"]}
        A1raw = fused_delta_a1(a1_meta, k1_arrs, x, ncols)
        flat_arrs = {}
        for i, inst in enumerate(df["inst"]):
            for kk in ("g1", "g2a", "g2b", "g2c", "g3"):
                flat_arrs[f"{kk}_{i}"] = inst[kk]
        e1s = merged_e1s(inst_meta_s, flat_arrs, A1raw, nrows_part)
        acc = acc + k3_combine(e1s, ((), None, (), None), x,
                               nrows_part, ncols)
        if has_res_s:
            acc = acc.at[df["res_dest"]].add(
                df["res_vals"] * jnp.take(x, df["res_cols"],
                                          mode="clip"),
                mode="drop")

    page_sigs = [extras[k] for k in ("dpages", "dpagesT") if k in extras]
    page_sigs += [e[3] for e in run_meta if len(e) > 3 and e[3]]
    page_sigs += [e[3] for e in block_meta if len(e) > 3 and e[3]]
    x2 = None
    if page_sigs and not mm:
        from sparsex_tpu.ops.pallas_kernels import pad_x_pages
        # both sig shapes carry q at index 1 and npages last:
        # (T, q, npages) and (T, q, g, npages)
        q_max = max(s[1] for s in page_sigs)
        np_max = max(s[-1] for s in page_sigs)
        x2 = pad_x_pages(x, ncols, q_max, np_max)
    if "dpages" in extras and "delta_pages" in arrs and not mm:
        from sparsex_tpu.ops.pallas_kernels import (delta_pages_products,
                                                    delta_pages_spmv)
        if "dscatter" in extras and "delta_scatter" in arrs:
            # y side via the static scatter-routing network (ops/route.py)
            # instead of the serialized XLA scatter.
            from sparsex_tpu.ops.route import apply_scatter_plan
            prods = delta_pages_products(extras["dpages"],
                                         arrs["delta_pages"], x, ncols,
                                         x2=x2)
            ds = arrs["delta_scatter"]
            dmetas, has_res = extras["dscatter"]
            acc = acc + apply_scatter_plan(dmetas, ds["chunks"], prods,
                                           nrows_part)
            if has_res:
                acc = acc.at[ds["res_dest"]].add(
                    jnp.take(prods, ds["res_pos"]), mode="drop")
        else:
            acc = delta_pages_spmv(extras["dpages"], arrs["delta_pages"],
                                   x, nrows_part, ncols, acc, x2=x2)
    if symmetric and "dpagesT" in extras and "delta_pages_t" in arrs \
            and not mm:
        from sparsex_tpu.ops.pallas_kernels import (delta_pages_products,
                                                    delta_pages_spmv)
        if "dscatterT" in extras and "delta_scatter_t" in arrs:
            from sparsex_tpu.ops.route import apply_scatter_plan
            prods_t = delta_pages_products(
                extras["dpagesT"], arrs["delta_pages_t"], x, nrows_glob,
                x2=x2)
            dst = arrs["delta_scatter_t"]
            dmetas_t, has_res_t = extras["dscatterT"]
            z = z + apply_scatter_plan(dmetas_t, dst["chunks"], prods_t,
                                       nrows_glob)
            if has_res_t:
                z = z.at[dst["res_dest"]].add(
                    jnp.take(prods_t, dst["res_pos"]), mode="drop")
        else:
            z = delta_pages_spmv(extras["dpagesT"], arrs["delta_pages_t"],
                                 x, nrows_glob, nrows_glob, z, x2=x2)

    # --- delta singles: gather + sorted segment-sum ---
    def _vb(v):
        """values broadcast against a gathered-x block (adds a k axis)."""
        return v[..., None] if mm else v

    def _take_x(idx):
        """x rows/scalars at idx (any idx shape; SpMM appends the k axis)."""
        if mm:
            return jnp.take(x, jnp.clip(idx, 0, ncols - 1), axis=0)
        return jnp.take(x, idx, mode="clip")

    d = arrs["delta"]
    if d is not None and d["cols"].shape[0]:
        prod = _vb(d["vals"]) * _take_x(d["cols"])
        acc = acc + jax.ops.segment_sum(
            prod, d["row_ids"], num_segments=nrows_part,
            indices_are_sorted=True)
    dt = arrs.get("delta_t")
    if symmetric and dt is not None and dt["cols"].shape[0]:
        # transposed leftovers: z[c] += v * x[r] (delta_t cols are ALWAYS
        # global z coordinates by convention; row_ids are partition-local
        # and row_start maps them into the current x frame)
        xg = _take_x(dt["row_ids"] + row_start)
        z = z.at[dt["cols"]].add(_vb(dt["vals"]) * xg, mode="drop")
    elif symmetric and dt is None and d is not None and d["cols"].shape[0]:
        xg = _take_x(d["row_ids"] + row_start)
        z = z.at[d["cols"] + z_off].add(_vb(d["vals"]) * xg, mode="drop")

    def _gather_units(t, entry, cols_u, steps, width):
        """(U, width[, k]) x values: paged-gather prefix + jnp.take tail
        (SpMM always takes the XLA row-gather: rows amortize the cost).
        ``cols_u`` (U,) head columns + ``steps`` (width,) lane offsets —
        the full (U, width) index grid is only materialized on the
        non-paged path (building + clipping it costs two full passes)."""
        plan_sig = entry[3] if len(entry) > 3 else None
        if mm or plan_sig is None or "plan" not in t:
            gidx = cols_u[:, None] + steps[None, :]
            return jnp.take(x, jnp.clip(gidx, 0, ncols - 1), axis=0)
        from sparsex_tpu.ops.pallas_kernels import paged_gather
        T, q, g, npages = plan_sig
        xg_page = paged_gather(plan_sig, t["plan"], x, ncols,
                               width, x2=x2).astype(x.dtype)
        n_page = T * g
        U = cols_u.shape[0]
        if U > n_page:
            tidx = cols_u[n_page:, None] + steps[None, :]
            tail = jnp.take(x, jnp.clip(tidx, 0, ncols - 1), axis=0)
            return jnp.concatenate([xg_page, tail], axis=0)
        return xg_page[:U]

    def _scatter_partials(acc, t, entry, partials):
        """acc += scatter(partials): through the shared K3 when the entry
        carries a fused segment ("fs"), through the standalone routing
        apply when it carries a legacy plan, else None (XLA scatter-add).
        SpMM keeps the row scatter (the routing network moves scalars;
        (row, k) slices amortize in XLA)."""
        scat = entry[4] if len(entry) > 4 else None
        if mm or scat is None:
            return None
        if scat[0] == "fs":
            if "fscatter" not in t:
                return None
            from sparsex_tpu.ops.fused import partial_segment_e1s
            _, inst_meta, has_res, m_pad = scat
            flat = partials.reshape(-1)
            if m_pad != flat.shape[0]:
                flat = jnp.pad(flat, (0, m_pad - flat.shape[0]))
            k3_pending.extend(partial_segment_e1s(
                inst_meta, t["fscatter"], flat, nrows_part))
            if has_res:
                k3_post.append(("take", flat, t["fscatter"]["res_pos"],
                                t["fscatter"]["res_dest"]))
            return acc
        if "scatter" not in t:
            return None
        from sparsex_tpu.ops.route import apply_scatter_plan
        smetas, has_res, m_pad = scat
        flat = partials.reshape(-1)
        if m_pad != flat.shape[0]:
            flat = jnp.pad(flat, (0, m_pad - flat.shape[0]))
        acc = acc + apply_scatter_plan(smetas, t["scatter"]["chunks"],
                                       flat, nrows_part)
        if has_res:
            acc = acc.at[t["scatter"]["res_dest"]].add(
                jnp.take(flat, t["scatter"]["res_pos"]), mode="drop")
        return acc

    # --- run tables ---
    for entry, t in zip(run_meta, arrs["runs"]):
        enc_i, delta, width = entry[:3]
        enc = EncType(enc_i)
        sr, sc = run_step(enc)
        lane = jnp.arange(width, dtype=jnp.int32)
        if len(entry) > 5 and entry[5] and entry[5][0] == "cvt":
            # demoted wholesale into the delta pipeline (exec.py): a
            # vert/diag/anti-diag unit is W independent dest rows = W
            # delta elements
            continue
        if len(entry) > 5 and entry[5] and entry[5][0] == "frun":
            # fully fused horizontal runs: one kernel gathers, multiplies,
            # sliding-sums each unit and routes through G1 into the
            # shared K3 (ops/fused.py)
            assert not mm and not symmetric, "fused runs are 1-D only"
            from sparsex_tpu.ops.fused import (fused_run_a1,
                                               fused_run_e1s)
            _, fmeta_r, n_tail = entry[5]
            fr = t["frun"]
            steps = (sc * delta) * lane
            if fall is not None:
                fall_pieces.append(fused_run_a1(fmeta_r, fr, x, ncols,
                                                x2=x2f))
            else:
                k3_pending.extend(fused_run_e1s(fmeta_r, fr, x, ncols,
                                                nrows_part, x2=x2f))
                if fmeta_r[4]:   # over-capacity residual unit totals
                    ridx = fr["res_cols_u"][:, None] + steps[None, :]
                    pr = jnp.sum(fr["res_vals2d"]
                                 * _take_x(jnp.clip(ridx, 0, ncols - 1)),
                                 axis=1)
                    k3_post.append(("acc", pr, fr["res_dest"], None))
            if n_tail:        # unpageable tail units
                tidx = t["tail_cols"][:, None] + steps[None, :]
                pr = jnp.sum(t["tail_vals"]
                             * _take_x(jnp.clip(tidx, 0, ncols - 1)),
                             axis=1)
                k3_post.append(("acc", pr, t["tail_rows"], None))
            continue
        xg = _gather_units(t, entry, t["cols"], (sc * delta) * lane,
                           width)
        contrib = _vb(t["vals"]) * xg
        if sr == 0:
            # horizontal: one partial per unit
            partial = jnp.sum(contrib, axis=1)
            routed = _scatter_partials(acc, t, entry, partial)
            acc = (routed if routed is not None
                   else acc.at[t["rows"]].add(partial, mode="drop"))
        else:
            routed = _scatter_partials(acc, t, entry, contrib)
            if routed is not None:
                acc = routed
            else:
                ridx = t["rows"][:, None] + (sr * delta) * lane[None, :]
                flatidx = jnp.clip(ridx, 0, nrows_part - 1).ravel()
                flat = (contrib.reshape(-1, kdim) if mm
                        else contrib.ravel())
                acc = acc.at[flatidx].add(flat, mode="drop")
        if symmetric:
            ridx_g = (t["rows"][:, None] + (sr * delta) * lane[None, :]
                      + row_start)
            xgr = jnp.take(x, jnp.clip(ridx_g, 0, ncols - 1), axis=0)
            zc = _vb(t["vals"]) * xgr
            gidx = (t["cols"][:, None]
                    + ((sc * delta) * lane)[None, :])
            z = z.at[jnp.clip(gidx + z_off, 0,
                              nrows_glob - 1).ravel()].add(
                zc.reshape(-1, kdim) if mm else zc.ravel(), mode="drop")

    # --- block tables ---
    for bi, (entry, t) in enumerate(zip(block_meta, arrs["blocks"])):
        enc_i, br, bc = entry[:3]
        if len(entry) > 5 and entry[5] and entry[5][0] == "cvt":
            # converted to a width-bc pseudo-run table (exec.py): the
            # run loop above already produced its contribution
            continue
        if len(entry) > 5 and entry[5] and entry[5][0] == "fblk":
            # fully fused blocks: gathered grid stays (T, 8, 128); each
            # block row r = FMA + width-bc sliding lane sum + routed
            # segment into the shared K3 (no thin reshape, no einsum)
            assert not mm and not symmetric, "fused blocks are 1-D only"
            from sparsex_tpu.ops.fused import partial_segment_e1s
            from sparsex_tpu.ops.pallas_kernels import paged_gather_grid
            _, seg_metas, n_tail = entry[5]
            plan_sig = entry[3]
            xgd = paged_gather_grid(plan_sig, t["plan"], x, ncols,
                                    x2=x2).astype(x.dtype)
            for r, (inst_meta, has_res, M_pad) in enumerate(seg_metas):
                prod = xgd * t["valsg"][r]
                d = 1
                while d < bc:
                    prod = prod + jnp.roll(prod, d, axis=2)
                    d *= 2
                flat = prod.reshape(-1)
                if fall is not None:
                    # raw source piece; the merged instances apply G1
                    fall_pieces.append(flat.reshape(-1, 128))
                    fall_flats[(bi, r)] = flat
                    continue
                k3_pending.extend(partial_segment_e1s(
                    inst_meta, t[f"fb_{r}"], flat, nrows_part))
                if has_res:
                    k3_post.append(("take", flat,
                                    t[f"fb_{r}"]["res_pos"],
                                    t[f"fb_{r}"]["res_dest"]))
            if n_tail:
                tidx = (t["tail_cols"][:, None]
                        + jnp.arange(bc, dtype=jnp.int32)[None, :])
                xgt = _take_x(jnp.clip(tidx, 0, ncols - 1))  # (nt, bc)
                pr = jnp.einsum("urc,uc->ur", t["tail_vals"], xgt)
                ridx = (t["tail_rows"][:, None]
                        + jnp.arange(br, dtype=jnp.int32)[None, :])
                k3_post.append(("acc", pr.ravel(),
                                jnp.clip(ridx, 0, nrows_part - 1).ravel(),
                                None))
            continue
        xg = _gather_units(t, entry, t["cols"],
                           jnp.arange(bc, dtype=jnp.int32), bc)
        if mm:
            contrib = jnp.einsum("urc,uck->urk", t["vals"], xg,
                                 preferred_element_type=dtype).astype(dtype)
        else:
            # broadcast-multiply-sum, NOT a batched einsum: XLA lowers a
            # batch-65k tiny dot_general near-serially on TPU (measured);
            # the elementwise form runs at HBM speed (bc is tiny/static)
            contrib = jnp.sum(t["vals"] * xg[:, None, :], axis=2)
        routed = _scatter_partials(acc, t, entry, contrib)
        ridx = (t["rows"][:, None]
                + jnp.arange(br, dtype=jnp.int32)[None, :])
        if routed is not None:
            acc = routed
        else:
            flat = contrib.reshape(-1, kdim) if mm else contrib.ravel()
            acc = acc.at[jnp.clip(ridx, 0, nrows_part - 1).ravel()].add(
                flat, mode="drop")
        if symmetric:
            xgr = jnp.take(x, jnp.clip(ridx + row_start, 0, ncols - 1),
                           axis=0)  # (U, br[, k])
            cidx = (t["cols"][:, None]
                    + jnp.arange(bc, dtype=jnp.int32)[None, :])
            if mm:
                tcontrib = jnp.einsum(
                    "urc,urk->uck", t["vals"], xgr,
                    preferred_element_type=dtype).astype(dtype)
                z = z.at[jnp.clip(cidx + z_off, 0,
                                  nrows_glob - 1).ravel()].add(
                    tcontrib.reshape(-1, kdim), mode="drop")
            else:
                tcontrib = jnp.sum(t["vals"] * xgr[:, :, None], axis=1)
                z = z.at[jnp.clip(cidx + z_off, 0,
                                  nrows_glob - 1).ravel()].add(
                    tcontrib.ravel(), mode="drop")

    # --- merged plan: T1+K2 over the concatenated segment grids ---
    if fall is not None and fall_pieces:
        from sparsex_tpu.ops.fused import merged_e1s
        _segs, inst_meta_m, _bounds, res_desc = fall
        # K1 outputs are padded to whole grid groups; the plan's bounds
        # use the unpadded grids — trim each piece to its bound width
        fall_pieces = [p[: _bounds[i + 1] - _bounds[i]]
                       for i, p in enumerate(fall_pieces)]
        A1g = jnp.concatenate(fall_pieces, axis=0)
        k3_pending += merged_e1s(inst_meta_m, arrs["fall"], A1g,
                                 nrows_part)
        fa = arrs["fall"]
        for rd in res_desc:
            if rd[0] == "dres":
                k3_post.append(("prod", fa["dres_vals"],
                                fa["dres_cols"], fa["dres_dest"]))
            elif rd[0] == "rres":
                ri = rd[1]
                W = run_meta[ri][2]
                enc_r = EncType(run_meta[ri][0])
                _sr, _sc = run_step(enc_r)
                stp = (_sc * run_meta[ri][1]) * jnp.arange(
                    W, dtype=jnp.int32)
                ridx = fa[f"rres_{ri}_cols"][:, None] + stp[None, :]
                pr = jnp.sum(fa[f"rres_{ri}_vals"]
                             * _take_x(jnp.clip(ridx, 0, ncols - 1)),
                             axis=1)
                k3_post.append(("acc", pr, fa[f"rres_{ri}_dest"], None))
            else:
                bi, r = rd[1], rd[2]
                k3_post.append(("take", fall_flats[(bi, r)],
                                fa[f"bres_{bi}_{r}_pos"],
                                fa[f"bres_{bi}_{r}_dest"]))

    # --- the shared K3: all queued routed instances + DIA tables, one y
    # write; deferred residual adds afterwards (tiny) ---
    if k3_pending or (k3dias is not None and not skip_dias):
        from sparsex_tpu.ops.fused import k3_combine
        dia_offs, anti_offs = (((), ()) if skip_dias or k3dias is None
                               else k3dias)
        pack = (dia_offs, arrs.get("dias_fused_dv"), anti_offs,
                arrs.get("dias_fused_adv"))
        acc = acc + k3_combine(k3_pending, pack, x, nrows_part, ncols)
        for kind, a, b, c in k3_post:
            if kind == "prod":
                acc = acc.at[c].add(a * jnp.take(x, b, mode="clip"),
                                    mode="drop")
            elif kind == "acc":
                acc = acc.at[b].add(a, mode="drop")
            else:
                acc = acc.at[c].add(jnp.take(a, b), mode="drop")

    return acc, z


def fused_mm_ok(meta) -> bool:
    """Whether :func:`fused_mm_contrib` covers this pages-variant meta:
    at least one fully fused segment (the k-batched kernels exist for
    them), and no fblk / legacy-paged-delta segments (those still run
    the per-column path)."""
    run_meta, block_meta = meta[2], meta[3]
    extras = {e[0] for e in meta[5:] if e}
    has_fused = ("dfused" in extras
                 or any(len(e) > 5 and e[5] and e[5][0] == "frun"
                        for e in run_meta))
    if not has_fused:
        return False
    if any(len(e) > 5 and e[5] and e[5][0] == "fblk" for e in block_meta):
        return False
    if "dpages" in extras or "dscatter" in extras:
        return False
    return True


def fused_mm_contrib(meta, arrs, xt, *, nrows_part: int, ncols: int):
    """k-major SpMM over the fused pipeline: ``xt`` (k, ncols) ->
    (k, nrows_part).

    The SpMV composition re-run per column re-reads every metadata
    stream (mg, g2*, g3, plo, dv) k times (VERDICT r3 #3: k=8 cost 8.4
    SpMV-equivalents).  Here the k axis rides the Pallas grids as the
    INNERMOST dimension — Mosaic's revisit optimization keeps each
    metadata block in VMEM across the k steps, so the streams are read
    once and only x/y traffic scales with k.  Residual/tail/non-fused
    tables run k-major XLA (gathers on axis 1, batched scatter-adds).
    Caller gate: :func:`fused_mm_ok`; reference north star BASELINE.md
    (the reference itself stops at SpMV, ``matvec.h:39-535``)."""
    import jax.numpy as jnp

    from sparsex_tpu.ops.fused import (fused_delta_a1, fused_delta_e1s,
                                       fused_run_a1, fused_run_e1s,
                                       k3_combine, merged_e1s,
                                       partial_segment_e1s)

    _nr, _nc, run_meta, block_meta, dia_meta = meta[:5]
    kdim = xt.shape[0]
    dtype = xt.dtype
    acc = jnp.zeros((kdim, nrows_part), dtype=dtype)
    extras = {e[0]: e[1:] for e in meta[5:] if e}
    dfused = extras.get("dfused")
    k3dias = extras.get("k3dias")
    fall = extras.get("fall")
    k3_pending = []
    k3_post = []
    fall_pieces = []

    def _take_xt(idx):
        """xt gathered at clipped idx: (k,) + idx.shape."""
        return jnp.take(xt, jnp.clip(idx, 0, ncols - 1), axis=1)

    # one shared padded page grid (k, np8, 8, 128)
    np8 = max(8, -(-(-(-ncols // 1024)) // 8) * 8)
    if np8 * 1024 == ncols:
        x2f = xt.reshape(kdim, np8, 8, 128)
    else:
        x2f = jnp.zeros((kdim, np8 * 1024),
                        dtype=dtype).at[:, :ncols].set(xt).reshape(
            kdim, np8, 8, 128)

    if dfused is not None:
        fmeta = dfused[0]
        far = arrs["fused"]
        if fall is not None:
            fall_pieces.append(fused_delta_a1(fmeta, far, xt, ncols,
                                              x2=x2f))
        else:
            k3_pending += fused_delta_e1s(fmeta, far, xt, ncols,
                                          nrows_part, x2=x2f)
            if fmeta[4]:
                k3_post.append(("prod", far["res_vals"],
                                far["res_cols"], far["res_dest"]))
        if fmeta[5]:
            k3_post.append(("prod", far["left_vals"], far["left_cols"],
                            far["left_rows"]))

    # --- plain delta leftovers (tables below the fused/paged minima) ---
    d = arrs.get("delta")
    if d is not None and d["cols"].shape[0]:
        prod = d["vals"][None] * _take_xt(d["cols"])   # (k, n)
        acc = acc.at[:, d["row_ids"]].add(prod, mode="drop")

    # --- run tables (fused ones feed K3; the rest run k-major XLA) ---
    for entry, t in zip(run_meta, arrs["runs"]):
        enc_i, delta, width = entry[:3]
        enc = EncType(enc_i)
        sr, sc = run_step(enc)
        lane = jnp.arange(width, dtype=jnp.int32)
        steps = (sc * delta) * lane
        if len(entry) > 5 and entry[5] and entry[5][0] == "cvt":
            continue   # demoted into the delta pipeline (exec.py)
        if len(entry) > 5 and entry[5] and entry[5][0] == "frun":
            _, fmeta_r, n_tail = entry[5]
            fr = t["frun"]
            if fall is not None:
                fall_pieces.append(fused_run_a1(fmeta_r, fr, xt, ncols,
                                                x2=x2f))
            else:
                k3_pending.extend(fused_run_e1s(fmeta_r, fr, xt, ncols,
                                                nrows_part, x2=x2f))
                if fmeta_r[4]:
                    ridx = fr["res_cols_u"][:, None] + steps[None, :]
                    pr = jnp.sum(fr["res_vals2d"][None] * _take_xt(ridx),
                                 axis=2)          # (k, n_res)
                    k3_post.append(("acc", pr, fr["res_dest"], None))
            if n_tail:
                tidx = t["tail_cols"][:, None] + steps[None, :]
                pr = jnp.sum(t["tail_vals"][None] * _take_xt(tidx),
                             axis=2)
                k3_post.append(("acc", pr, t["tail_rows"], None))
            continue
        # non-fused run table: k-major XLA gather + batched scatter-add
        gidx = t["cols"][:, None] + steps[None, :]
        contrib = t["vals"][None] * _take_xt(gidx)     # (k, U, W)
        if sr == 0:
            partial = jnp.sum(contrib, axis=2)         # (k, U)
            acc = acc.at[:, t["rows"]].add(partial, mode="drop")
        else:
            ridx = t["rows"][:, None] + (sr * delta) * lane[None, :]
            flatidx = jnp.clip(ridx, 0, nrows_part - 1).ravel()
            acc = acc.at[:, flatidx].add(contrib.reshape(kdim, -1),
                                         mode="drop")

    # --- block tables ("cvt" ones already rode the run loop) ---
    for entry, t in zip(block_meta, arrs["blocks"]):
        enc_i, br, bc = entry[:3]
        if len(entry) > 5 and entry[5] and entry[5][0] == "cvt":
            continue
        gidx = t["cols"][:, None] + jnp.arange(bc, dtype=jnp.int32)[None]
        xg = _take_xt(gidx)                            # (k, U, bc)
        contrib = jnp.einsum("urc,kuc->kur", t["vals"], xg,
                             preferred_element_type=dtype).astype(dtype)
        ridx = (t["rows"][:, None]
                + jnp.arange(br, dtype=jnp.int32)[None, :])
        acc = acc.at[:, jnp.clip(ridx, 0, nrows_part - 1).ravel()].add(
            contrib.reshape(kdim, -1), mode="drop")

    # --- merged plan over the concatenated raw grids ---
    if fall is not None and fall_pieces:
        _segs, inst_meta_m, _bounds, res_desc = fall
        fall_pieces = [p[:, : _bounds[i + 1] - _bounds[i]]
                       for i, p in enumerate(fall_pieces)]
        A1g = jnp.concatenate(fall_pieces, axis=1)
        k3_pending += merged_e1s(inst_meta_m, arrs["fall"], A1g,
                                 nrows_part)
        fa = arrs["fall"]
        for rd in res_desc:
            if rd[0] == "dres":
                k3_post.append(("prod", fa["dres_vals"],
                                fa["dres_cols"], fa["dres_dest"]))
            elif rd[0] == "rres":
                ri = rd[1]
                W = run_meta[ri][2]
                _sr, _sc = run_step(EncType(run_meta[ri][0]))
                stp = (_sc * run_meta[ri][1]) * jnp.arange(
                    W, dtype=jnp.int32)
                ridx = fa[f"rres_{ri}_cols"][:, None] + stp[None, :]
                pr = jnp.sum(fa[f"rres_{ri}_vals"][None]
                             * _take_xt(ridx), axis=2)
                k3_post.append(("acc", pr, fa[f"rres_{ri}_dest"], None))
            # "bres" never occurs: fused_mm_ok rejects fblk segments

    if k3_pending or k3dias is not None:
        pack = (((), None, (), None) if k3dias is None
                else (k3dias[0], arrs.get("dias_fused_dv"), k3dias[1],
                      arrs.get("dias_fused_adv")))
        acc = acc + k3_combine(k3_pending, pack, xt, nrows_part, ncols)
    for kind, a, b, c in k3_post:
        if kind == "prod":
            # a: (n,) vals, b: (n,) cols, c: (n,) dest
            acc = acc.at[:, c].add(a[None] * _take_xt(b), mode="drop")
        else:  # "acc": a (k, n) partials at rows b
            acc = acc.at[:, b].add(a, mode="drop")
    return acc
