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
def _compiled(meta: Tuple, dtype_str: str, use_pallas: bool = False,
              apply_alpha: bool = True, apply_beta: bool = True,
              skip_dias: bool = False):
    """Build + jit the executor for one static table signature.

    ``meta`` may carry tagged extras past index 5 (fused pipeline, paged
    delta, ...).  ``apply_alpha``/``apply_beta`` elide the epilogue when
    the dispatcher knows alpha == 1 / beta == 0: the generic
    ``alpha*acc + beta*y0`` costs three extra full HBM passes.
    """
    import jax
    import jax.numpy as jnp

    nrows, ncols = meta[0], meta[1]

    def fn(arrs, x, alpha, beta, y0):
        acc, _ = local_contrib(meta, arrs, x, nrows_part=nrows, ncols=ncols,
                               use_pallas=use_pallas, skip_dias=skip_dias)
        if apply_alpha:
            acc = alpha * acc
        if apply_beta:
            acc = acc + beta * y0
        return acc

    return jax.jit(fn)


MM_FUSED_KB = 8    # columns per k-batched kernel sweep (VMEM-bounded)


@functools.lru_cache(maxsize=64)
def _compiled_mm(meta: Tuple, dtype_str: str, use_pallas: bool,
                 apply_alpha: bool, slab_dias: bool):
    """SpMM program (cached per signature: rebuilding the jit wrapper
    per call would RETRACE on every matmat).

    Fused-k path (when :func:`kernels.fused_mm_ok`): the k-batched
    K1/T1/K2/K3 pipeline reads every metadata stream ONCE for up to
    ``MM_FUSED_KB`` columns (larger k sweeps in chunks) — closing
    VERDICT r3 #3 (the column loop re-read mg/g2*/g3/plo/dv k times,
    k=8 = 8.4 SpMV-equivalents).

    Legacy path: the fused/routed SpMV once per column under
    ``lax.map`` (measured: (row, k)-slice gathers still cost per
    element) with the per-column epilogue elided, then the DIA tables
    as ONE (rows, k) slab pass.
    """
    import jax
    import jax.numpy as jnp

    nrows, ncols = meta[0], meta[1]
    meta_dias = meta[4]

    from sparsex_tpu.ops.kernels import fused_mm_contrib, fused_mm_ok
    if fused_mm_ok(meta):
        @jax.jit
        def mm_fused(arrs, xT, a):
            k = xT.shape[0]
            outs = []
            for c0 in range(0, k, MM_FUSED_KB):
                outs.append(fused_mm_contrib(
                    meta, arrs, xT[c0: c0 + MM_FUSED_KB],
                    nrows_part=nrows, ncols=ncols))
            out = (jnp.concatenate(outs, axis=0) if len(outs) > 1
                   else outs[0])
            return a * out if apply_alpha else out   # (k, nrows)

        # the final (k, nrows) -> (nrows, k) transpose dispatches
        # STANDALONE (12.7us vs 1100us fused, r3 measurement)
        return lambda arrs, xT, a: mm_fused(arrs, xT, a).T
    fn = _compiled(meta, dtype_str, use_pallas,
                   apply_alpha=False, apply_beta=False,
                   skip_dias=slab_dias)

    @jax.jit
    def mm_cols(arrs, xT, a):
        zeros = jnp.zeros(nrows, dtype=xT.dtype)
        one = xT.dtype.type(1.0)
        cols = jax.lax.map(lambda c: fn(arrs, c, one, one, zeros), xT)
        return a * cols if apply_alpha else cols   # (k, nrows)

    if not slab_dias:
        # the (k, nrows) -> (nrows, k) transpose runs as a STANDALONE
        # dispatch: fused into the map program it lowers to the ~11GB/s
        # thin-transpose path (measured 12.7us standalone vs 1100us
        # fused on the blocky SpMM)
        return lambda arrs, xT, a: mm_cols(arrs, xT, a).T

    @jax.jit
    def add_dias(arrs, out2, xs):
        from sparsex_tpu.ops.kernels import dia_contrib
        out2, _ = dia_contrib(meta_dias, arrs["dias"], xs, nrows, 0,
                              out2, ncols=ncols)
        return out2

    def run(arrs, xT, a):
        out2 = mm_cols(arrs, xT, a).T
        xs = (a * xT).T if apply_alpha else xT.T
        return add_dias(arrs, out2, xs)

    return run


@functools.lru_cache(maxsize=64)
def _compiled_multi(metas: Tuple, dtype_str: str, use_pallas: bool):
    """One jitted program covering ALL shards of a single-chip matrix.

    The reference releases its thread pool once per kernel call
    (``MatVecKernel`` barriers, ``CsxKernels.cpp:35-55``); the TPU
    analogue of that single synchronized dispatch is one XLA program that
    evaluates every shard's kernel composition and concatenates — instead
    of one dispatch per shard from Python.
    """
    import jax
    import jax.numpy as jnp

    def fn(arrs_list, x, alpha, beta, y0):
        parts = []
        for meta, arrs in zip(metas, arrs_list):
            acc, _ = local_contrib(meta, arrs, x, nrows_part=meta[0],
                                   ncols=meta[1], use_pallas=use_pallas)
            parts.append(acc)
        acc = jnp.concatenate(parts) if len(parts) > 1 else parts[0]
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


def _resolve_use_pallas(tables: CsxTables = None,
                        routed: bool = False) -> bool:
    """Per-matrix policy for the fused DIA Pallas kernel.

    Measured on v5e: the XLA DIA window-sum overlaps with (hides under) a
    *serialized* delta path (the old XLA gather/scatter, ~16 ns/element),
    so Pallas there only added serialization.  With the routed delta path
    (``routed=True``) nothing serial remains to hide under, and the fused
    Pallas DIA wins outright (measured 1.6x on the headline: one x pass
    from VMEM for all offsets vs one pass per diagonal).  The old
    hide-under rule only remains for matrices still on the XLA delta
    path: delta_nnz * ~16 ns  <  dia_rows * ~32 B / HBM_BW.
    """
    from sparsex_tpu.ops.pallas_kernels import dia_pallas_ok
    forced = _pallas_mode()
    if forced is not None:
        # forcing 'on' off-TPU would die in Mosaic lowering — fall back
        # with a warning instead (mirrors _pages_active's backend gate).
        if forced and not dia_pallas_ok():
            from sparsex_tpu.logger import log_warning
            log_warning("spx.tpu.use_pallas=on ignored: backend has no "
                        "Mosaic support; using the XLA path")
            return False
        return forced
    if not dia_pallas_ok():
        return False
    if routed or tables is None:
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
        self._dev_plain = None
        self._dev_pages = None
        self._tracing = False

    def _device(self, pages: bool):
        """Device-resident copy of the table arrays (transferred once).

        Passing host numpy into the jitted call would re-upload the tables
        on EVERY invocation (JAX does not dedupe numpy args) — the device
        copy is the per-device HBM placement the reference gets from NUMA
        onnode allocation (``numa_util.c``).  Inside an ambient user
        trace the host arrays are returned directly (embedded as
        constants); caching there would leak tracers."""
        import jax
        if pages:
            if self._dev_pages is not None:
                return self._dev_pages  # device arrays close over safely
            if self._tracing:
                return self._pages_arrays
            self._dev_pages = jax.device_put(self._pages_arrays)
            return self._dev_pages
        if self._dev_plain is not None:
            return self._dev_plain
        if self._tracing:
            return self.arrays
        self._dev_plain = jax.device_put(self.arrays)
        return self._dev_plain

    def _maybe_build_pages(self) -> None:
        """Lazily reorganize tables into page-bucketed Pallas layouts
        (host-side sorting; done once per executor): the delta table gets
        the element-page layout, run/block tables get unit-page gather
        plans.  ``build_delta_pages``/``build_unit_pages`` decide
        applicability per table."""
        if self._pages_tried:
            return
        self._pages_tried = True
        from sparsex_tpu.ops.pallas_kernels import (
            build_delta_pages, build_unit_pages)
        from sparsex_tpu.preprocess.xform import run_step

        ncols = self.tables.ncols
        arrays = dict(self.arrays)
        changed = False
        if self._dtype == "bfloat16":
            # compute-in-f32: Mosaic tiles are f32; a bf16 matrix keeps its
            # bf16 tables for the fallback path, and the page/route
            # variant holds f32 copies of every value stream.
            def _f32(tree):
                if tree is None:
                    return None
                out = dict(tree)
                if "vals" in out:
                    out["vals"] = np.asarray(out["vals"], dtype=np.float32)
                return out
            arrays["delta"] = _f32(arrays["delta"])
            arrays["runs"] = [_f32(t) for t in arrays["runs"]]
            arrays["blocks"] = [_f32(t) for t in arrays["blocks"]]
            arrays["dias"] = [_f32(t) for t in arrays["dias"]]
            changed = True

        # --- delta + DIA planning runs AFTER the unit tables (below) so
        # unpageable unit-table tails can DEMOTE into the delta table:
        # bulk lane-placed/paged slots cost ~1 us per 1024 elements where
        # the serialized XLA tail gather costs ~6.6 ns PER ELEMENT ---
        dmeta_entry = None
        dscatter_entry = None
        dfused_entry = None
        d = self.tables.delta
        demoted = []   # (rows, cols, vals) element triples from tails

        from sparsex_tpu.ops.route import build_scatter_plan

        def _scatter_entry(entry_arrays, dest_flat):
            """Route plan for a unit table's y scatter, in the shared-K3
            segment form (``ops/fused.plan_partial_segment``); returns
            the static meta entry (or None), storing arrays in place."""
            from sparsex_tpu.ops.fused import plan_partial_segment
            seg = plan_partial_segment(dest_flat, self.tables.nrows)
            if seg is None:
                return None
            inst_meta, seg_arrays, has_res, M_pad = seg
            entry_arrays["fscatter"] = seg_arrays
            return ("fs", inst_meta, has_res, M_pad)

        # --- run tables: unit-page gather plans (x-reading types only)
        #     + y-side scatter routes ---
        from sparsex_tpu.preprocess.encodings import EncType
        from sparsex_tpu.ops.fused import min_fused_nnz

        # vert/diag/anti-diag units write W INDEPENDENT dest rows — they
        # are exactly W delta elements, and the fused delta pipeline
        # (one lane-placed K1 slot per element, shared K2/K3, single y
        # write) beats the legacy unit-paged + partial-segment chain.
        # Demote those tables wholesale when the combined delta stream
        # clears the fused gate (below it they keep the legacy plans).
        base_delta = int(d.nnz) if (d is not None and d.nnz) else 0
        sr_elems = sum(
            int(np.asarray(t["rows"]).size) * w_
            for (e_, d_, w_), t in zip(self.meta[2], arrays["runs"])
            if run_step(EncType(e_))[0] != 0)
        demote_sr = (sr_elems
                     and base_delta + sr_elems >= min_fused_nnz())

        run_meta = []
        run_arrays = []
        for (enc_i, delta, width), t in zip(self.meta[2], arrays["runs"]):
            sr, sc = run_step(EncType(enc_i))
            if sr != 0 and demote_sr:
                lane = np.arange(width, dtype=np.int64)
                trows = (np.asarray(t["rows"], dtype=np.int64)[:, None]
                         + (sr * delta) * lane[None, :]).reshape(-1)
                tcols = (np.asarray(t["cols"], dtype=np.int64)[:, None]
                         + (sc * delta) * lane[None, :]).reshape(-1)
                tvals = np.asarray(t["vals"]).reshape(-1)
                nz = tvals != 0
                demoted.append(
                    (np.clip(trows, 0, self.tables.nrows - 1)[nz],
                     np.clip(tcols, 0, ncols - 1)[nz], tvals[nz]))
                run_meta.append((enc_i, delta, width, None, None,
                                 ("cvt",)))
                run_arrays.append({})
                changed = True
                continue
            # horizontal runs whose width divides 128: the fully fused
            # kernel (gather + FMA + sliding-sum + G1 -> shared K3)
            if sr == 0 and width >= 2 and 128 % width == 0:
                from sparsex_tpu.ops.fused import build_fused_run
                cols_u = np.asarray(t["cols"], dtype=np.int64)
                rows_u = np.asarray(t["rows"], dtype=np.int64)
                fmeta_r, farr_r, order_r, n_page_r = build_fused_run(
                    cols_u, rows_u, np.asarray(t["vals"]), ncols,
                    self.tables.nrows, width, step=sc * delta)
                if fmeta_r is not None:
                    tail = order_r[n_page_r:]
                    run_meta.append((enc_i, delta, width, None, None,
                                     ("frun", fmeta_r, 0)))
                    run_arrays.append({"frun": farr_r})
                    if tail.size:
                        lane = np.arange(width, dtype=np.int64)
                        tcols = (cols_u[tail][:, None]
                                 + (sc * delta) * lane[None, :]).reshape(-1)
                        tvals = np.asarray(t["vals"])[tail].reshape(-1)
                        nz = tvals != 0
                        demoted.append((np.repeat(rows_u[tail], width)[nz],
                                        np.clip(tcols, 0, ncols - 1)[nz],
                                        tvals[nz]))
                    changed = True
                    continue
            plan_entry, entry_arrays = None, t
            if sc != 0 and width >= 2:
                lane = np.arange(width, dtype=np.int64)
                gidx = (t["cols"][:, None].astype(np.int64)
                        + (sc * delta) * lane[None, :])
                flat = np.clip(gidx, 0, ncols - 1).reshape(-1)
                order, n_pageable, plan = build_unit_pages(flat, width,
                                                           ncols)
                if plan is not None:
                    entry_arrays = {
                        "rows": t["rows"][order], "cols": t["cols"][order],
                        "vals": t["vals"][order],
                        "plan": {k: plan[k] for k in ("plo", "sl")},
                    }
                    plan_entry = (plan["T"], plan["q"], plan["g"],
                                  plan["npages"])
                    changed = True
            rows64 = np.asarray(entry_arrays["rows"], dtype=np.int64)
            if sr == 0:
                dest = rows64  # one partial per unit
            else:
                lane = np.arange(width, dtype=np.int64)
                dest = np.clip(rows64[:, None] + (sr * delta) * lane[None],
                               0, self.tables.nrows - 1).reshape(-1)
            if entry_arrays is t:
                entry_arrays = dict(t)
            scat_entry = _scatter_entry(entry_arrays, dest)
            if scat_entry is not None:
                changed = True
            run_meta.append((enc_i, delta, width, plan_entry, scat_entry))
            run_arrays.append(entry_arrays)

        # --- block tables: unit-page gather plans + y-side routes ---
        block_meta = []
        block_arrays = []
        for (enc_i, br, bc), t in zip(self.meta[3], arrays["blocks"]):
            plan_entry, entry_arrays = None, t
            # a (br, bc) block is br width-bc step-1 runs: ride the fused
            # run pipeline (lane-placed K1 + shared merged route) as a
            # PSEUDO run table — the whole legacy fblk chain (paged
            # gather + XLA FMA/roll + per-row segments, ~52us on the
            # blocky bench) collapses into the rlp kernel
            if bc >= 2 and 128 % bc == 0:
                from sparsex_tpu.ops.fused import build_fused_run
                from sparsex_tpu.preprocess.encodings import EncType
                U = int(np.asarray(t["rows"]).size)
                cols_b = np.tile(np.asarray(t["cols"], dtype=np.int64), br)
                rows_b = (np.asarray(t["rows"], dtype=np.int64)[None, :]
                          + np.arange(br, dtype=np.int64)[:, None]
                          ).reshape(-1)
                vals_b = np.ascontiguousarray(
                    np.asarray(t["vals"]).transpose(1, 0, 2)).reshape(
                    br * U, bc)
                fmeta_b, farr_b, order_b, n_page_b = build_fused_run(
                    cols_b, rows_b, vals_b, ncols, self.tables.nrows, bc)
                if fmeta_b is not None:
                    tail = order_b[n_page_b:]
                    run_meta.append(
                        (int(EncType.HORIZONTAL), 1, bc, None, None,
                         ("frun", fmeta_b, 0)))
                    run_arrays.append({"frun": farr_b})
                    if tail.size:
                        tcols = (cols_b[tail][:, None]
                                 + np.arange(bc, dtype=np.int64)[None, :]
                                 ).reshape(-1)
                        tvals = vals_b[tail].reshape(-1)
                        nz = tvals != 0
                        demoted.append((np.repeat(rows_b[tail], bc)[nz],
                                        np.clip(tcols, 0, ncols - 1)[nz],
                                        tvals[nz]))
                    block_meta.append((enc_i, br, bc, None, None,
                                       ("cvt",)))
                    block_arrays.append({})
                    changed = True
                    continue
            if bc >= 2:
                gidx = (t["cols"][:, None].astype(np.int64)
                        + np.arange(bc, dtype=np.int64)[None, :])
                flat = np.clip(gidx, 0, ncols - 1).reshape(-1)
                order, n_pageable, plan = build_unit_pages(flat, bc, ncols)
                if plan is not None and 128 % bc == 0:
                    # fully fused blocks: the gathered grid stays in
                    # (T, 8, 128) form; each block row r becomes a routed
                    # segment (XLA lane-roll sliding sums -> shared K3);
                    # no thin (U, bc) reshape, no batched einsum
                    fblk = self._build_fblk(t, order, plan, br, bc, ncols)
                    if fblk is not None:
                        entry_arrays, seg_metas, n_tail = fblk
                        tail = entry_arrays.pop("_tail")
                        if tail.size:
                            tr = np.asarray(t["rows"], np.int64)[tail]
                            tc = np.asarray(t["cols"], np.int64)[tail]
                            tv = np.asarray(t["vals"])[tail]  # (U,br,bc)
                            rr = (tr[:, None, None]
                                  + np.arange(br, dtype=np.int64)[None, :,
                                                                  None])
                            cc2 = (tc[:, None, None]
                                   + np.arange(bc, dtype=np.int64)[None,
                                                                   None])
                            rr = np.broadcast_to(rr, tv.shape).reshape(-1)
                            cc2 = np.broadcast_to(cc2,
                                                  tv.shape).reshape(-1)
                            tvf = tv.reshape(-1)
                            nz = tvf != 0
                            demoted.append(
                                (np.clip(rr, 0,
                                         self.tables.nrows - 1)[nz],
                                 np.clip(cc2, 0, ncols - 1)[nz],
                                 tvf[nz]))
                        plan_entry = (plan["T"], plan["q"], plan["g"],
                                      plan["npages"])
                        block_meta.append((enc_i, br, bc, plan_entry,
                                           None, ("fblk", seg_metas,
                                                  n_tail)))
                        block_arrays.append(entry_arrays)
                        changed = True
                        continue
                if plan is not None:
                    entry_arrays = {
                        "rows": t["rows"][order], "cols": t["cols"][order],
                        "vals": t["vals"][order],
                        "plan": {k: plan[k] for k in ("plo", "sl")},
                    }
                    plan_entry = (plan["T"], plan["q"], plan["g"],
                                  plan["npages"])
                    changed = True
            rows64 = np.asarray(entry_arrays["rows"], dtype=np.int64)
            dest = np.clip(rows64[:, None] + np.arange(br, dtype=np.int64),
                           0, self.tables.nrows - 1).reshape(-1)
            if entry_arrays is t:
                entry_arrays = dict(t)
            scat_entry = _scatter_entry(entry_arrays, dest)
            if scat_entry is not None:
                changed = True
            block_meta.append((enc_i, br, bc, plan_entry, scat_entry))
            block_arrays.append(entry_arrays)

        # --- delta + DIA: the fused 3-kernel pipeline (ops/fused.py),
        # over the matrix's delta singles PLUS every demoted unit-table
        # tail element ---
        vdt = (np.dtype(np.float32) if self._dtype == "bfloat16"
               else np.dtype(self._dtype))
        if d is not None and d.nnz:
            dvals = np.asarray(d.vals).astype(vdt, copy=False)
            cols64 = np.asarray(d.cols, dtype=np.int64)
            rows64 = np.asarray(d.row_ids, dtype=np.int64)
        else:
            dvals = np.zeros(0, dtype=vdt)
            cols64 = np.zeros(0, dtype=np.int64)
            rows64 = np.zeros(0, dtype=np.int64)
        if demoted:
            rows64 = np.concatenate(
                [rows64] + [r.astype(np.int64) for r, _, _ in demoted])
            cols64 = np.concatenate(
                [cols64] + [c.astype(np.int64) for _, c, _ in demoted])
            dvals = np.concatenate(
                [dvals] + [v.astype(vdt, copy=False) for _, _, v in demoted])
            # the demoted elements must reach SOME delta path even when
            # no paged/fused layout applies below
            arrays["delta"] = {"row_ids": rows64, "cols": cols64,
                               "vals": dvals}
            changed = True
        if dvals.size:
            from sparsex_tpu.ops.fused import build_fused_delta
            fmeta, farrs = build_fused_delta(cols64, rows64, dvals,
                                             ncols, self.tables.nrows)
            if fmeta is not None:
                arrays["fused"] = farrs
                arrays["delta"] = None  # leftover lives inside farrs
                dfused_entry = ("dfused", fmeta)
                changed = True
        if dvals.size and dfused_entry is None:
            from sparsex_tpu.ops.route import fold_sort_key
            rep, leftover = build_delta_pages(
                cols64, rows64, dvals, ncols, self.tables.nrows,
                sort_key=fold_sort_key(rows64, self.tables.nrows, cols64))
            if rep is not None:
                q, npages = rep.pop("q"), rep.pop("npages")
                T = rep["plo"].size
                arrays["delta_pages"] = rep
                if leftover.size:
                    lo = np.sort(leftover)
                    arrays["delta"] = {
                        "row_ids": rows64[lo], "cols": cols64[lo],
                        "vals": dvals[lo]}
                else:
                    arrays["delta"] = None
                dmeta_entry = ("dpages", T, q, npages)
                changed = True
                # y side: route products through the static scatter network
                # instead of the serialized XLA scatter (ops/route.py).
                plan = build_scatter_plan(
                    np.asarray(rep["rows"], dtype=np.int64),
                    self.tables.nrows)
                if plan is not None:
                    dmetas, darrs, res_pos, res_dest = plan
                    rep.pop("rows")  # never read on the routed path
                    arrays["delta_scatter"] = {
                        "chunks": darrs, "res_pos": res_pos,
                        "res_dest": res_dest}
                    dscatter_entry = ("dscatter", dmetas,
                                      bool(res_pos.size))

        if not changed:
            return
        # --- merged route plan: ONE K2/K3 instance set over the
        # concatenation of every fused segment's source grid.  K2's cost
        # is ~fixed per instance (colors x W2 transposes, ~60us measured
        # r3), so per-segment instances multiply it; the merged plan
        # collapses them (the single biggest structured-matrix lever).
        fall_entry = None
        try:
            fall_entry = self._merge_fused_segments(
                arrays, dfused_entry, run_meta, run_arrays,
                block_meta, block_arrays)
        except Exception:  # pragma: no cover - merge must never break
            from sparsex_tpu.logger import log_warning
            import traceback
            log_warning("merged fused plan failed; keeping per-segment "
                        "plans:\n%s", traceback.format_exc())
        # pop host-only stashes regardless of merge outcome
        if "fused" in arrays:
            for k in ("_dest", "_tile_group", "_cols_at_pos",
                      "_vals_flat"):
                arrays["fused"].pop(k, None)
        for a in run_arrays:
            if "frun" in a:
                for k in ("_dest", "_punit", "_cols_u_o", "_vals2d_o"):
                    a["frun"].pop(k, None)
        for a in block_arrays:
            a.pop("_dest_r", None)

        # DIA tables ride the shared K3 whenever ANY fused segment exists
        # (delta pipeline or a unit table's routed partials)
        k3dias_entry = None

        def _seg_fused(e):
            # a segment enqueues into the shared K3 when it carries either
            # a routed-partial scatter ("fs" at e[4]) or a fully fused
            # run/block pipeline ("frun"/"fblk" at e[5])
            return ((len(e) > 4 and e[4] and e[4][0] == "fs")
                    or (len(e) > 5 and e[5]
                        and e[5][0] in ("frun", "fblk")))

        any_fs = (dfused_entry is not None
                  or any(_seg_fused(e) for e in run_meta + block_meta))
        if any_fs and self.meta[4]:
            from sparsex_tpu.ops.fused import pad_dias_for_k3
            dia_offs, dv, anti_offs, adv = pad_dias_for_k3(
                self.meta[4], arrays["dias"], self.tables.nrows)
            if dv is not None:
                arrays["dias_fused_dv"] = dv
            if adv is not None:
                arrays["dias_fused_adv"] = adv
            # keep the raw per-offset grids too: SpMV reads only the
            # padded K3 streams (jit prunes unused args), but the SpMM
            # column loop runs with skip_dias and adds the DIA part as
            # ONE (rows, k) slab pass that reads each dv grid once
            # instead of once per column
            k3dias_entry = ("k3dias", dia_offs, anti_offs)
        arrays["runs"] = run_arrays
        arrays["blocks"] = block_arrays
        self._pages_arrays = arrays
        meta = list(self.meta)
        meta[2] = tuple(run_meta)
        meta[3] = tuple(block_meta)
        extras = [e for e in (dmeta_entry, dscatter_entry, dfused_entry,
                              k3dias_entry, fall_entry) if e]
        self._pages_meta = tuple(meta) + tuple(extras)

    def _build_fblk(self, t, order, plan, br: int, bc: int, ncols: int):
        """Fused-block segments: per block row r, a routed segment whose
        source is the gathered grid after a width-bc sliding lane sum
        (destinations at unit-end lanes, ref ``block_row_tmpl.c``'s
        register-blocked FMA role).  Returns (entry_arrays, seg_metas,
        n_tail) or None."""
        from sparsex_tpu.ops.fused import plan_partial_segment

        T, g = plan["T"], plan["g"]
        n_page = T * g
        U = t["rows"].shape[0]
        rows_o = t["rows"][order].astype(np.int64)
        vals_o = np.asarray(t["vals"])[order]        # (U, br, bc)
        nrows = self.tables.nrows
        entry_arrays = {
            "plan": {k: plan[k] for k in ("plo", "sl")},
        }
        # per-r value grids in gathered-grid order
        vg = np.zeros((br, T, 8, 128), dtype=vals_o.dtype)
        vg[:, :, :, :] = np.moveaxis(
            vals_o[:n_page], 1, 0).reshape(br, T, 8, 128)
        entry_arrays["valsg"] = vg
        seg_metas = []
        dest = np.full(T * 1024, nrows, dtype=np.int64)
        ends = np.arange(n_page, dtype=np.int64) * bc + (bc - 1)
        dest_rs = []
        for r in range(br):
            dest[ends] = rows_o[:n_page] + r
            dest_rs.append(dest.copy())
            seg = plan_partial_segment(dest_rs[-1], nrows)
            if seg is None:
                return None
            inst_meta, seg_arrays, has_res, M_pad = seg
            entry_arrays[f"fb_{r}"] = seg_arrays
            seg_metas.append((inst_meta, has_res, M_pad))
        entry_arrays["_dest_r"] = dest_rs
        entry_arrays["_tail"] = order[n_page:]   # caller demotes to delta
        return entry_arrays, tuple(seg_metas), 0

    def _merge_fused_segments(self, arrays, dfused_entry, run_meta,
                              run_arrays, block_meta, block_arrays):
        """Build the merged ("fall") plan over every fused segment's
        source grid; repacks delta/run G1 wires in place and stores the
        merged instance arrays under ``arrays["fall"]``.  Returns the
        static extras entry or None."""
        import numpy as np

        from sparsex_tpu.ops.fused import (K1_GT, merge_segment_plan,
                                           pack_k1_meta)

        nrows = self.tables.nrows
        seg_desc = []
        dest_list = []
        tg = None
        if dfused_entry is not None and "_dest" in arrays.get("fused", {}):
            dest_list.append(arrays["fused"]["_dest"])
            tg = arrays["fused"].get("_tile_group")
            seg_desc.append(("delta",))
        for ri, e in enumerate(run_meta):
            if (len(e) > 5 and e[5] and e[5][0] == "frun"
                    and "_dest" in run_arrays[ri].get("frun", {})):
                dest_list.append(run_arrays[ri]["frun"]["_dest"])
                seg_desc.append(("run", ri))
        for bi, e in enumerate(block_meta):
            if (len(e) > 5 and e[5] and e[5][0] == "fblk"
                    and "_dest_r" in block_arrays[bi]):
                for r, d in enumerate(block_arrays[bi]["_dest_r"]):
                    dest_list.append(d)
                    seg_desc.append(("blk", bi, r))
        if len(dest_list) < 2:
            return None     # a single segment is already one instance

        merged = merge_segment_plan(dest_list, nrows,
                                    delta_tile_group=tg)
        if merged is None:
            from sparsex_tpu.logger import log_warning
            log_warning("merged fused plan not applicable; the %d fused "
                        "segments keep separate route instances",
                        len(dest_list))
            return None
        inst_meta, marrays, bounds, has_res = merged

        # identity G1 in the segment kernels: the merged instances apply
        # their own G1 at runtime (overlapping folds, see merged_e1s);
        # run/delta kernels then emit RAW grids.  Identity wires on a
        # padded tile read its zeros, so padding stays exact.
        # All per-segment mutations are STAGED and applied only after the
        # whole merge succeeds: an exception mid-loop (caught by the
        # caller, which keeps the per-segment plans) must not leave a
        # segment kernel holding identity G1 wires (ADVICE r3).
        ident = np.broadcast_to(np.arange(128, dtype=np.int32),
                                (8, 128)).astype(np.int32)
        staged_mg = []   # (target_dict, new_mg) applied on success
        res_pos = marrays.pop("res_pos", None)
        res_dest = marrays.pop("res_dest", None)
        res_desc = []
        for si, (kind, *ids) in enumerate(seg_desc):
            b0, b1 = bounds[si], bounds[si + 1]
            if kind == "delta":
                f = arrays["fused"]
                for mk in ("mg", "mg2"):   # hybrid tail carries mg2
                    if mk not in f:
                        continue
                    low = np.asarray(f[mk]) & 0x3FFF
                    staged_mg.append(
                        (f, mk,
                         (low | ((ident + 1) << 16)).astype(np.int32)))
            elif kind == "run":
                fr = run_arrays[ids[0]]["frun"]
                low = np.asarray(fr["mg"]) & 0x3FFF
                staged_mg.append(
                    (fr, "mg",
                     (low | ((ident + 1) << 16)).astype(np.int32)))
            if res_pos is not None and res_pos.size:
                m = (res_pos >= b0 * 128) & (res_pos < b1 * 128)
                if not m.any():
                    continue
                lp_ = res_pos[m].astype(np.int64) - b0 * 128
                dd = res_dest[m].astype(np.int32)
                if kind == "delta":
                    f = arrays["fused"]
                    cap = f["_cols_at_pos"]
                    # merged-order flat values (hybrid layouts interleave
                    # two K1 parts; per-part "vals" would misindex)
                    vflat = (f["_vals_flat"] if "_vals_flat" in f
                             else np.asarray(f["vals"]).reshape(-1))
                    marrays["dres_cols"] = np.minimum(
                        cap[lp_], self.tables.ncols - 1).astype(np.int32)
                    marrays["dres_vals"] = vflat[lp_]
                    marrays["dres_dest"] = dd
                    res_desc.append(("dres",))
                elif kind == "run":
                    ri = ids[0]
                    fr = run_arrays[ri]["frun"]
                    u = fr["_punit"][lp_]
                    marrays[f"rres_{ri}_cols"] = fr["_cols_u_o"][u].astype(
                        np.int32)
                    marrays[f"rres_{ri}_vals"] = fr["_vals2d_o"][u]
                    marrays[f"rres_{ri}_dest"] = dd
                    res_desc.append(("rres", ri))
                else:
                    bi, r = ids
                    marrays[f"bres_{bi}_{r}_pos"] = lp_.astype(np.int32)
                    marrays[f"bres_{bi}_{r}_dest"] = dd
                    res_desc.append(("bres", bi, r))
        # merge fully planned: NOW apply the staged mg repacks and drop
        # the (dead) per-segment instance arrays
        for tgt, mk, new_mg in staged_mg:
            tgt[mk] = new_mg
        if any(k == "delta" for k, *_ in seg_desc):
            f = arrays["fused"]
            for i in range(len(dfused_entry[1][3])):
                for kk in ("g2a", "g2b", "g2c", "g3"):
                    f.pop(f"{kk}_{i}", None)
        for kind, *ids in seg_desc:
            if kind == "run":
                fr = run_arrays[ids[0]]["frun"]
                for i in range(len(run_meta[ids[0]][5][1][3])):
                    for kk in ("g2a", "g2b", "g2c", "g3"):
                        fr.pop(f"{kk}_{i}", None)
            elif kind == "blk":
                bi, r = ids
                block_arrays[bi].pop(f"fb_{r}", None)
        arrays["fall"] = marrays
        return ("fall", tuple(seg_desc), inst_meta,
                tuple(bounds), tuple(res_desc))

    def invalidate_value_caches(self) -> None:
        """Drop layouts that copied table values (page/route forms and the
        device-resident copies); the plain HOST arrays are views of the
        tables and stay current.  Called by ``CsxMatrix.set_entry`` so
        value writes stay O(1) + lazy rebuild."""
        self._pages_tried = False
        self._pages_meta = None
        self._pages_arrays = None
        self._dev_plain = None
        self._dev_pages = None

    def _routed(self) -> bool:
        """Whether the paged variant carries a delta scatter route (no
        serialized op left -> the fused Pallas DIA always wins)."""
        return bool(self._pages_meta) and any(
            e and e[0] in ("dscatter", "dfused")
            for e in self._pages_meta[5:])

    def _pages_active(self) -> bool:
        if _pallas_mode() is False:
            return False
        from sparsex_tpu.ops.pallas_kernels import (dia_pallas_ok,
                                                    pallas_dtype_ok)
        if not dia_pallas_ok():
            return False
        if not pallas_dtype_ok(self._dtype) and self._dtype != "bfloat16":
            # f64 runs the XLA paths (Mosaic kernels are f32-tiled);
            # say so once — on TPU this costs real throughput and
            # spx.tpu.value_dtype=float32 is the recommended setting.
            # (bf16 matrices compute in f32: the page/route layouts are
            # built as f32 copies and x upcasts at dispatch.)
            if not getattr(self, "_dtype_warned", False):
                self._dtype_warned = True
                from sparsex_tpu.logger import log_info
                log_info(
                    "value dtype %s bypasses the Pallas page/route "
                    "kernels (f32-only); set spx.tpu.value_dtype=float32 "
                    "for full TPU throughput", self._dtype)
            return False
        self._maybe_build_pages()
        return self._pages_meta is not None

    # Above this RHS count the plain 2-D XLA path (one pass, per-element
    # gathers) beats re-running the paged/routed SpMV per column.
    MM_COLUMN_LOOP_MAX = 64

    def __call__(self, x, alpha=1.0, beta=0.0, y=None):
        import jax
        import jax.numpy as jnp
        x = jnp.asarray(x)
        # under an ambient user trace, skip the device-copy caching
        self._tracing = isinstance(x, jax.core.Tracer)
        if x.dtype == jnp.bfloat16 and self._pages_active():
            # compute in f32 on the paged/routed layouts (measured ~30x
            # over the serialized XLA bf16 path), cast the result back
            y32 = self(x.astype(jnp.float32), alpha=alpha, beta=beta,
                       y=None if y is None
                       else jnp.asarray(y).astype(jnp.float32))
            return y32.astype(jnp.bfloat16)
        meta, arrays = self.meta, None
        if x.ndim == 2:
            # SpMM: measured on v5e, XLA's (row, k)-slice gathers/scatters
            # still cost per ELEMENT (~2.4 ns), so for moderate k it is
            # much faster to run the paged+routed SpMV once per column.
            # ``lax.map`` keeps ONE pipeline instance in the trace (a
            # Python loop would compile k copies).
            if (x.shape[1] <= self.MM_COLUMN_LOOP_MAX
                    and self._pages_active()):
                meta, arrays = self._pages_meta, self._device(True)
                apply_a = not (isinstance(alpha, (int, float))
                               and float(alpha) == 1.0)
                fn_mm = _compiled_mm(meta, self._dtype,
                                     _resolve_use_pallas(
                                         self.tables,
                                         routed=self._routed()),
                                     apply_a, bool(meta[4]))
                out = fn_mm(arrays, x.T, x.dtype.type(alpha))
                if y is not None and beta != 0.0:
                    out = out + x.dtype.type(beta) * jnp.asarray(y)
                return out
        elif self._pages_active():
            meta, arrays = self._pages_meta, self._device(True)
        if arrays is None:
            arrays = self._device(False)
        shape = meta[0] if x.ndim == 1 else (meta[0], x.shape[1])
        # dispatch-time epilogue elision: alpha/beta arrive as Python
        # scalars on the hot API path
        apply_alpha = not (isinstance(alpha, (int, float))
                           and float(alpha) == 1.0)
        apply_beta = not (y is None or (isinstance(beta, (int, float))
                                        and float(beta) == 0.0))
        y0 = (jnp.zeros(shape, dtype=x.dtype)
              if y is None else jnp.asarray(y))
        fn = _compiled(meta, self._dtype,
                       _resolve_use_pallas(self.tables,
                                           routed=(meta is not self.meta
                                                   and self._routed())),
                       apply_alpha=apply_alpha, apply_beta=apply_beta)
        return fn(arrays, x, x.dtype.type(alpha), x.dtype.type(beta), y0)
