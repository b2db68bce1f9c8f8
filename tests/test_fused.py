"""Fused routed-delta + DIA pipeline (interpret mode on CPU).

Covers the three fused kernels of ``ops/fused.py`` (product+G1, the
VMEM-resident middle stage, G3+DIA+single-y-write) against the COO oracle,
plus plan-construction edge cases: ragged/rectangular shapes,
anti-diagonals, residual capacity overflow and the executor integration.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp
from jax.experimental.pallas import tpu as pltpu

import sparsex_tpu.ops.fused as fused
import sparsex_tpu.ops.pallas_kernels as pk
from sparsex_tpu.ops import route as route_mod


@pytest.fixture(autouse=True)
def small_thresholds(monkeypatch):
    monkeypatch.setattr(fused, "MIN_FUSED_NNZ", 256)
    monkeypatch.setattr(pk, "MIN_PAGE_NNZ", 64)
    monkeypatch.setattr(route_mod, "MIN_ELEMS", 64)
    yield


def _mk_singles(rng, n, ncols, m):
    rows = rng.integers(0, n, m)
    cols = rng.integers(0, ncols, m)
    key = rows.astype(np.int64) * ncols + cols
    _, u = np.unique(key, return_index=True)
    rows, cols = rows[u], cols[u]
    vals = rng.standard_normal(rows.size).astype(np.float32)
    return rows, cols, vals


def _run(meta, arrays, dias_meta, dias_arrays, x, n, ncols):
    pack = fused.pad_dias_for_k3(dias_meta, dias_arrays, n)
    with pltpu.force_tpu_interpret_mode():
        acc = fused.fused_delta_dia_apply(
            meta, jax.device_put(arrays), pack, jnp.asarray(x), n, ncols)
    return np.asarray(acc, dtype=np.float64)


def _oracle(n, ncols, rows, cols, vals, dias_meta, dias_arrays, x):
    want = np.zeros(n, np.float64)
    np.add.at(want, rows, vals.astype(np.float64) * x[cols])
    r = np.arange(n)
    for (anti, offs, _), t in zip(dias_meta, dias_arrays):
        dv = t["vals"]
        for k, o in enumerate(offs):
            if anti:
                ok = (o - r >= 0) & (o - r < ncols)
                want[r[ok]] += dv[k, r[ok]] * x[(o - r)[ok]]
            else:
                ok = (r + o >= 0) & (r + o < ncols)
                want[r[ok]] += dv[k, r[ok]] * x[(r + o)[ok]]
    return want


@pytest.mark.parametrize("n,ncols,m", [
    (1 << 15, 1 << 15, 12000),       # square aligned
    (100000, 90000, 20000),          # ragged + rectangular
])
def test_fused_delta_only(n, ncols, m):
    rng = np.random.default_rng(0)
    rows, cols, vals = _mk_singles(rng, n, ncols, m)
    meta, arrays = fused.build_fused_delta(cols.astype(np.int64),
                                           rows.astype(np.int64), vals,
                                           ncols, n)
    assert meta is not None
    x = rng.standard_normal(ncols).astype(np.float32)
    acc = _run(meta, arrays, [], [], x, n, ncols)
    want = _oracle(n, ncols, rows, cols, vals, [], [], x)
    assert np.abs(acc - want).max() / np.abs(want).max() < 1e-5


def test_fused_with_dias_and_anti():
    rng = np.random.default_rng(1)
    n = ncols = 1 << 15
    rows, cols, vals = _mk_singles(rng, n, ncols, 9000)
    meta, arrays = fused.build_fused_delta(cols.astype(np.int64),
                                           rows.astype(np.int64), vals,
                                           ncols, n)
    assert meta is not None
    r = np.arange(n)
    dias_meta = [(False, (0, 5, -7), 3), (True, (n - 1, n + 3), 2)]
    dv = rng.standard_normal((3, n)).astype(np.float32)
    for k, o in enumerate((0, 5, -7)):
        dv[k, (r + o < 0) | (r + o >= ncols)] = 0
    av = rng.standard_normal((2, n)).astype(np.float32)
    for k, s in enumerate((n - 1, n + 3)):
        av[k, (s - r < 0) | (s - r >= ncols)] = 0
    dias_arrays = [{"vals": dv}, {"vals": av}]
    x = rng.standard_normal(ncols).astype(np.float32)
    acc = _run(meta, arrays, dias_meta, dias_arrays, x, n, ncols)
    want = _oracle(n, ncols, rows, cols, vals, dias_meta, dias_arrays, x)
    assert np.abs(acc - want).max() / np.abs(want).max() < 1e-5


def test_fused_residual_capacity():
    """A few very hot destination rows force over-capacity residuals; the
    XLA residual scatter must pick them up exactly."""
    rng = np.random.default_rng(2)
    n = 1 << 14
    hot = np.repeat(np.arange(16), 12)          # 16 rows x 12 entries
    rows = np.concatenate([hot, rng.integers(0, n, 4000)])
    cols = rng.integers(0, n, rows.size)
    key = rows.astype(np.int64) * n + cols
    _, u = np.unique(key, return_index=True)
    rows, cols = rows[u], cols[u]
    vals = rng.standard_normal(rows.size).astype(np.float32)
    meta, arrays = fused.build_fused_delta(cols.astype(np.int64),
                                           rows.astype(np.int64), vals,
                                           n, n, max_k=4)
    assert meta is not None
    assert meta[4] > 0, "expected residual elements"
    x = rng.standard_normal(n).astype(np.float32)
    acc = _run(meta, arrays, [], [], x, n, n)
    want = _oracle(n, n, rows, cols, vals, [], [], x)
    assert np.abs(acc - want).max() / np.abs(want).max() < 1e-5


def test_fused_multi_fold_instances():
    """Moderately hot pages exercise multiple capacity folds (several
    route instances feeding one K3)."""
    rng = np.random.default_rng(3)
    n = 1 << 14
    # ~280 elements into each of the first 40 dest pages -> ~3 capacity
    # folds, the first two holding >4096 edges each (so they survive
    # demote_small_instances; the <128-per-page third fold is demoted);
    # hot columns stay clustered (pageable) so the folds are routed, not
    # spilled; the background avoids the hot pages entirely
    npages_hot, per_page = 40, 280
    hotpage = (np.repeat(np.arange(npages_hot), per_page) * 128
               + rng.integers(0, 128, npages_hot * per_page))
    hotcols = rng.integers(0, 4096, npages_hot * per_page)
    rows = np.concatenate([hotpage,
                           rng.integers(npages_hot * 128, n, 6000)])
    cols = np.concatenate([hotcols, rng.integers(0, n, 6000)])
    key = rows.astype(np.int64) * n + cols
    _, u = np.unique(key, return_index=True)
    rows, cols = rows[u], cols[u]
    vals = rng.standard_normal(rows.size).astype(np.float32)
    meta, arrays = fused.build_fused_delta(cols.astype(np.int64),
                                           rows.astype(np.int64), vals,
                                           n, n, max_k=128)
    assert meta is not None
    assert len(meta[3]) > 1, "expected multiple route instances"
    x = rng.standard_normal(n).astype(np.float32)
    acc = _run(meta, arrays, [], [], x, n, n)
    want = _oracle(n, n, rows, cols, vals, [], [], x)
    assert np.abs(acc - want).max() / np.abs(want).max() < 1e-5


def test_executor_fused_end_to_end(monkeypatch):
    """CsxExecutor builds and dispatches the fused variant; alpha/beta and
    the oracle check ride through ``__call__``."""
    from sparsex_tpu.config import Config
    from sparsex_tpu.csx import CsxMatrix

    monkeypatch.setattr(pk, "dia_pallas_ok", lambda: True)
    cfg = Config.instance()
    cfg.set("spx.tpu.value_dtype", "float32")
    cfg.set("spx.preproc.xform", "all")

    rng = np.random.default_rng(6)
    n, m = 8192, 9000
    rows_l, cols_l = [], []
    for b in (0, 3, -2):
        r = np.arange(max(0, -b), min(n, n - b))
        rows_l.append(r)
        cols_l.append(r + b)
    s = n
    r = np.arange(max(0, s - n + 1), min(n, s + 1))
    rows_l.append(r)
    cols_l.append(s - r)
    rows_l.append(rng.integers(0, n, m))
    cols_l.append(rng.integers(0, n, m))
    rows = np.concatenate(rows_l)
    cols = np.concatenate(cols_l)
    key = rows * n + cols
    _, uniq = np.unique(key, return_index=True)
    rows, cols = rows[uniq], cols[uniq]
    o = np.lexsort((cols, rows))
    rows, cols = rows[o], cols[o]
    vals = rng.standard_normal(rows.size).astype(np.float32)

    mat = CsxMatrix.from_coo(n, n, rows, cols, vals)
    ex = mat.executors[0]
    with pltpu.force_tpu_interpret_mode():
        assert ex._pages_active()
        extras = {e[0]: e[1:] for e in ex._pages_meta[5:] if e}
        assert "dfused" in extras, "fused plan not built"
        x = rng.standard_normal(n).astype(np.float32)
        y = np.asarray(ex(jnp.asarray(x)))
        y0 = rng.standard_normal(n).astype(np.float32)
        y2 = np.asarray(ex(jnp.asarray(x), alpha=2.5, beta=0.5,
                           y=jnp.asarray(y0)))
    ref = np.zeros(n, np.float64)
    np.add.at(ref, rows, vals.astype(np.float64) * x[cols])
    assert np.abs(y - ref).max() / np.abs(ref).max() < 1e-5
    ref2 = 2.5 * ref + 0.5 * y0
    assert np.abs(y2 - ref2).max() / np.abs(ref2).max() < 1e-5


def test_stacked_planner_bail_logs_warning():
    """VERDICT r2 #8: a route-plan rejection must log a WARNING naming the
    fallback, never degrade silently."""
    from sparsex_tpu.logger import Level, LoggingHandler

    msgs = []
    handler = LoggingHandler.instance()
    old = dict(handler.sinks)
    try:
        handler.set_sink(Level.WARNING, msgs.append)
        rng = np.random.default_rng(5)
        # all elements into ONE row: k-multiplicity blows max_k for sure
        dest = np.zeros(128 * 64, dtype=np.int64)
        plan = route_mod.build_scatter_plan(dest, 1 << 14, max_k=2,
                                            min_elems=1)
        assert plan is None
        assert any("scatter-route plan rejected" in m for m in msgs)
    finally:
        handler.sinks.update(old)


def test_fused_run_kernel_end_to_end(monkeypatch):
    """Horizontal runs ride the fully fused kernel (gather + FMA +
    sliding lane sum + G1 -> shared K3); tail + residual units stay
    exact."""
    from sparsex_tpu.config import Config
    from sparsex_tpu.csx import CsxMatrix

    monkeypatch.setattr(pk, "dia_pallas_ok", lambda: True)
    cfg = Config.instance()
    cfg.set("spx.tpu.value_dtype", "float32")
    cfg.set("spx.preproc.xform", "h")

    rng = np.random.default_rng(11)
    n = 1 << 14
    nu = 1200
    hr = rng.integers(0, n, nu)
    hc = rng.integers(0, n - 8, nu)
    rows = np.repeat(hr, 8)
    cols = (hc[:, None] + np.arange(8)[None]).ravel()
    key = rows.astype(np.int64) * n + cols
    _, u = np.unique(key, return_index=True)
    rows, cols = rows[u], cols[u]
    o = np.lexsort((cols, rows))
    rows, cols = rows[o], cols[o]
    vals = rng.standard_normal(rows.size).astype(np.float32)

    mat = CsxMatrix.from_coo(n, n, rows, cols, vals)
    ex = mat.executors[0]
    with pltpu.force_tpu_interpret_mode():
        assert ex._pages_active()
        fruns = [e[5] for e in ex._pages_meta[2]
                 if len(e) > 5 and e[5] and e[5][0] == "frun"]
        assert fruns, "fused run kernel not built"
        x = rng.standard_normal(n).astype(np.float32)
        y = np.asarray(ex(jnp.asarray(x)))
    ref = np.zeros(n, np.float64)
    np.add.at(ref, rows, vals.astype(np.float64) *
              x.astype(np.float64)[cols])
    assert np.abs(y - ref).max() / np.abs(ref).max() < 1e-5


def test_fused_block_kernel_end_to_end(monkeypatch):
    """Block tables ride the fused path: gathered grid stays (T,8,128),
    each block row is an XLA lane-roll sliding sum + routed segment into
    the shared K3 (no thin reshape, no batched einsum)."""
    from sparsex_tpu.config import Config
    from sparsex_tpu.csx import CsxMatrix

    monkeypatch.setattr(pk, "dia_pallas_ok", lambda: True)
    monkeypatch.setattr(pk, "MIN_PAGE_NNZ", 1024)
    cfg = Config.instance()
    cfg.set("spx.tpu.value_dtype", "float32")
    cfg.set("spx.preproc.xform", "all")

    rng = np.random.default_rng(4)
    n = 1 << 15
    br0 = rng.integers(0, (n - 4) // 4, 8000) * 4
    bc0 = rng.integers(0, (n - 2) // 2, 8000) * 2
    ii, jj = np.meshgrid(np.arange(4), np.arange(2), indexing="ij")
    rows = (br0[:, None, None] + ii[None]).ravel()
    cols = (bc0[:, None, None] + jj[None]).ravel()
    key = rows.astype(np.int64) * n + cols
    _, u = np.unique(key, return_index=True)
    rows, cols = rows[u], cols[u]
    o = np.lexsort((cols, rows))
    rows, cols = rows[o], cols[o]
    vals = rng.standard_normal(rows.size).astype(np.float32)

    mat = CsxMatrix.from_coo(n, n, rows, cols, vals)
    ex = mat.executors[0]
    with pltpu.force_tpu_interpret_mode():
        assert ex._pages_active()
        kinds = [e[5][0] for e in ex._pages_meta[3]
                 if len(e) > 5 and e[5]]
        assert "cvt" in kinds, "blocks not converted to pseudo-runs"
        # the converted table appears as an extra fused-run entry
        fruns = [e for e in ex._pages_meta[2]
                 if len(e) > 5 and e[5] and e[5][0] == "frun"]
        assert fruns, "pseudo-run table missing"
        x = rng.standard_normal(n).astype(np.float32)
        y = np.asarray(ex(jnp.asarray(x)))
    ref = np.zeros(n, np.float64)
    np.add.at(ref, rows, vals.astype(np.float64) *
              x.astype(np.float64)[cols])
    assert np.abs(y - ref).max() / np.abs(ref).max() < 1e-5


def test_fblk_fallback_end_to_end(monkeypatch):
    """When the run conversion bails, block tables keep the legacy fused
    fblk path (gathered grid + XLA lane-roll sums + routed segments)."""
    from sparsex_tpu.config import Config
    from sparsex_tpu.csx import CsxMatrix
    import sparsex_tpu.ops.exec as exec_mod

    monkeypatch.setattr(pk, "dia_pallas_ok", lambda: True)
    monkeypatch.setattr(pk, "MIN_PAGE_NNZ", 1024)
    monkeypatch.setattr(fused, "build_fused_run",
                        lambda *a, **k: (None, None, None, 0))
    cfg = Config.instance()
    cfg.set("spx.tpu.value_dtype", "float32")
    cfg.set("spx.preproc.xform", "all")

    rng = np.random.default_rng(4)
    n = 1 << 15
    br0 = rng.integers(0, (n - 4) // 4, 8000) * 4
    bc0 = rng.integers(0, (n - 2) // 2, 8000) * 2
    ii, jj = np.meshgrid(np.arange(4), np.arange(2), indexing="ij")
    rows = (br0[:, None, None] + ii[None]).ravel()
    cols = (bc0[:, None, None] + jj[None]).ravel()
    key = rows.astype(np.int64) * n + cols
    _, u = np.unique(key, return_index=True)
    rows, cols = rows[u], cols[u]
    o = np.lexsort((cols, rows))
    rows, cols = rows[o], cols[o]
    vals = rng.standard_normal(rows.size).astype(np.float32)

    mat = CsxMatrix.from_coo(n, n, rows, cols, vals)
    ex = mat.executors[0]
    with pltpu.force_tpu_interpret_mode():
        assert ex._pages_active()
        kinds = [e[5][0] for e in ex._pages_meta[3]
                 if len(e) > 5 and e[5]]
        assert "fblk" in kinds, "fblk fallback not built"
        x = rng.standard_normal(n).astype(np.float32)
        y = np.asarray(ex(jnp.asarray(x)))
    ref = np.zeros(n, np.float64)
    np.add.at(ref, rows, vals.astype(np.float64) *
              x.astype(np.float64)[cols])
    assert np.abs(y - ref).max() / np.abs(ref).max() < 1e-5


def test_merged_plan_all_segments(monkeypatch):
    """Delta + runs + blocks all converge in ONE merged route plan (one
    K2/K3 instance set): K2's ~60us fixed per-instance cost made
    per-segment plans the dominant structured-matrix cost (r3 trace)."""
    from sparsex_tpu.config import Config
    from sparsex_tpu.csx import CsxMatrix

    monkeypatch.setattr(pk, "dia_pallas_ok", lambda: True)
    monkeypatch.setattr(pk, "MIN_PAGE_NNZ", 1024)
    cfg = Config.instance()
    cfg.set("spx.tpu.value_dtype", "float32")
    cfg.set("spx.preproc.xform", "all")

    rng = np.random.default_rng(4)
    n = 1 << 15
    rows_l, cols_l = [], []
    br0 = rng.integers(0, (n - 4) // 4, 8000) * 4
    bc0 = rng.integers(0, (n - 2) // 2, 8000) * 2
    ii, jj = np.meshgrid(np.arange(4), np.arange(2), indexing="ij")
    rows_l.append((br0[:, None, None] + ii[None]).ravel())
    cols_l.append((bc0[:, None, None] + jj[None]).ravel())
    hr = rng.integers(0, n, 2000)
    hc = rng.integers(0, n - 8, 2000)
    rows_l.append(np.repeat(hr, 8))
    cols_l.append((hc[:, None] + np.arange(8)[None]).ravel())
    rows_l.append(rng.integers(0, n, 12000))
    cols_l.append(rng.integers(0, n, 12000))
    rows = np.concatenate(rows_l)
    cols = np.concatenate(cols_l)
    key = rows.astype(np.int64) * n + cols
    _, u = np.unique(key, return_index=True)
    rows, cols = rows[u], cols[u]
    o = np.lexsort((cols, rows))
    rows, cols = rows[o], cols[o]
    vals = rng.standard_normal(rows.size).astype(np.float32)

    mat = CsxMatrix.from_coo(n, n, rows, cols, vals)
    ex = mat.executors[0]
    with pltpu.force_tpu_interpret_mode():
        assert ex._pages_active()
        extras = {e[0]: e[1:] for e in ex._pages_meta[5:] if e}
        assert "fall" in extras, "merged plan not built"
        segs = extras["fall"][0]
        kinds = {s[0] for s in segs}
        # blocks convert to pseudo-run segments (exec.py), so the merged
        # plan sees delta + >= 2 run segments (real runs + blocks)
        assert kinds == {"delta", "run"}
        assert sum(1 for s in segs if s[0] == "run") >= 2
        x = rng.standard_normal(n).astype(np.float32)
        y = np.asarray(ex(jnp.asarray(x)))
    ref = np.zeros(n, np.float64)
    np.add.at(ref, rows, vals.astype(np.float64) *
              x.astype(np.float64)[cols])
    assert np.abs(y - ref).max() / np.abs(ref).max() < 1e-5


@pytest.mark.parametrize("W", [8, 4])
def test_run_lane_place_layout(W):
    """The rlp layout: one unit per column head (dense coverage) engages
    lane placement; arcs that wrap the mod-128 lane boundary still sum
    exactly (the sliding roll is circular and slots are W-aligned)."""
    rng = np.random.default_rng(17)
    n = 1 << 13
    U = n - W
    cols_u = np.arange(U, dtype=np.int64)
    rng.shuffle(cols_u)
    rows_u = rng.integers(0, n, U)
    vals2d = rng.standard_normal((U, W)).astype(np.float32)
    meta, arrays, order, n_page = fused.build_fused_run(
        cols_u, rows_u, vals2d, n, n, W)
    assert meta is not None
    assert meta[5] == f"rlp{W}", meta[5]
    x = rng.standard_normal(n).astype(np.float32)
    xj = jnp.asarray(x)
    darr = {k: jnp.asarray(v) for k, v in arrays.items()
            if not k.startswith("_")}
    with pltpu.force_tpu_interpret_mode():
        out = fused.fused_run_e1s(meta, darr, xj, n, n)
        y = fused.k3_combine(out, ((), None, (), None), xj, n, n)
    y = np.asarray(y).reshape(-1)[:n].astype(np.float64)
    if meta[4]:
        ridx = arrays["res_cols_u"][:, None] + np.arange(W)[None, :]
        pr = np.sum(arrays["res_vals2d"].astype(np.float64)
                    * x[np.clip(ridx, 0, n - 1)], axis=1)
        np.add.at(y, arrays["res_dest"], pr)
    for u in order[n_page:]:
        c = cols_u[u]
        y[rows_u[u]] += np.dot(vals2d[u].astype(np.float64),
                               x[np.clip(np.arange(c, c + W), 0, n - 1)])
    ref = np.zeros(n)
    for u in range(U):
        c = cols_u[u]
        ref[rows_u[u]] += np.dot(vals2d[u].astype(np.float64),
                                 x[np.clip(np.arange(c, c + W),
                                           0, n - 1)])
    assert np.abs(y - ref).max() / np.abs(ref).max() < 1e-5


def test_run_lane_place_fill_fallback():
    """Lane-skewed unit columns (all heads on one lane slot) defeat the
    rlp packing; the builder must fall back to the dense-tile layout."""
    rng = np.random.default_rng(18)
    n = 1 << 13
    U = 600
    cols_u = rng.integers(0, n // 128 - 1, U) * 128  # all at slot 0
    rows_u = rng.integers(0, n, U)
    vals2d = rng.standard_normal((U, 8)).astype(np.float32)
    meta, _, _, _ = fused.build_fused_run(
        cols_u, rows_u, vals2d, n, n, 8)
    assert meta is None or meta[5] == "run8"


@pytest.mark.parametrize("sbp", [1, 2])
def test_sb_pages_sweep_end_to_end(monkeypatch, sbp):
    """``spx.tpu.sb_pages`` resizes the lane-placed superblock (1-page
    windows make the K1 gather ONE native sublane take); delta lp and
    rlp runs must stay exact at every setting."""
    from sparsex_tpu.config import Config
    from sparsex_tpu.csx import CsxMatrix

    monkeypatch.setattr(pk, "dia_pallas_ok", lambda: True)
    cfg = Config.instance()
    cfg.set("spx.tpu.value_dtype", "float32")
    cfg.set("spx.preproc.xform", "h")
    cfg.set("spx.tpu.sb_pages", str(sbp))
    try:
        rng = np.random.default_rng(13 + sbp)
        n = 1 << 14
        nu = 3000
        hr = rng.integers(0, n, nu)
        # evenly spaced arc heads (lanes at multiples of W=8 tile rows
        # perfectly) pack near-100% at every window size; random heads
        # are the adversarial case covered by the default-sbp tests
        hc = (np.arange(nu, dtype=np.int64) * 8) % (n - 8)
        rows_l = [np.repeat(hr, 8), rng.integers(0, n, 40000)]
        cols_l = [(hc[:, None] + np.arange(8)[None]).ravel(),
                  rng.integers(0, n, 40000)]
        rows = np.concatenate(rows_l)
        cols = np.concatenate(cols_l)
        key = rows.astype(np.int64) * n + cols
        _, u = np.unique(key, return_index=True)
        rows, cols = rows[u], cols[u]
        o = np.lexsort((cols, rows))
        rows, cols = rows[o], cols[o]
        vals = rng.standard_normal(rows.size).astype(np.float32)

        mat = CsxMatrix.from_coo(n, n, rows, cols, vals)
        ex = mat.executors[0]
        with pltpu.force_tpu_interpret_mode():
            assert ex._pages_active()
            extras = {e[0]: e[1:] for e in ex._pages_meta[5:] if e}
            # (q, style) of every fused segment; sparse fallbacks to the
            # dense-tile styles ("sl"/"runW") keep their own q, but any
            # LANE-PLACED segment must carry the configured window size
            qs = []
            if "dfused" in extras:
                fm = extras["dfused"][0]
                qs.append((fm[1], fm[6]))
            qs += [(e[5][1][1], e[5][1][5]) for e in ex._pages_meta[2]
                   if len(e) > 5 and e[5] and e[5][0] == "frun"]
            lane_placed = [q for q, st in qs
                           if st == "lp" or st.startswith("rlp")]
            assert lane_placed, f"no lane-placed segment built: {qs}"
            assert all(q == sbp for q in lane_placed), (qs, sbp)
            x = rng.standard_normal(n).astype(np.float32)
            y = np.asarray(ex(jnp.asarray(x)))
        ref = np.zeros(n, np.float64)
        np.add.at(ref, rows, vals.astype(np.float64) *
                  x.astype(np.float64)[cols])
        assert np.abs(y - ref).max() / np.abs(ref).max() < 1e-5
    finally:
        cfg.set("spx.tpu.sb_pages", "4")


def test_diag_class_demotes_to_fused_delta(monkeypatch):
    """Vert/diag/anti-diag tables demote wholesale into the fused delta
    pipeline (one delta element per unit element) when the combined
    stream clears the fused gate: run_meta carries ("cvt",) and the
    result matches the oracle."""
    from sparsex_tpu.config import Config
    from sparsex_tpu.csx import CsxMatrix
    from sparsex_tpu.preprocess.encodings import EncType
    from sparsex_tpu.preprocess.xform import run_step

    monkeypatch.setattr(pk, "dia_pallas_ok", lambda: True)
    cfg = Config.instance()
    cfg.set("spx.tpu.value_dtype", "float32")
    cfg.set("spx.preproc.xform", "v,d,ad")

    rng = np.random.default_rng(21)
    n = 1 << 14
    j16 = np.arange(16)
    rows_l, cols_l = [], []
    nd = 400
    dr = rng.integers(0, n - 16, nd); dc = rng.integers(0, n - 16, nd)
    rows_l.append((dr[:, None] + j16[None]).ravel())
    cols_l.append((dc[:, None] + j16[None]).ravel())
    ar = rng.integers(0, n - 16, nd); ac = rng.integers(16, n, nd)
    rows_l.append((ar[:, None] + j16[None]).ravel())
    cols_l.append((ac[:, None] - j16[None]).ravel())
    vr = rng.integers(0, n - 8, nd); vc = rng.integers(0, n, nd)
    rows_l.append((vr[:, None] + np.arange(8)[None]).ravel())
    cols_l.append(np.repeat(vc, 8))
    rows_l.append(rng.integers(0, n, 8000))
    cols_l.append(rng.integers(0, n, 8000))
    rows = np.concatenate(rows_l); cols = np.concatenate(cols_l)
    key = rows.astype(np.int64) * n + cols
    _, u = np.unique(key, return_index=True)
    rows, cols = rows[u], cols[u]
    o = np.lexsort((cols, rows)); rows, cols = rows[o], cols[o]
    vals = rng.standard_normal(rows.size).astype(np.float32)

    mat = CsxMatrix.from_coo(n, n, rows, cols, vals)
    ex = mat.executors[0]
    with pltpu.force_tpu_interpret_mode():
        assert ex._pages_active()
        rmeta = ex._pages_meta[2]
        sr_tables = [e for e in rmeta
                     if run_step(EncType(e[0]))[0] != 0]
        assert sr_tables, "no vert/diag tables mined"
        assert all(len(e) > 5 and e[5] and e[5][0] == "cvt"
                   for e in sr_tables), rmeta
        x = rng.standard_normal(n).astype(np.float32)
        y = np.asarray(ex(jnp.asarray(x)))
    ref = np.zeros(n, np.float64)
    np.add.at(ref, rows, vals.astype(np.float64) *
              x.astype(np.float64)[cols])
    assert np.abs(y - ref).max() / np.abs(ref).max() < 1e-5


def test_fused_delta_demotes_tiny_folds():
    """A single hot dest page (a few hundred overflow edges) must NOT
    keep extra route instances in build_fused_delta's plan: the overflow
    folds ride the residual scatter (route.demote_small_instances), and
    the combined pipeline still matches the oracle."""
    rng = np.random.default_rng(21)
    n = 1 << 14
    # ~500 extra elements into dest page 3 (rows 384..511): ~4 folds,
    # each far under the demotion threshold
    hotr = rng.integers(384, 512, 520)
    hotc = rng.integers(0, 4096, 520)
    rows = np.concatenate([hotr, rng.integers(512, n, 9000)])
    cols = np.concatenate([hotc, rng.integers(0, n, 9000)])
    key = rows.astype(np.int64) * n + cols
    _, u = np.unique(key, return_index=True)
    rows, cols = rows[u], cols[u]
    o = np.lexsort((cols, rows))
    rows, cols = rows[o], cols[o]
    vals = rng.standard_normal(rows.size).astype(np.float32)
    meta, arrays = fused.build_fused_delta(cols.astype(np.int64),
                                           rows.astype(np.int64), vals,
                                           n, n, max_k=128)
    assert meta is not None
    assert len(meta[3]) == 1, "tiny overflow folds must be demoted"
    assert meta[4] >= 300, "demoted edges ride the residual"
    x = rng.standard_normal(n).astype(np.float32)
    acc = _run(meta, arrays, [], [], x, n, n)
    want = _oracle(n, n, rows, cols, vals, [], [], x)
    assert np.abs(acc - want).max() / np.abs(want).max() < 1e-5


def test_fused_hybrid_tail_part():
    """Lane-clumped streams (vertical-run demotions stack 8 elements in
    one lane class) overflow the mean-capped lp round; the overflow gets
    the big-superblock TAIL part (meta[7]) and both K1 outputs
    re-interleave fold-major — r5's fill fix for diagc/headline
    (PROFILE_r05: the old one-shot cap fell to sl q=8 + 16k serialized
    leftovers on diagc)."""
    rng = np.random.default_rng(11)
    n = 1 << 15
    # vertical-run style clumps: 8 consecutive rows share one column
    nu = 1500
    vr = rng.integers(0, n - 8, nu)
    vc = rng.integers(0, n, nu)
    rows = np.concatenate([(vr[:, None] + np.arange(8)[None]).ravel(),
                           rng.integers(0, n, 6000)])
    cols = np.concatenate([np.repeat(vc, 8),
                           rng.integers(0, n, 6000)])
    key = rows.astype(np.int64) * n + cols
    _, u = np.unique(key, return_index=True)
    rows, cols = rows[u], cols[u]
    vals = rng.standard_normal(rows.size).astype(np.float32)
    meta, arrays = fused.build_fused_delta(cols.astype(np.int64),
                                           rows.astype(np.int64), vals,
                                           n, n)
    assert meta is not None and meta[6] == "lp"
    assert len(meta) > 7, "expected the hybrid tail part"
    (T2, q2, _np2, st2), inter = meta[7]
    assert st2 == "lp" and q2 == fused.TAIL_SBP
    assert meta[5] == 0, "hybrid leaves no serialized leftovers"
    x = rng.standard_normal(n).astype(np.float32)
    acc = _run(meta, arrays, [], [], x, n, n)
    want = _oracle(n, n, rows, cols, vals, [], [], x)
    assert np.abs(acc - want).max() / np.abs(want).max() < 1e-5
