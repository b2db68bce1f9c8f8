"""Pallas DIA kernel correctness (interpret mode on CPU).

The fused multi-diagonal kernel (``ops/pallas_kernels.py``) is the hot-path
TPU kernel (measured at HBM speed-of-light on v5e); these tests run it in
the Pallas TPU interpreter so CPU CI covers the kernel logic, including the
offset->block-group decomposition and edge padding.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp
from jax.experimental.pallas import tpu as pltpu

import sparsex_tpu.ops.pallas_kernels as pk


@pytest.fixture(autouse=True)
def small_tile(monkeypatch):
    """Shrink the row tile so tests stay fast and exercise multi-tile
    grids + block-group decomposition."""
    monkeypatch.setattr(pk, "TILE", 256)
    pk._build_dia_kernel.cache_clear()
    yield
    pk._build_dia_kernel.cache_clear()


def _oracle(offsets, dvn, xn, nrows, ncols):
    want = np.zeros(nrows, dvn.dtype)
    for k, o in enumerate(offsets):
        r = np.arange(max(0, -o), min(nrows, ncols - o))
        want[r] += dvn[k, r] * xn[r + o]
    return want


@pytest.mark.parametrize("offsets", [
    [0],
    [0, 1, -1, 8, -13],
    [-700, -3, 0, 5, 300, 900],     # offsets spanning several tile blocks
])
@pytest.mark.parametrize("nrows,ncols", [(1000, 1000), (700, 1100)])
def test_dia_pallas_interpret(offsets, nrows, ncols):
    rng = np.random.default_rng(0)
    D = len(offsets)
    dvn = rng.standard_normal((D, nrows)).astype(np.float32)
    for k, o in enumerate(offsets):
        r = np.arange(nrows)
        dvn[k, (r + o < 0) | (r + o >= ncols)] = 0
    xn = rng.standard_normal(ncols).astype(np.float32)

    with pltpu.force_tpu_interpret_mode():
        y = pk.dia_spmv_pallas(offsets, jnp.asarray(dvn), jnp.asarray(xn),
                               nrows, ncols)
    np.testing.assert_allclose(np.asarray(y),
                               _oracle(offsets, dvn, xn, nrows, ncols),
                               rtol=1e-5, atol=1e-5)


def test_delta_pages_layout_and_kernel_interpret(monkeypatch):
    """Page-bucketed delta: build-time layout + kernel vs oracle."""
    monkeypatch.setattr(pk, "DELTA_TILE", 1024)
    rng = np.random.default_rng(0)
    nrows, ncols = 5000, 4096
    m = 40000
    rows = rng.integers(0, nrows, m).astype(np.int64)
    cols = rng.integers(0, ncols, m).astype(np.int64)
    o = np.lexsort((cols, rows))
    rows, cols = rows[o], cols[o]
    vals = rng.standard_normal(m).astype(np.float32)
    rep, leftover = pk.build_delta_pages(cols, rows, vals, ncols, nrows)
    assert rep is not None
    q, npages = rep.pop("q"), rep.pop("npages")
    T = rep["plo"].size
    x = rng.standard_normal(ncols).astype(np.float32)
    acc = jnp.zeros(nrows, jnp.float32)
    with pltpu.force_tpu_interpret_mode():
        acc = pk.delta_pages_spmv((T, q, npages), rep, jnp.asarray(x),
                                  nrows, ncols, acc)
    want = np.zeros(nrows, np.float64)
    covered = np.ones(m, dtype=bool)
    if leftover is not None and leftover.size:
        covered[leftover] = False
    np.add.at(want, rows[covered], vals[covered].astype(np.float64)
              * x[cols[covered]].astype(np.float64))
    np.testing.assert_allclose(np.asarray(acc), want, rtol=1e-4, atol=1e-4)


def test_delta_pages_spill_tiles():
    """Tiles spanning more than MAX_Q pages spill to the XLA path."""
    rng = np.random.default_rng(1)
    ncols, nrows = 1 << 20, 1000
    m = 1 << 14
    # ultra-sparse columns: every tile spans far more than MAX_Q pages
    cols = np.sort(rng.choice(ncols, m, replace=False)).astype(np.int64)
    rows = rng.integers(0, nrows, m).astype(np.int64)
    vals = rng.standard_normal(m).astype(np.float32)
    rep, leftover = pk.build_delta_pages(cols, rows, vals, ncols, nrows)
    # either inapplicable (most elements spill) or spills recorded
    assert rep is None or leftover.size > 0


def test_unit_pages_plan_and_gather_interpret():
    """Unit-page gather plan (horizontal/block x side) vs plain gather."""
    rng = np.random.default_rng(0)
    ncols = 8192
    U, W = 600, 16
    cols = rng.integers(0, ncols - W, U).astype(np.int64)
    gidx = cols[:, None] + np.arange(W, dtype=np.int64)[None, :]
    flat = gidx.reshape(-1)
    order, n_pageable, plan = pk.build_unit_pages(flat, W, ncols)
    assert plan is not None and n_pageable > 0
    x = rng.standard_normal(ncols).astype(np.float32)
    with pltpu.force_tpu_interpret_mode():
        xg = pk.paged_gather((plan["T"], plan["q"], plan["g"],
                              plan["npages"]),
                             {k: jnp.asarray(plan[k])
                              for k in ("plo", "sl")},
                             jnp.asarray(x), ncols, W)
    want = x[gidx[order[: n_pageable]]]
    np.testing.assert_array_equal(np.asarray(xg), want)


def test_unit_pages_executor_interpret(monkeypatch):
    """Executor end-to-end with unit-page plans active (interpret mode)."""
    import sparsex_tpu.ops.exec as exec_mod
    from sparsex_tpu.config import Config
    from sparsex_tpu.csx import CsxMatrix
    from sparsex_tpu.ops.oracle import max_rel_error

    monkeypatch.setattr(pk, "dia_pallas_ok", lambda: True)
    monkeypatch.setattr(exec_mod, "_resolve_use_pallas",
                        lambda tables=None, routed=False: False)  # dia stays XLA
    cfg = Config.instance()
    cfg.set("spx.tpu.value_dtype", "float32")
    cfg.set("spx.preproc.xform", "h")
    cfg.set("spx.preproc.sampling", "none")
    n = 4096
    rng = np.random.default_rng(1)
    hr = rng.integers(0, n, 600)
    hc = rng.integers(0, n - 40, 600)
    rows = np.repeat(hr, 20)
    cols = (hc[:, None] + np.arange(20)[None, :]).ravel()
    _, u = np.unique(rows * n + cols, return_index=True)
    rows, cols = rows[u], cols[u]
    o = np.lexsort((cols, rows))
    rows, cols = rows[o], cols[o]
    vals = rng.standard_normal(rows.size)
    mat = CsxMatrix.from_coo(n, n, rows, cols, vals)
    assert mat.shards[0].runs
    ex = mat.executors[0]
    x = rng.standard_normal(n)
    with pltpu.force_tpu_interpret_mode():
        y = np.asarray(ex(jnp.asarray(x)))
    assert ex._pages_meta is not None
    assert any(len(e) > 3 and e[3] for e in ex._pages_meta[2])
    dense = np.zeros((n, n))
    dense[rows, cols] = vals
    want = dense @ x
    assert np.max(np.abs(y - want)) / np.max(np.abs(want)) < 1e-5


def test_symmetric_paged_delta_interpret(monkeypatch):
    """Symmetric direct+transposed paged delta vs the mirrored oracle, and
    use_pallas=off immediately switches back to the plain variant."""
    import sparsex_tpu.ops.pallas_kernels as pk_mod
    from sparsex_tpu.config import Config
    from sparsex_tpu.ops.oracle import max_rel_error
    from sparsex_tpu.symmetric import build_symmetric_csx

    monkeypatch.setattr(pk_mod, "MIN_PAGE_NNZ", 64)
    monkeypatch.setattr(pk_mod, "dia_pallas_ok", lambda: True)
    cfg = Config.instance()
    cfg.set("spx.tpu.value_dtype", "float32")
    cfg.set("spx.preproc.xform", "none")
    # this test covers the LEGACY per-shard paged path; sym_full=auto
    # would route to the mirrored full-expansion executor instead
    cfg.set("spx.tpu.sym_full", "off")
    n = 2048
    rng = np.random.default_rng(0)
    r = rng.integers(0, n, 3000)
    c = rng.integers(0, n, 3000)
    keep = r > c
    rows = np.concatenate([r[keep], np.arange(n)])
    cols = np.concatenate([c[keep], np.arange(n)])
    _, u = np.unique(rows * n + cols, return_index=True)
    rows, cols = rows[u], cols[u]
    o = np.lexsort((cols, rows))
    rows, cols = rows[o], cols[o]
    vals = rng.standard_normal(rows.size)
    mat = build_symmetric_csx(n, n, rows, cols, vals, already_lower=True)
    x = rng.standard_normal(n)
    with pltpu.force_tpu_interpret_mode():
        y = np.asarray(mat.matvec(x))
    assert any(len(m) > 5 for m, _ in mat._sym_paged), "pages not built"
    off = rows != cols
    fr = np.concatenate([rows, cols[off]])
    fc = np.concatenate([cols, rows[off]])
    fv = np.concatenate([vals, vals[off]])
    dense = np.zeros((n, n))
    dense[fr, fc] = fv
    want = dense @ x
    assert np.max(np.abs(y - want)) / np.max(np.abs(want)) < 1e-5
    # per-call gating: off must route through the plain variant immediately
    cfg.set("spx.tpu.use_pallas", "off")
    y2 = np.asarray(mat.matvec(x))
    assert np.max(np.abs(y2 - want)) / np.max(np.abs(want)) < 1e-5


def test_sharded_delta_pages_interpret(monkeypatch):
    """SPMD paged delta: union (T, q) across shards, dummy tiles, leftover
    stacking — vs dense oracle on a 4-device mesh (interpret mode)."""
    import sparsex_tpu.ops.pallas_kernels as pk_mod
    from jax.sharding import Mesh
    from sparsex_tpu.config import Config
    from sparsex_tpu.csx import CsxMatrix
    from sparsex_tpu.ops.oracle import max_rel_error
    from sparsex_tpu.parallel.shard import ShardedCsx

    monkeypatch.setattr(pk_mod, "MIN_PAGE_NNZ", 64)
    monkeypatch.setattr(pk_mod, "dia_pallas_ok", lambda: True)
    cfg = Config.instance()
    cfg.set("spx.tpu.value_dtype", "float32")
    cfg.set("spx.preproc.xform", "none")
    cfg.set("spx.rt.nr_threads", "4")
    cfg.set("spx.tpu.x_mode", "replicated")
    n = 4096
    rng = np.random.default_rng(3)
    rows = rng.integers(0, n, 6000)
    cols = rng.integers(0, n, 6000)
    _, u = np.unique(rows * n + cols, return_index=True)
    rows, cols = rows[u], cols[u]
    o = np.lexsort((cols, rows))
    rows, cols = rows[o], cols[o]
    vals = rng.standard_normal(rows.size)
    mat = CsxMatrix.from_coo(n, n, rows, cols, vals)
    sh = ShardedCsx(mat, mesh=Mesh(np.array(jax.devices()[:4]), ("shards",)))
    assert sh.meta.get("dpages"), "sharded pages not built"
    x = rng.standard_normal(n)
    with pltpu.force_tpu_interpret_mode():
        y = np.asarray(sh.matvec(x))
    dense = np.zeros((n, n))
    dense[rows, cols] = vals
    want = dense @ x
    assert np.max(np.abs(y - want)) / np.max(np.abs(want)) < 1e-5


def test_full_executor_with_pallas_interpret():
    """End-to-end: executor with spx.tpu.use_pallas=on under the
    interpreter matches the oracle."""
    from sparsex_tpu.config import Config
    from sparsex_tpu.csx import CsxMatrix
    from sparsex_tpu.ops.exec import _compiled
    from sparsex_tpu.ops.oracle import max_rel_error

    cfg = Config.instance()
    cfg.set("spx.preproc.xform", "all")
    cfg.set("spx.preproc.sampling", "none")
    cfg.set("spx.tpu.use_pallas", "on")
    _compiled.cache_clear()

    n = 600
    rows, cols = [], []
    for b in (0, 2, -5):
        r = np.arange(max(0, -b), min(n, n - b), dtype=np.int64)
        rows.append(r)
        cols.append(r + b)
    rows = np.concatenate(rows)
    cols = np.concatenate(cols)
    o = np.lexsort((cols, rows))
    rows, cols = rows[o], cols[o]
    vals = np.random.default_rng(1).standard_normal(rows.size)
    mat = CsxMatrix.from_coo(n, n, rows, cols, vals)
    assert mat.shards[0].dias
    x = np.random.default_rng(2).standard_normal(n)
    dense = np.zeros((n, n))
    dense[rows, cols] = vals
    with pltpu.force_tpu_interpret_mode():
        y = np.asarray(mat.matvec(x))
    _compiled.cache_clear()
    assert max_rel_error(y, dense @ x) < 1e-6


def test_sharded_unit_pages_interpret(monkeypatch):
    """SPMD unit-page plans (block tables) across shards vs dense oracle."""
    import sparsex_tpu.ops.pallas_kernels as pk_mod
    from jax.sharding import Mesh
    from sparsex_tpu.config import Config
    from sparsex_tpu.csx import CsxMatrix
    from sparsex_tpu.ops.oracle import max_rel_error
    from sparsex_tpu.parallel.shard import ShardedCsx

    monkeypatch.setattr(pk_mod, "dia_pallas_ok", lambda: True)
    orig = pk_mod.build_unit_pages
    monkeypatch.setattr(pk_mod, "build_unit_pages",
                        lambda *a, **k: orig(*a, min_elems=64, **k)
                        if "min_elems" not in k else orig(*a, **k))
    cfg = Config.instance()
    cfg.set("spx.tpu.value_dtype", "float32")
    cfg.set("spx.preproc.xform", "br4")
    cfg.set("spx.preproc.sampling", "none")
    cfg.set("spx.rt.nr_threads", "2")
    cfg.set("spx.tpu.x_mode", "replicated")
    n = 2048
    rng = np.random.default_rng(5)
    # aligned 4x4 blocks
    coords = {(int(a), int(b)) for a, b in
              zip(rng.integers(0, n // 4, 300), rng.integers(0, n // 4, 300))}
    rows, cols = [], []
    rr, cc = np.meshgrid(np.arange(4), np.arange(4), indexing="ij")
    for (bi, bj) in sorted(coords):
        rows.append((bi * 4 + rr).ravel())
        cols.append((bj * 4 + cc).ravel())
    rows = np.concatenate(rows).astype(np.int64)
    cols = np.concatenate(cols).astype(np.int64)
    o = np.lexsort((cols, rows))
    rows, cols = rows[o], cols[o]
    vals = rng.standard_normal(rows.size)
    mat = CsxMatrix.from_coo(n, n, rows, cols, vals)
    assert all(t.blocks for t in mat.shards)
    sh = ShardedCsx(mat, mesh=Mesh(np.array(jax.devices()[:2]), ("shards",)))
    upgraded = any(len(k) > 3 for k in sh.meta["block_keys"])
    assert upgraded, sh.meta["block_keys"]
    x = rng.standard_normal(n)
    with pltpu.force_tpu_interpret_mode():
        y = np.asarray(sh.matvec(x))
    dense = np.zeros((n, n))
    dense[rows, cols] = vals
    want = dense @ x
    assert np.max(np.abs(y - want)) / np.max(np.abs(want)) < 1e-5
