"""Static scatter-routing network tests (ops/route.py).

The route replaces the serialized XLA y-scatter of the delta path
(reference role: the per-row sequential ctl walk of
``src/templates/delta_tmpl.c:21-38``).  Oracle: numpy bincount scatter-add.
"""

import numpy as np
import pytest

from sparsex_tpu import native
from sparsex_tpu.ops import route


def _oracle(dest, src, n_dest):
    valid = (dest >= 0) & (dest < n_dest)
    return np.bincount(dest[valid], weights=src[valid],
                       minlength=n_dest).astype(src.dtype)


def _run_np(dest, src, n_dest, **kw):
    plan = route.build_scatter_plan(dest, n_dest, **kw)
    assert plan is not None
    metas, arrays, res_pos, res_dest = plan
    # padding/residual lanes are never read: poison them to prove it
    poisoned = src.copy()
    valid = (dest >= 0) & (dest < n_dest)
    poisoned[~valid] = 1e30
    y = route.apply_scatter_plan_np(metas, arrays, poisoned, n_dest)
    np.add.at(y, res_dest, src[res_pos])
    return y, plan


# ---------------------------------------------------------------------------
# edge coloring
# ---------------------------------------------------------------------------
def _check_coloring(src, dst, w, color):
    assert color.min() >= 0 and color.max() < w
    assert np.unique(np.stack([src, color]), axis=1).shape[1] == src.size
    assert np.unique(np.stack([dst, color]), axis=1).shape[1] == src.size


@pytest.mark.parametrize("m,ns,nd,w,seed", [
    (200, 5, 9, 32, 0), (5000, 64, 48, 128, 1), (64, 1, 64, 64, 2)])
def test_color_bipartite(m, ns, nd, w, seed):
    rng = np.random.default_rng(seed)
    src = rng.integers(0, ns, m)
    dst = rng.integers(0, nd, m)
    keep = np.ones(m, bool)
    for arr in (src, dst):
        order = np.argsort(arr, kind="stable")
        s = arr[order]
        rank = np.arange(m) - np.searchsorted(s, s)
        keep[order[rank >= w]] = False
    src, dst = src[keep], dst[keep]
    color = native.color_bipartite(src, dst, ns, nd, w)
    assert color is not None
    _check_coloring(src, dst, w, color)
    # python fallback agrees on validity
    c2 = native._color_bipartite_py(src, dst, ns, nd, w)
    _check_coloring(src, dst, w, c2)


def test_color_bipartite_degree_overflow():
    src = np.zeros(65, np.int64)
    dst = np.arange(65, dtype=np.int64)
    assert native.color_bipartite(src, dst, 1, 65, 64) is None


# ---------------------------------------------------------------------------
# planner + numpy pipeline vs oracle
# ---------------------------------------------------------------------------
@pytest.mark.parametrize("M,n_dest,invalid_frac,seed", [
    (128 * 64, 5_000, 0.05, 0),
    (128 * 64, 5_000, 0.5, 1),       # half padding
    (128 * 300, 150_000, 0.0, 2),    # sparse destinations
    (128 * 40, 700, 0.1, 3),         # dense: multiple folds + K layers
])
def test_route_np_oracle(M, n_dest, invalid_frac, seed):
    rng = np.random.default_rng(seed)
    dest = rng.integers(0, n_dest, M)
    inv = rng.random(M) < invalid_frac
    dest[inv] = -1
    src = rng.standard_normal(M).astype(np.float32)
    src[inv] = 0.0
    y, plan = _run_np(dest, src, n_dest, min_elems=64)
    ref = _oracle(dest, src, n_dest)
    err = np.abs(y - ref).max() / (np.abs(ref).max() + 1e-30)
    assert err < 1e-6


def test_route_empty_rows_and_clustered_dest():
    # all elements land in a narrow dest band; the rest of y stays zero
    rng = np.random.default_rng(4)
    M, n_dest = 128 * 16, 100_000
    dest = rng.integers(1000, 1000 + 4096, M)
    src = rng.standard_normal(M).astype(np.float32)
    y, plan = _run_np(dest, src, n_dest, min_elems=64)
    ref = _oracle(dest, src, n_dest)
    assert np.abs(y - ref).max() / np.abs(ref).max() < 1e-6
    assert np.all(y[:1000] == 0) and np.all(y[1000 + 4096:] == 0)


def test_route_refuses_tiny_and_giant():
    dest = np.arange(128, dtype=np.int64)
    assert route.build_scatter_plan(dest, 1000) is None  # < min_elems
    # n_dest beyond the network capacity
    dest = np.arange(128 * 512, dtype=np.int64)
    assert route.build_scatter_plan(
        dest, route.MAX_DEST_ROWS * 128 + 1, min_elems=64) is None


def test_route_extreme_skew_falls_back():
    # everything on a handful of slots: beyond fold capacity -> None
    dest = np.zeros(128 * 512, dtype=np.int64)
    assert route.build_scatter_plan(dest, 10_000, min_elems=64) is None


# ---------------------------------------------------------------------------
# Pallas lane-gather kernel (interpret mode; the TPU path is identical)
# ---------------------------------------------------------------------------
def test_route_apply_interpret():
    import jax.numpy as jnp
    from jax.experimental.pallas import tpu as pltpu

    rng = np.random.default_rng(5)
    M, n_dest = 128 * 24, 2_000
    dest = rng.integers(0, n_dest, M)
    inv = rng.random(M) < 0.1
    dest[inv] = n_dest
    src = rng.standard_normal(M).astype(np.float32)
    src[inv] = 1e30  # must never be read
    plan = route.build_scatter_plan(dest, n_dest, min_elems=64)
    assert plan is not None
    metas, arrays, res_pos, res_dest = plan
    with pltpu.force_tpu_interpret_mode():
        y = np.asarray(route.apply_scatter_plan(
            metas, arrays, jnp.asarray(src), n_dest))
    np.add.at(y, res_dest, src[res_pos])
    ref = _oracle(dest, src, n_dest)
    assert np.abs(y - ref).max() / np.abs(ref).max() < 1e-5


def test_executor_unit_table_route_interpret(monkeypatch):
    """Run/block unit-table y-scatters also ride the routing network."""
    import jax.numpy as jnp
    from jax.experimental.pallas import tpu as pltpu

    import sparsex_tpu.ops.pallas_kernels as pk
    from sparsex_tpu.config import Config
    from sparsex_tpu.csx import CsxMatrix
    from sparsex_tpu.ops import route as route_mod

    monkeypatch.setattr(pk, "MIN_PAGE_NNZ", 64)
    monkeypatch.setattr(pk, "dia_pallas_ok", lambda: True)
    monkeypatch.setattr(route_mod, "MIN_ELEMS", 256)
    cfg = Config.reset()
    cfg.set("spx.tpu.value_dtype", "float32")
    cfg.set("spx.preproc.xform", "h,v,br4")

    rng = np.random.default_rng(7)
    n = 4096
    rows_l, cols_l = [], []
    # horizontal runs of 8
    hr = rng.integers(0, n, 600)
    hc = rng.integers(0, n - 8, 600)
    rows_l.append(np.repeat(hr, 8))
    cols_l.append((hc[:, None] + np.arange(8)[None]).ravel())
    # vertical runs of 6 (strided y-scatter)
    vr = rng.integers(0, n - 6, 300)
    vc = rng.integers(0, n, 300)
    rows_l.append((vr[:, None] + np.arange(6)[None]).ravel())
    cols_l.append(np.repeat(vc, 6))
    # 4x2 blocks
    br0 = rng.integers(0, (n - 4) // 4, 300) * 4
    bc0 = rng.integers(0, (n - 2) // 2, 300) * 2
    ii, jj = np.meshgrid(np.arange(4), np.arange(2), indexing="ij")
    rows_l.append((br0[:, None, None] + ii[None]).ravel())
    cols_l.append((bc0[:, None, None] + jj[None]).ravel())
    rows = np.concatenate(rows_l)
    cols = np.concatenate(cols_l)
    key = rows * n + cols
    _, uniq = np.unique(key, return_index=True)
    rows, cols = rows[uniq], cols[uniq]
    order = np.lexsort((cols, rows))
    rows, cols = rows[order], cols[order]
    vals = rng.standard_normal(rows.size).astype(np.float32)

    mat = CsxMatrix.from_coo(n, n, rows, cols, vals)
    ex = mat.executors[0]
    with pltpu.force_tpu_interpret_mode():
        assert ex._pages_active()
        run_scats = [e[4] for e in ex._pages_meta[2] if len(e) > 4]
        blk_scats = [e[4] for e in ex._pages_meta[3] if len(e) > 4]
        assert any(s is not None for s in run_scats + blk_scats), \
            "no unit-table scatter plan was built"
        x = rng.standard_normal(n).astype(np.float32)
        y = np.asarray(ex(jnp.asarray(x)))
    ref = np.zeros(n, np.float32)
    np.add.at(ref, rows, vals * x[cols])
    assert np.abs(y - ref).max() / np.abs(ref).max() < 1e-5


def test_executor_route_interpret(monkeypatch):
    """End-to-end: executor picks the routed delta path (pages + route)."""
    import jax.numpy as jnp
    from jax.experimental.pallas import tpu as pltpu

    import sparsex_tpu.ops.exec as exec_mod
    import sparsex_tpu.ops.pallas_kernels as pk
    from sparsex_tpu.config import Config
    from sparsex_tpu.csx import CsxMatrix
    from sparsex_tpu.ops import route as route_mod

    monkeypatch.setattr(pk, "MIN_PAGE_NNZ", 64)
    monkeypatch.setattr(pk, "dia_pallas_ok", lambda: True)
    monkeypatch.setattr(route_mod, "MIN_ELEMS", 64)
    cfg = Config.reset()
    cfg.set("spx.tpu.value_dtype", "float32")
    cfg.set("spx.preproc.xform", "none")  # keep everything on the delta path

    rng = np.random.default_rng(6)
    n, m = 4096, 6000
    rows = rng.integers(0, n, m)
    cols = rng.integers(0, n, m)
    key = rows * n + cols
    _, uniq = np.unique(key, return_index=True)
    rows, cols = rows[uniq], cols[uniq]
    order = np.lexsort((cols, rows))
    rows, cols = rows[order], cols[order]
    vals = rng.standard_normal(rows.size).astype(np.float32)

    mat = CsxMatrix.from_coo(n, n, rows, cols, vals)
    ex = mat.executors[0]
    with pltpu.force_tpu_interpret_mode():
        assert ex._pages_active()
        assert any(e and e[0] == "dscatter" for e in ex._pages_meta[5:]), \
            "route plan not built"
        x = rng.standard_normal(n).astype(np.float32)
        y = np.asarray(ex(jnp.asarray(x)))
    ref = np.zeros(n, np.float32)
    np.add.at(ref, rows, vals * x[cols])
    assert np.abs(y - ref).max() / np.abs(ref).max() < 1e-5


def test_bf16_compute_in_f32_interpret(monkeypatch):
    """bf16 matrices ride the paged/routed layouts as f32 copies with x
    upcast at dispatch (measured ~30x over the serialized XLA bf16 path;
    a native bf16 Mosaic variant needs (16,128) tiles — future work)."""
    import jax.numpy as jnp
    from jax.experimental.pallas import tpu as pltpu

    import sparsex_tpu.ops.pallas_kernels as pk
    from sparsex_tpu.config import Config
    from sparsex_tpu.csx import CsxMatrix
    from sparsex_tpu.ops import route as route_mod

    monkeypatch.setattr(pk, "MIN_PAGE_NNZ", 64)
    monkeypatch.setattr(pk, "dia_pallas_ok", lambda: True)
    monkeypatch.setattr(route_mod, "MIN_ELEMS", 128)
    cfg = Config.reset()
    cfg.set("spx.tpu.value_dtype", "bfloat16")
    cfg.set("spx.preproc.xform", "all")

    rng = np.random.default_rng(8)
    n = 4096
    rows = np.concatenate([np.arange(n), rng.integers(0, n, 5000)])
    cols = np.concatenate([np.arange(n), rng.integers(0, n, 5000)])
    _, u = np.unique(rows * n + cols, return_index=True)
    rows, cols = rows[u], cols[u]
    o = np.lexsort((cols, rows))
    rows, cols = rows[o], cols[o]
    vals = rng.standard_normal(rows.size).astype(np.float32)
    mat = CsxMatrix.from_coo(n, n, rows, cols, vals)
    ex = mat.executors[0]
    x = rng.standard_normal(n).astype(np.float32)
    with pltpu.force_tpu_interpret_mode():
        assert ex._pages_active(), "bf16 pages not built"
        y = np.asarray(ex(jnp.asarray(x, dtype=jnp.bfloat16))
                       .astype(jnp.float32))
    vb = np.asarray(jnp.asarray(vals, jnp.bfloat16).astype(jnp.float32))
    xb = np.asarray(jnp.asarray(x, jnp.bfloat16).astype(jnp.float32))
    ref = np.zeros(n, np.float32)
    np.add.at(ref, rows, vb * xb[cols])
    assert np.abs(y - ref).max() / np.abs(ref).max() < 2e-2


def test_layout_persistence_roundtrip(monkeypatch, tmp_path):
    """Archived page/route layouts restore intact: no replanning, same
    numerics (CsxSaveRestore caching purpose, fully amortized)."""
    import time

    import jax.numpy as jnp
    from jax.experimental.pallas import tpu as pltpu

    import sparsex_tpu.ops.pallas_kernels as pk
    from sparsex_tpu.config import Config
    from sparsex_tpu.csx import CsxMatrix
    from sparsex_tpu.ops import route as route_mod
    from sparsex_tpu.persist import restore_csx, save_csx

    monkeypatch.setattr(pk, "MIN_PAGE_NNZ", 64)
    monkeypatch.setattr(pk, "dia_pallas_ok", lambda: True)
    monkeypatch.setattr(route_mod, "MIN_ELEMS", 128)
    cfg = Config.reset()
    cfg.set("spx.tpu.value_dtype", "float32")
    cfg.set("spx.preproc.xform", "all")

    rng = np.random.default_rng(9)
    n = 4096
    rows = np.concatenate([np.arange(n), rng.integers(0, n, 5000)])
    cols = np.concatenate([np.arange(n), rng.integers(0, n, 5000)])
    _, u = np.unique(rows * n + cols, return_index=True)
    rows, cols = rows[u], cols[u]
    o = np.lexsort((cols, rows))
    rows, cols = rows[o], cols[o]
    vals = rng.standard_normal(rows.size).astype(np.float32)
    mat = CsxMatrix.from_coo(n, n, rows, cols, vals)
    path = str(tmp_path / "cached.npz")
    save_csx(mat, path)  # builds + archives the layouts

    mat2, _ = restore_csx(path)
    ex2 = mat2.executors[0]
    assert ex2._pages_tried and ex2._pages_meta is not None
    assert ex2._pages_meta == mat.executors[0]._pages_meta
    # no replanning: build_scatter_plan must NOT be called on restore use
    monkeypatch.setattr(route_mod, "build_scatter_plan",
                        lambda *a, **k: (_ for _ in ()).throw(
                            AssertionError("replanned!")))
    x = rng.standard_normal(n).astype(np.float32)
    with pltpu.force_tpu_interpret_mode():
        y = np.asarray(ex2(jnp.asarray(x)))
    ref = np.zeros(n, np.float32)
    np.add.at(ref, rows, vals * x[cols])
    assert np.abs(y - ref).max() / np.abs(ref).max() < 1e-5


def test_symmetric_routed_interpret(monkeypatch):
    """Symmetric matrices route BOTH y-sides: the lower-triangle rows and
    the transposed z columns."""
    import jax.numpy as jnp
    from jax.experimental.pallas import tpu as pltpu

    import sparsex_tpu.ops.pallas_kernels as pk
    from sparsex_tpu.config import Config
    from sparsex_tpu.ops import route as route_mod
    from sparsex_tpu.symmetric import build_symmetric_csx

    monkeypatch.setattr(pk, "MIN_PAGE_NNZ", 64)
    monkeypatch.setattr(pk, "dia_pallas_ok", lambda: True)
    monkeypatch.setattr(route_mod, "MIN_ELEMS", 128)
    cfg = Config.reset()
    cfg.set("spx.tpu.value_dtype", "float32")
    cfg.set("spx.preproc.xform", "none")

    rng = np.random.default_rng(10)
    n = 4096
    r = rng.integers(0, n, 8000)
    c = rng.integers(0, n, 8000)
    rows, cols = np.maximum(r, c), np.minimum(r, c)
    rows = np.concatenate([rows, np.arange(n)])
    cols = np.concatenate([cols, np.arange(n)])
    _, u = np.unique(rows * n + cols, return_index=True)
    rows, cols = rows[u], cols[u]
    o = np.lexsort((cols, rows))
    rows, cols = rows[o], cols[o]
    vals = rng.standard_normal(rows.size).astype(np.float32)
    mat = build_symmetric_csx(n, n, rows, cols, vals, already_lower=True)
    with pltpu.force_tpu_interpret_mode():
        mat._build_sym_arrays()
        meta = mat._sym_paged[0][0]
        keys = {e[0] for e in meta[5:] if e}
        assert "dscatter" in keys and "dscatterT" in keys, keys
        x = rng.standard_normal(n).astype(np.float32)
        y = np.asarray(mat.matvec(jnp.asarray(x)))
    A = np.zeros((n, n), np.float32)
    A[rows, cols] = vals
    A = A + np.tril(A, -1).T
    ref = A @ x
    assert np.abs(y - ref).max() / np.abs(ref).max() < 1e-4


def test_stacked_plans_heterogeneous_shards(monkeypatch):
    """stack_scatter_plans unifies shards with different fold layers (K)
    and inner color counts (W2) by padding masked wires; shards with no
    pageable delta get all-dummy instances."""
    import jax.numpy as jnp
    from jax.experimental.pallas import tpu as pltpu

    import jax
    from jax.sharding import Mesh

    import sparsex_tpu.ops.pallas_kernels as pk
    from sparsex_tpu.config import Config
    from sparsex_tpu.csx import CsxMatrix
    from sparsex_tpu.ops import route as route_mod
    from sparsex_tpu.parallel.shard import ShardedCsx

    monkeypatch.setattr(pk, "MIN_PAGE_NNZ", 64)
    monkeypatch.setattr(pk, "dia_pallas_ok", lambda: True)
    monkeypatch.setattr(route_mod, "MIN_ELEMS", 64)
    cfg = Config.reset()
    cfg.set("spx.tpu.value_dtype", "float32")
    cfg.set("spx.rt.nr_threads", "4")
    cfg.set("spx.preproc.xform", "none")
    cfg.set("spx.tpu.x_mode", "replicated")

    rng = np.random.default_rng(11)
    n = 8192
    # shard 0 rows: dense duplicates (high multiplicity -> larger K);
    # shard 3 rows: almost nothing (dummy-ish); middle: plain random
    rows_l = [rng.integers(0, 200, 4000),               # heavy head
              rng.integers(n // 4, 3 * n // 4, 6000),   # middle
              rng.integers(3 * n // 4, n, 40)]          # sparse tail
    cols_l = [rng.integers(0, n, 4000), rng.integers(0, n, 6000),
              rng.integers(0, n, 40)]
    rows = np.concatenate(rows_l)
    cols = np.concatenate(cols_l)
    _, u = np.unique(rows * n + cols, return_index=True)
    rows, cols = rows[u], cols[u]
    o = np.lexsort((cols, rows))
    rows, cols = rows[o], cols[o]
    vals = rng.standard_normal(rows.size).astype(np.float32)
    mat = CsxMatrix.from_coo(n, n, rows, cols, vals)
    mesh = Mesh(np.array(jax.devices()[:4]), ("shards",))
    with pltpu.force_tpu_interpret_mode():
        sh = ShardedCsx(mat, mesh=mesh)
        x = rng.standard_normal(n).astype(np.float32)
        y = np.asarray(sh.matvec(jnp.asarray(x)))
    ref = np.zeros(n, np.float32)
    np.add.at(ref, rows, vals * x[cols])
    err = np.abs(y - ref).max() / np.abs(ref).max()
    assert err < 1e-4, err


def test_chunk_ranges_fold_boundaries():
    """Fold-sorted dests produce element-proportional chunks."""
    rng = np.random.default_rng(12)
    n_dest = 2000
    # multiplicity ~3 per slot -> several folds
    dest = np.repeat(rng.integers(0, n_dest, 40_000), 3)[: 128 * 512]
    key = route.fold_sort_key(dest, n_dest, np.zeros_like(dest))
    order = np.argsort(key, kind="stable")
    dsorted = dest[order]
    ranges = route._chunk_ranges(dsorted.astype(np.int64), n_dest,
                                 dsorted.size // 128)
    assert len(ranges) >= 2  # folds split into separate chunks
    # plans on the sorted order still match the oracle
    src = rng.standard_normal(dsorted.size).astype(np.float32)
    plan = route.build_scatter_plan(dsorted, n_dest, min_elems=64)
    if plan is not None:
        metas, arrays, res_pos, res_dest = plan
        y = route.apply_scatter_plan_np(metas, arrays, src, n_dest)
        np.add.at(y, res_dest, src[res_pos])
        ref = _oracle(dsorted, src, n_dest)
        assert np.abs(y - ref).max() / np.abs(ref).max() < 1e-5


def test_tiny_fold_demoted_to_residual():
    """A handful of over-128-per-page edges must NOT keep a second
    network instance (K2's cost is ~flat per instance): after
    demote_small_instances they ride the residual scatter, and the
    combined result still matches the oracle."""
    rng = np.random.default_rng(11)
    M, n_dest = 128 * 512, 500_000   # ~17 edges/page baseline
    dest = rng.integers(0, n_dest, M)
    # overload one dest page with ~600 extra edges -> a real fold-1
    hot = 37 * route.L
    over_idx = rng.choice(M, 600, replace=False)
    dest[over_idx] = hot + rng.integers(0, route.L, 600)
    src = rng.standard_normal(M).astype(np.float32)

    ranges = [(0, M // route.L)]    # one chunk, as the fused planners cut
    plan = route.build_scatter_plan(dest, n_dest, min_elems=64,
                                    ranges=ranges)
    assert plan is not None and len(plan[0]) >= 2  # folds are instances
    plan = route.demote_small_instances(plan, dest)
    metas, arrays, res_pos, res_dest = plan
    assert len(metas) == 1                      # fold-1 demoted
    assert res_pos.size >= 400                  # the overflow edges
    y = route.apply_scatter_plan_np(metas, arrays, src, n_dest)
    np.add.at(y, res_dest, src[res_pos])
    ref = _oracle(dest, src, n_dest)
    assert np.abs(y - ref).max() / np.abs(ref).max() < 1e-6


def test_demote_small_instances_invariants():
    """Keeps at least one instance, caps total demoted volume, and is a
    no-op on single-instance plans."""
    rng = np.random.default_rng(12)
    M, n_dest = 128 * 256, 2_000_000   # very sparse: tiny instances
    dest = rng.integers(0, n_dest, M)
    src = rng.standard_normal(M).astype(np.float32)
    plan = route.build_scatter_plan(dest, n_dest, min_elems=64)
    assert plan is not None
    n_inst = len(plan[0])
    plan2 = route.demote_small_instances(plan, dest,
                                         min_elems=10 ** 9)  # demote all
    assert len(plan2[0]) >= 1                   # never empties the plan
    counts = [int((a["g1"] != -1).sum()) for a in plan[1]]
    demoted = sum(counts) - sum(
        int((a["g1"] != -1).sum()) for a in plan2[1])
    assert demoted <= 4 * 10 ** 9               # cap honored (trivially)
    metas, arrays, res_pos, res_dest = plan2
    y = route.apply_scatter_plan_np(metas, arrays, src, n_dest)
    np.add.at(y, res_dest, src[res_pos])
    ref = _oracle(dest, src, n_dest)
    assert np.abs(y - ref).max() / np.abs(ref).max() < 1e-6
    if n_inst == 1:
        assert plan2[0] == plan[0]
