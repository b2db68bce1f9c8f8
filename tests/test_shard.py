"""Multi-device SPMD tests on the 8-device virtual CPU mesh
(SURVEY §4: the reference's nr_threads=2 pthread tests map to
--xla_force_host_platform_device_count sharding tests)."""

import jax
import numpy as np
import pytest

import sparsex_tpu as spx
from sparsex_tpu.csx import CsxMatrix
from sparsex_tpu.ops.oracle import coo_spmv, max_rel_error
from sparsex_tpu.parallel.shard import ShardedCsx
from sparsex_tpu.symmetric import build_symmetric_csx
from tests import fixtures

TOL = 1e-6
NDEV = len(jax.devices())


def _mesh(n):
    from jax.sharding import Mesh
    return Mesh(np.array(jax.devices()[:n]), ("shards",))


@pytest.mark.parametrize("ndev", [2, 4, 8])
def test_sharded_matvec(ndev):
    if NDEV < ndev:
        pytest.skip("not enough devices")
    spx.option_set("spx.rt.nr_threads", str(ndev))
    spx.option_set("spx.preproc.xform", "all")
    nrows, ncols, rows, cols, vals = fixtures.banded_coo(n=257)
    mat = CsxMatrix.from_coo(nrows, ncols, rows, cols, vals)
    sh = ShardedCsx(mat, mesh=_mesh(ndev))
    rng = np.random.default_rng(0)
    x = rng.standard_normal(ncols)
    y0 = rng.standard_normal(nrows)
    got = np.asarray(sh.matvec(x, alpha=1.2, beta=-0.3, y=y0))
    want = 1.2 * coo_spmv(nrows, rows, cols, vals, x) - 0.3 * y0
    assert max_rel_error(got, want) <= TOL


@pytest.mark.parametrize("ndev", [2, 4])
def test_sharded_symmetric(ndev):
    if NDEV < ndev:
        pytest.skip("not enough devices")
    spx.option_set("spx.rt.nr_threads", str(ndev))
    spx.option_set("spx.preproc.xform", "all")
    nrows, ncols, rows, cols, vals = fixtures.symmetric_coo(n=90, seed=8)
    mat = build_symmetric_csx(nrows, ncols, rows, cols, vals)
    sh = ShardedCsx(mat, mesh=_mesh(ndev))
    x = np.random.default_rng(1).standard_normal(ncols)
    got = np.asarray(sh.matvec(x))
    want = coo_spmv(nrows, rows, cols, vals, x)
    assert max_rel_error(got, want) <= TOL


def test_sharded_matches_loop_executor():
    if NDEV < 4:
        pytest.skip("not enough devices")
    spx.option_set("spx.rt.nr_threads", "4")
    nrows, ncols, rows, cols, vals = fixtures.blocky_coo(n=128)
    mat = CsxMatrix.from_coo(nrows, ncols, rows, cols, vals)
    sh = ShardedCsx(mat, mesh=_mesh(4))
    x = np.random.default_rng(2).standard_normal(ncols)
    np.testing.assert_allclose(np.asarray(sh.matvec(x)),
                               np.asarray(mat.matvec(x)), rtol=1e-12)


def test_shard_count_mismatch_rejected():
    spx.option_set("spx.rt.nr_threads", "2")
    nrows, ncols, rows, cols, vals = fixtures.random_coo(40, 40, seed=3)
    mat = CsxMatrix.from_coo(nrows, ncols, rows, cols, vals)
    if NDEV < 4:
        pytest.skip("not enough devices")
    with pytest.raises(ValueError):
        ShardedCsx(mat, mesh=_mesh(4))


def test_mixed_shards_some_without_dias():
    """Union stacking when only some shards have DIA tables."""
    import jax
    from jax.sharding import Mesh
    from sparsex_tpu.config import Config
    from sparsex_tpu.csx import CsxMatrix
    from sparsex_tpu.ops.oracle import max_rel_error
    from sparsex_tpu.parallel.shard import ShardedCsx

    cfg = Config.instance()
    cfg.set("spx.preproc.xform", "all")
    cfg.set("spx.preproc.sampling", "none")
    cfg.set("spx.rt.nr_threads", "2")
    n = 128
    rng = np.random.default_rng(11)
    # top half: dense diagonal (folds to DIA); bottom half: random singles
    rows = [np.arange(n // 2)]
    cols = [np.arange(n // 2)]
    rows.append(rng.integers(n // 2, n, 120))
    cols.append(rng.integers(0, n, 120))
    rows = np.concatenate(rows)
    cols = np.concatenate(cols)
    _, u = np.unique(rows * n + cols, return_index=True)
    rows, cols = rows[u], cols[u]
    o = np.lexsort((cols, rows))
    rows, cols = rows[o], cols[o]
    vals = rng.standard_normal(rows.size)
    mat = CsxMatrix.from_coo(n, n, rows, cols, vals)
    has_dias = [bool(t.dias) for t in mat.shards]
    assert True in has_dias and False in has_dias, has_dias
    sh = ShardedCsx(mat, mesh=Mesh(np.array(jax.devices()[:2]), ("shards",)))
    x = rng.standard_normal(n)
    dense = np.zeros((n, n))
    dense[rows, cols] = vals
    assert max_rel_error(np.asarray(sh.matvec(x)), dense @ x) < 1e-10


def test_restore_then_shard():
    """mat_restore output feeds ShardedCsx directly."""
    import jax
    from jax.sharding import Mesh
    from sparsex_tpu.config import Config
    from sparsex_tpu.csx import CsxMatrix
    from sparsex_tpu.ops.oracle import max_rel_error
    from sparsex_tpu.parallel.shard import ShardedCsx
    from sparsex_tpu.persist import restore_csx, save_csx
    import tempfile, os

    cfg = Config.instance()
    cfg.set("spx.preproc.xform", "all")
    cfg.set("spx.preproc.sampling", "none")
    cfg.set("spx.rt.nr_threads", "4")
    n = 96
    rng = np.random.default_rng(12)
    rows = np.arange(n - 1)
    cols = rows + 1
    vals = rng.standard_normal(n - 1)
    mat = CsxMatrix.from_coo(n, n, rows, cols, vals)
    with tempfile.TemporaryDirectory() as d:
        path = os.path.join(d, "m.npz")
        save_csx(mat, path)
        mat2, _ = restore_csx(path)
    sh = ShardedCsx(mat2, mesh=Mesh(np.array(jax.devices()[:4]),
                                    ("shards",)))
    x = rng.standard_normal(n)
    dense = np.zeros((n, n))
    dense[rows, cols] = vals
    assert max_rel_error(np.asarray(sh.matvec(x)), dense @ x) < 1e-10


def test_sharded_symmetric_paged_routed_interpret(monkeypatch):
    """Sharded symmetric with BOTH delta sides paged + routed (VERDICT r2
    missing #2: round 2 ran sharded symmetric on serialized scatters)."""
    import jax.numpy as jnp
    from jax.experimental.pallas import tpu as pltpu

    import sparsex_tpu.ops.pallas_kernels as pk
    from sparsex_tpu.ops import route as route_mod

    if NDEV < 4:
        pytest.skip("not enough devices")
    monkeypatch.setattr(pk, "MIN_PAGE_NNZ", 64)
    monkeypatch.setattr(pk, "dia_pallas_ok", lambda: True)
    monkeypatch.setattr(route_mod, "MIN_ELEMS", 128)
    spx.option_set("spx.tpu.value_dtype", "float32")
    spx.option_set("spx.rt.nr_threads", "4")
    spx.option_set("spx.preproc.xform", "all")

    n = 3000
    rng = np.random.default_rng(9)
    r = rng.integers(0, n, 6000)
    c = rng.integers(0, n, 6000)
    lo = r >= c
    rs = np.concatenate([r[lo], np.arange(n)])
    cs = np.concatenate([c[lo], np.arange(n)])
    k = np.unique(rs * n + cs)
    rs, cs = k // n, k % n
    vs = rng.standard_normal(rs.size)
    off = rs != cs
    rows = np.concatenate([rs, cs[off]])
    cols = np.concatenate([cs, rs[off]])
    vals = np.concatenate([vs, vs[off]])
    o = np.lexsort((cols, rows))
    rows, cols, vals = rows[o], cols[o], vals[o]
    nrows = ncols = n
    vals = vals.astype(np.float32)
    mat = build_symmetric_csx(nrows, ncols, rows, cols, vals)
    with pltpu.force_tpu_interpret_mode():
        sh = ShardedCsx(mat, mesh=_mesh(4))
        assert sh.meta.get("dpages"), "direct delta pages not stacked"
        assert sh.meta.get("dpagesT"), "transposed delta pages not stacked"
        assert sh.meta.get("dscatterT"), "transposed route not stacked"
        x = np.random.default_rng(2).standard_normal(ncols).astype(
            np.float32)
        got = np.asarray(sh.matvec(x))
    want = coo_spmv(nrows, rows, cols, vals.astype(np.float64),
                    x.astype(np.float64))
    assert max_rel_error(got, want) <= 1e-4  # f32 accumulation order


def test_sharded_fused_delta_interpret(monkeypatch):
    """VERDICT r3 #4: the sharded executor runs the fused K1 -> per-
    instance G1/T1/K2 -> K3 delta pipeline (stack_fused_delta), not the
    legacy products kernel + 5-gather route apply.  Asserts the fused
    path was TAKEN (meta carries "dsfused") and matches the oracle on a
    4-device interpret-mode mesh, replicated and halo."""
    import jax
    import jax.numpy as jnp
    import numpy as np
    from jax.experimental.pallas import tpu as pltpu
    from jax.sharding import Mesh

    import sparsex_tpu.ops.fused as fused
    import sparsex_tpu.ops.pallas_kernels as pk_mod
    import sparsex_tpu.ops.route as route_mod
    from sparsex_tpu.config import Config
    from sparsex_tpu.csx import CsxMatrix
    from sparsex_tpu.parallel.shard import ShardedCsx

    del fused  # gate driven via config, not monkeypatch (VERDICT r4 #7)
    monkeypatch.setattr(pk_mod, "MIN_PAGE_NNZ", 64)
    monkeypatch.setattr(route_mod, "MIN_ELEMS", 64)
    monkeypatch.setattr(pk_mod, "dia_pallas_ok", lambda: True)
    cfg = Config.instance()
    cfg.set("spx.tpu.min_fused_nnz", "256")
    cfg.set("spx.tpu.value_dtype", "float32")
    cfg.set("spx.preproc.xform", "none")
    cfg.set("spx.rt.nr_threads", "4")
    cfg.set("spx.tpu.x_mode", "replicated")
    n = 8192
    rng = np.random.default_rng(3)
    rows = rng.integers(0, n, 40000)
    cols = rng.integers(0, n, 40000)
    _, u = np.unique(rows.astype(np.int64) * n + cols, return_index=True)
    rows, cols = rows[u], cols[u]
    o = np.lexsort((cols, rows))
    rows, cols = rows[o], cols[o]
    vals = rng.standard_normal(rows.size).astype(np.float32)
    mat = CsxMatrix.from_coo(n, n, rows, cols, vals)
    sh = ShardedCsx(mat, mesh=Mesh(np.array(jax.devices()[:4]),
                                   ("shards",)))
    assert sh.meta.get("dsfused"), "stacked fused delta not built"
    assert "delta_fused" in sh.arrays
    x = rng.standard_normal(n).astype(np.float32)
    with pltpu.force_tpu_interpret_mode():
        y = np.asarray(sh.matvec(x))
    dense = np.zeros(n)
    np.add.at(dense, rows, vals.astype(np.float64) * x[cols])
    assert np.abs(y - dense).max() / np.abs(dense).max() < 1e-5

    # halo mode: banded + near-diagonal singles keep spans narrow; the
    # local set must take the fused path too
    cfg.set("spx.tpu.x_mode", "halo")
    rows2_l, cols2_l = [], []
    for b in (0, 1):
        r = np.arange(max(0, -b), min(n, n - b))
        rows2_l.append(r)
        cols2_l.append(r + b)
    r_ = rng.integers(0, n, 40000)
    c_ = np.clip(r_ + rng.integers(-700, 700, 40000), 0, n - 1)
    rows2_l.append(r_)
    cols2_l.append(c_)
    rows2 = np.concatenate(rows2_l)
    cols2 = np.concatenate(cols2_l)
    _, u = np.unique(rows2.astype(np.int64) * n + cols2,
                     return_index=True)
    rows2, cols2 = rows2[u], cols2[u]
    o = np.lexsort((cols2, rows2))
    rows2, cols2 = rows2[o], cols2[o]
    vals2 = rng.standard_normal(rows2.size).astype(np.float32)
    mat2 = CsxMatrix.from_coo(n, n, rows2, cols2, vals2)
    sh2 = ShardedCsx(mat2, mesh=Mesh(np.array(jax.devices()[:4]),
                                     ("shards",)))
    assert sh2.x_mode == "halo"
    with pltpu.force_tpu_interpret_mode():
        y2 = np.asarray(sh2.matvec(x))
    d2 = np.zeros(n)
    np.add.at(d2, rows2, vals2.astype(np.float64) * x[cols2])
    assert np.abs(y2 - d2).max() / np.abs(d2).max() < 1e-5


def test_sharded_diag_class_demotes(monkeypatch):
    """Vert/diag tables demote into the stacked (fused) delta pipeline
    in sharded mode too: shards carry no sr!=0 run tables and the
    4-device SPMD result matches the oracle."""
    import jax
    import numpy as np
    from jax.experimental.pallas import tpu as pltpu
    from jax.sharding import Mesh

    import sparsex_tpu.ops.fused as fused
    import sparsex_tpu.ops.pallas_kernels as pk_mod
    import sparsex_tpu.ops.route as route_mod
    from sparsex_tpu.config import Config
    from sparsex_tpu.csx import CsxMatrix
    from sparsex_tpu.parallel.shard import ShardedCsx
    from sparsex_tpu.preprocess.xform import run_step

    monkeypatch.setattr(fused, "MIN_FUSED_NNZ", 256)
    monkeypatch.setattr(pk_mod, "MIN_PAGE_NNZ", 64)
    monkeypatch.setattr(route_mod, "MIN_ELEMS", 64)
    monkeypatch.setattr(pk_mod, "dia_pallas_ok", lambda: True)
    cfg = Config.instance()
    cfg.set("spx.tpu.value_dtype", "float32")
    cfg.set("spx.preproc.xform", "v,d")
    cfg.set("spx.rt.nr_threads", "4")
    cfg.set("spx.tpu.x_mode", "replicated")
    rng = np.random.default_rng(31)
    n = 8192
    j16 = np.arange(16)
    nd = 300
    dr = rng.integers(0, n - 16, nd); dc = rng.integers(0, n - 16, nd)
    rows = (dr[:, None] + j16[None]).ravel()
    cols = (dc[:, None] + j16[None]).ravel()
    vr = rng.integers(0, n - 8, nd); vc = rng.integers(0, n, nd)
    rows = np.concatenate([rows, (vr[:, None] + np.arange(8)[None]).ravel(),
                           rng.integers(0, n, 20000)])
    cols = np.concatenate([cols, np.repeat(vc, 8),
                           rng.integers(0, n, 20000)])
    _, u = np.unique(rows.astype(np.int64) * n + cols, return_index=True)
    rows, cols = rows[u], cols[u]
    o = np.lexsort((cols, rows)); rows, cols = rows[o], cols[o]
    vals = rng.standard_normal(rows.size).astype(np.float32)
    mat = CsxMatrix.from_coo(n, n, rows, cols, vals)
    assert any(run_step(rt.enc)[0] != 0 for t in mat.shards
               for rt in t.runs), "no vert/diag tables mined"
    sh = ShardedCsx(mat, mesh=Mesh(np.array(jax.devices()[:4]),
                                   ("shards",)))
    x = rng.standard_normal(n).astype(np.float32)
    with pltpu.force_tpu_interpret_mode():
        y = np.asarray(sh.matvec(x))
    dense = np.zeros(n)
    np.add.at(dense, rows, vals.astype(np.float64) * x[cols])
    assert np.abs(y - dense).max() / np.abs(dense).max() < 1e-5
