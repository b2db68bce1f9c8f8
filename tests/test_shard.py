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
