"""Symmetric CSX tests (ref CSX-Sym: csx_sym_spmv_tmpl.c + reduction map)."""

import numpy as np
import pytest

import sparsex_tpu as spx
from sparsex_tpu.ops.oracle import coo_spmv, max_rel_error
from sparsex_tpu.symmetric import build_symmetric_csx
from tests import fixtures

TOL = 1e-6


def _check_sym(nthreads=1, xform="all", n=60, seed=3):
    spx.option_set("spx.rt.nr_threads", str(nthreads))
    spx.option_set("spx.preproc.xform", xform)
    nrows, ncols, rows, cols, vals = fixtures.symmetric_coo(n=n, seed=seed)
    mat = build_symmetric_csx(nrows, ncols, rows, cols, vals)
    rng = np.random.default_rng(seed)
    x = rng.standard_normal(ncols)
    y0 = rng.standard_normal(nrows)
    got = np.asarray(mat.matvec(x, alpha=1.1, beta=0.4, y=y0))
    want = 1.1 * coo_spmv(nrows, rows, cols, vals, x) + 0.4 * y0
    assert max_rel_error(got, want) <= TOL
    return mat, rows, cols, vals


@pytest.mark.parametrize("xform", ["none", "h", "v", "all"])
def test_symmetric_spmv(xform):
    _check_sym(xform=xform)


@pytest.mark.parametrize("nthreads", [2, 4])
def test_symmetric_multishard(nthreads):
    mat, *_ = _check_sym(nthreads=nthreads)
    assert len(mat.shards) == nthreads


def test_symmetric_very_sparse():
    # fewer off-diagonals than rows (like symmetric-very-sparse fixture)
    _check_sym(n=40, seed=11, xform="all")


def test_symmetric_get_set():
    mat, rows, cols, vals = _check_sym()
    for r, c, v in zip(rows[:50], cols[:50], vals[:50]):
        assert mat.get_entry(int(r), int(c)) == pytest.approx(float(v))
    # symmetric set updates the mirrored entry too
    r, c = int(rows[0]), int(cols[0])
    mat.set_entry(r, c, 123.0)
    assert mat.get_entry(c, r) == pytest.approx(123.0)


def test_unsymmetric_input_rejected():
    # expected-failure parity: symmetric flag on unsymmetric input must fail
    # gracefully (ref test-sparsex.sh.in:199-222)
    nrows, ncols, rows, cols, vals = fixtures.random_coo(40, 40, seed=5)
    with pytest.raises(spx.SparsexError):
        build_symmetric_csx(nrows, ncols, rows, cols, vals)


def test_symmetric_tocoo_roundtrip():
    mat, rows, cols, vals = _check_sym()
    rr, cc, vv = mat.tocoo()
    assert rr.tolist() == rows.tolist()
    assert cc.tolist() == cols.tolist()
    np.testing.assert_allclose(vv, vals, rtol=1e-12)
