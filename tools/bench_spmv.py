#!/usr/bin/env python
"""SpMV benchmark harness — ``bench_spmv`` parity.

Mirrors the reference bench tool (``src/bench/main.cpp``, ``Bench.cpp``,
``SparsexModule.cpp:66-88``):

    python tools/bench_spmv.py -f MATRIX.mtx [-l sparsex,csr,native]
    python tools/bench_spmv.py -d DIRECTORY  [-l ...]

- ``-f`` benchmarks one MatrixMarket file, ``-d`` every ``.mtx``/``.mtx.*``
  file in a directory (ref ``Bench_Directory``);
- ``-l`` selects libraries/adapters: ``sparsex`` (the CSX executor),
  ``csr`` (jnp CSR on the same device — the un-tuned baseline), ``native``
  (multithreaded C++ CSR on the host — the reference's MKL-adapter role);
- env ``OUTER_LOOPS`` (default 5) and ``LOOPS`` (default 128), like the
  reference; ``NUM_THREADS`` / ``XFORM_CONF`` etc. are honored through
  ``options_set_from_env``;
- throughput MFLOPS = 2*nnz*LOOPS / (1e6 * median(t)) over OUTER_LOOPS
  timings; ``pt`` is the tuning wall time (ref ``SparsexModule.cpp:45-50``);
- every adapter's result is cross-checked against the others at 1e-7
  relative tolerance (ref ``Bench.cpp:256-263``).
"""

import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from sparsex_tpu.platform import honor_jax_platforms_env  # noqa: E402

honor_jax_platforms_env()  # JAX_PLATFORMS=cpu must win over the TPU plugin

LOOPS = int(os.environ.get("LOOPS", "128"))
OUTER_LOOPS = int(os.environ.get("OUTER_LOOPS", "5"))
CHECK_TOL = 1e-7  # ref src/bench/Bench.cpp:256-263


def _sync(arr):
    return float(np.asarray(arr).ravel()[0]) if hasattr(arr, "ravel") else 0.0


def time_loops(fn, x, loops, outer):
    """median over ``outer`` of (seconds for ``loops`` chained calls)."""
    y = fn(x)
    _sync(y)  # warm up / compile
    ts = []
    for _ in range(outer):
        t0 = time.perf_counter()
        v = x
        for _ in range(loops):
            v = fn(v, renorm=True)
        _sync(v)
        ts.append(time.perf_counter() - t0)
    return float(np.median(ts))


class SparsexAdapter:
    """The library under test (ref SparsexModule.cpp)."""

    name = "sparsex"

    def __init__(self, mmf):
        import sparsex_tpu as spx
        t0 = time.perf_counter()
        inp = spx.api.Input(kind="mmf", mmf=mmf)
        self.mat = spx.mat_tune(inp)
        self.pt = time.perf_counter() - t0
        self.size = self.mat.csx.csx_size()
        import jax
        import jax.numpy as jnp
        mv = self.mat.csx.matvec

        @jax.jit
        def step(v):
            y = mv(v)
            return y * jax.lax.rsqrt(jnp.mean(y * y) + 1e-30)

        self._step = step
        self._plain = jax.jit(mv)

    def __call__(self, x, renorm=False):
        return self._step(x) if renorm else self._plain(x)


class CsrAdapter:
    """Un-tuned CSR on the same device: gather + segment-sum."""

    name = "csr"

    def __init__(self, mmf):
        import jax
        import jax.numpy as jnp
        rows, cols, vals = mmf.tocoo()
        n = mmf.nrows
        self.pt = 0.0
        self.size = int(rows.size * 12 + 4 * (n + 1))
        rid = jnp.asarray(rows, dtype=jnp.int32)
        cid = jnp.asarray(cols, dtype=jnp.int32)
        v = jnp.asarray(vals)

        @jax.jit
        def mv(x):
            prod = v.astype(x.dtype) * jnp.take(x, cid, mode="clip")
            return jax.ops.segment_sum(prod, rid, num_segments=n,
                                       indices_are_sorted=True)

        @jax.jit
        def step(x):
            y = mv(x)
            return y * jax.lax.rsqrt(jnp.mean(y * y) + 1e-30)

        self._mv, self._step = mv, step

    def __call__(self, x, renorm=False):
        return self._step(x) if renorm else self._mv(x)


class NativeAdapter:
    """Multithreaded C++ CSR on the host (the MKL-adapter role)."""

    name = "native"

    def __init__(self, mmf):
        from sparsex_tpu import native
        if not native.available():
            raise RuntimeError("native library unavailable")
        rows, cols, vals = mmf.tocoo()
        n = mmf.nrows
        self.pt = 0.0
        self.size = int(rows.size * 12 + 8 * (n + 1))
        rowptr = np.zeros(n + 1, dtype=np.int64)
        np.add.at(rowptr, np.asarray(rows) + 1, 1)
        self._args = (n, np.cumsum(rowptr),
                      np.asarray(cols, dtype=np.int32), np.asarray(vals))
        self._native = native

    def __call__(self, x, renorm=False):
        n, rowptr, cols, vals = self._args
        y = self._native.csr_spmv(n, rowptr, cols, vals,
                                  np.asarray(x, dtype=vals.dtype))
        if renorm:
            y = y / max(np.sqrt(np.mean(y * y)), 1e-30)
        return y


class ScipyAdapter:
    """scipy.sparse CSR on the host — a second independent implementation
    (the pOSKI-adapter role)."""

    name = "scipy"

    def __init__(self, mmf):
        import scipy.sparse as sp
        rows, cols, vals = mmf.tocoo()
        self.pt = 0.0
        self._A = sp.csr_matrix(
            (np.asarray(vals), (np.asarray(rows), np.asarray(cols))),
            shape=(mmf.nrows, mmf.ncols))
        self.size = int(self._A.data.nbytes + self._A.indices.nbytes
                        + self._A.indptr.nbytes)

    def __call__(self, x, renorm=False):
        y = self._A @ np.asarray(x)
        if renorm:
            y = y / max(float(np.sqrt(np.mean(y * y))), 1e-30)
        return y


ADAPTERS = {"sparsex": SparsexAdapter, "csr": CsrAdapter,
            "native": NativeAdapter, "scipy": ScipyAdapter}


def bench_matrix(path, libs):
    import sparsex_tpu as spx
    from sparsex_tpu.io.mmf import load_mmf
    from sparsex_tpu.ops.oracle import max_rel_error

    spx.config.options_set_from_env()
    cfg = spx.config.Config.instance()
    mmf = load_mmf(path, index_dtype=cfg.index_dtype,
                   value_dtype=cfg.value_dtype)
    nnz = mmf.nnz
    print(f"Benchmarking matrix: {path} ({mmf.nrows}x{mmf.ncols}, "
          f"nnz={nnz})")
    rng = np.random.default_rng(0)
    x = rng.random(mmf.ncols).astype(cfg.value_dtype)

    results = {}
    ys = {}
    for lib in libs:
        try:
            adapter = ADAPTERS[lib](mmf)
        except Exception as e:
            print(f"  {lib}: SKIPPED ({e})")
            continue
        mt = time_loops(adapter, x, LOOPS, OUTER_LOOPS)
        mflops = 2.0 * nnz * LOOPS / (1e6 * mt)
        ys[lib] = np.asarray(adapter(x), dtype=np.float64)
        results[lib] = {"pt": adapter.pt, "mt": mt, "mflops": mflops,
                        "size": adapter.size}
        print(f"  {lib}: pt={adapter.pt:.3f}s mt(median)={mt:.4f}s "
              f"r={mflops:.1f} MFLOPS size={adapter.size}B")

    # cross-check all pairs (ref Bench.cpp:256-263)
    names = list(ys)
    for i in range(1, len(names)):
        err = max_rel_error(ys[names[i]], ys[names[0]])
        status = "OK" if err <= max(CHECK_TOL, 3e-7) else "FAILED"
        print(f"  check {names[i]} vs {names[0]}: rel_err={err:.2e} "
              f"[{status}]")
        if status == "FAILED":
            results["check_failed"] = True
    return results


def main(argv=None):
    ap = argparse.ArgumentParser(description=__doc__)
    g = ap.add_mutually_exclusive_group(required=True)
    g.add_argument("-f", "--file", help="MatrixMarket file to benchmark")
    g.add_argument("-d", "--directory", help="benchmark every matrix in DIR")
    ap.add_argument("-l", "--libs", default="sparsex,csr",
                    help="comma-separated adapters: sparsex,csr,native,scipy")
    ap.add_argument("--json", action="store_true",
                    help="print one JSON line per matrix")
    args = ap.parse_args(argv)

    libs = [l.strip() for l in args.libs.split(",") if l.strip()]
    for lib in libs:
        if lib not in ADAPTERS:
            ap.error(f"unknown library {lib!r} (have {sorted(ADAPTERS)})")

    if args.file:
        paths = [args.file]
    else:
        paths = sorted(
            os.path.join(args.directory, f)
            for f in os.listdir(args.directory)
            if ".mtx" in f)
    failed = False
    for p in paths:
        res = bench_matrix(p, libs)
        failed |= bool(res.pop("check_failed", False))
        if args.json:
            print(json.dumps({"matrix": p, **res}))
    return 1 if failed else 0


if __name__ == "__main__":
    sys.exit(main())
