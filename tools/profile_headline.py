#!/usr/bin/env python
"""Component-level timing of the headline SpMV pipeline on the real chip.

Times each pass of the composed program separately with the two-point
slope protocol (see bench.py): the fused DIA kernel, the delta page
product kernel, the full scatter-routing apply and its individual stages.
Guides fusion work — the totals should add up to the measured SpMV.

    python tools/profile_headline.py [--n 1048576]
"""

import argparse
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from sparsex_tpu.platform import honor_jax_platforms_env  # noqa: E402

honor_jax_platforms_env()


def _sync(a):
    return float(np.asarray(a).ravel()[0])


def slope(make, k1=16, k2=64, outer=3):
    f1, f2 = make(k1), make(k2)
    _sync(f1()); _sync(f2())
    t1s, t2s = [], []
    for _ in range(outer):
        t0 = time.perf_counter(); _sync(f1()); t1s.append(time.perf_counter() - t0)
        t0 = time.perf_counter(); _sync(f2()); t2s.append(time.perf_counter() - t0)
    return max(np.median(t2s) - np.median(t1s), 1e-9) / (k2 - k1)


def chain(fn, x0, shape_like=None):
    """make(k) -> jitted k-times-chained fn with a data dependency."""
    import jax
    import jax.numpy as jnp

    def make(k):
        @jax.jit
        def rep(x):
            def body(c, _):
                y = fn(x * c)
                c = (c * jnp.float32(0.9999)
                     + y.ravel()[0] * jnp.float32(1e-12))
                return c, ()
            c, _ = jax.lax.scan(body, jnp.float32(1.0), None, length=k)
            return c
        return lambda: rep(x0)
    return make


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=1 << 20)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    sys.path.insert(0, os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))))
    from bench import build_matrix
    from sparsex_tpu.config import Config
    from sparsex_tpu.csx import CsxMatrix
    from sparsex_tpu.ops.exec import _compiled, _resolve_use_pallas

    cfg = Config.reset()
    cfg.set("spx.tpu.value_dtype", "float32")
    cfg.set("spx.preproc.xform", "all")
    cfg.set("spx.preproc.sampling", "portion")

    n = args.n
    rows, cols, vals = build_matrix(n)
    print(f"matrix {n}x{n} nnz={rows.size}", file=sys.stderr)
    mat = CsxMatrix.from_coo(n, n, rows, cols, vals)
    ex = mat.executors[0]
    assert ex._pages_active(), "paged layout inactive"
    meta, arrays = ex._pages_meta, jax.device_put(ex._pages_arrays)
    extras = {e[0]: e[1:] for e in meta[5:] if e}
    print("extras:", {k: v if k != "dscatter" else
                      [m[:7] for m in v[0]] for k, v in extras.items()},
          file=sys.stderr)

    x = jnp.asarray(np.random.default_rng(1).standard_normal(n),
                    dtype=jnp.float32)

    results = {}

    # --- full SpMV ---
    spmv = _compiled(meta, "float32", _resolve_use_pallas(
        mat.shards[0], routed=ex._routed()))
    zeros = jnp.zeros(n, dtype=jnp.float32)
    full = lambda xx: spmv(arrays, xx, jnp.float32(1.0), jnp.float32(0.0),
                           zeros)
    results["full_spmv"] = slope(chain(full, x))

    # --- DIA only ---
    from sparsex_tpu.ops.kernels import dia_contrib
    dia_meta = meta[4]
    dias = arrays["dias"]

    def dia_only(xx):
        acc = jnp.zeros(n, dtype=jnp.float32)
        acc, _ = dia_contrib(dia_meta, dias, xx, n, 0, acc, ncols=n,
                             use_pallas=True)
        return acc
    if dia_meta:
        results["dia_pallas"] = slope(chain(dia_only, x))

        def dia_xla(xx):
            acc = jnp.zeros(n, dtype=jnp.float32)
            acc, _ = dia_contrib(dia_meta, dias, xx, n, 0, acc, ncols=n,
                                 use_pallas=False)
            return acc
        results["dia_xla"] = slope(chain(dia_xla, x))

    # --- delta product kernel (pad_x + pages gather + multiply) ---
    if "dpages" in extras:
        from sparsex_tpu.ops.pallas_kernels import (delta_pages_products,
                                                    pad_x_pages)
        T, q, npages = extras["dpages"]

        def prods_only(xx):
            return delta_pages_products((T, q, npages),
                                        arrays["delta_pages"], xx, n)
        results["delta_products"] = slope(chain(prods_only, x))

        def padx_only(xx):
            return pad_x_pages(xx, n, q, npages).reshape(-1)
        results["pad_x_pages"] = slope(chain(padx_only, x))

    # --- routing apply (all stages) + per-stage ---
    if "dscatter" in extras:
        from sparsex_tpu.ops import route as R
        dmetas, has_res = extras["dscatter"]
        ds = arrays["delta_scatter"]
        m_src = sum((m[1]) * 128 for m in dmetas)
        # products-shaped dummy source
        src0 = jnp.asarray(
            np.random.default_rng(2).standard_normal(
                max(m[8] for m in dmetas) * 128).astype(np.float32))

        def route_only(s):
            return R.apply_scatter_plan(dmetas, ds["chunks"], s, n)
        results["route_apply"] = slope(chain(route_only, src0))

        # stage cuts: run the pipeline truncated after each stage
        import jax.numpy as jnp2

        def make_stage(stop):
            def f(s):
                from sparsex_tpu.ops.route import L, _build_lane_gather
                y = None
                for m_i, arrs in zip(dmetas, ds["chunks"]):
                    S1c, S1p, A2R, D2R, Dp, K, W2, a0, a1 = m_i
                    dt = "float32"
                    def take2(xv, idx):
                        idx = jnp2.asarray(idx)
                        if idx.ndim == 2:
                            idx = idx[None]
                        return _build_lane_gather(
                            int(xv.shape[0]), int(idx.shape[0]), dt)(xv, idx)
                    src2d = s[a0 * L: a1 * L].reshape(S1c, L)
                    A0 = jnp2.zeros((S1p, L),
                                    dtype=src2d.dtype).at[:S1c].set(src2d)
                    A1 = take2(A0, arrs["g1"])
                    if stop == "g1":
                        out = A1; break
                    B = A1.T.reshape(L, A2R, L)
                    C1 = take2(B.reshape(L * A2R, L), arrs["g2a"])
                    if stop == "g2a":
                        out = C1; break
                    C2 = jnp2.transpose(C1.reshape(L, A2R, L),
                                        (0, 2, 1))[:, :W2]
                    C2p = jnp2.zeros((L, W2, L),
                                     dtype=src2d.dtype).at[:, :, :A2R].set(C2)
                    D1 = take2(C2p.reshape(L * W2, L), arrs["g2b"])
                    if stop == "g2b":
                        out = D1; break
                    D2 = jnp2.transpose(D1.reshape(L, W2, L)[:, :, :D2R],
                                        (0, 2, 1))
                    if W2 == L:
                        D2p = D2
                    else:
                        D2p = jnp2.zeros(
                            (L, D2R, L),
                            dtype=src2d.dtype).at[:, :, :W2].set(D2)
                    E1 = take2(D2p.reshape(L * D2R, L), arrs["g2c"])
                    if stop == "g2c":
                        out = E1; break
                    E2 = E1.reshape(L, D2R * L)[:, :Dp].T
                    if stop == "t2":
                        out = E2; break
                    out = take2(E2, jnp2.asarray(arrs["g3"])).reshape(-1)
                return out
            return f
        for stop in ("g1", "g2a", "g2b", "g2c", "t2", "g3"):
            results[f"route_to_{stop}"] = slope(
                chain(make_stage(stop), src0))

    base = results.get("full_spmv", 1.0)
    for k, v in results.items():
        print(f"{k:18s} {v * 1e6:9.1f} us  ({100 * v / base:5.1f}% of full)")


if __name__ == "__main__":
    main()
