#!/usr/bin/env python
"""Per-kernel device-time budget of a bench workload on the real chip.

Runs the tuned SpMV as one jitted k-iteration chain under
``jax.profiler.trace`` and aggregates the device-side events by op name,
so the K1/T1/K2/K3/epilogue split of the fused pipeline (and every other
XLA fusion) is visible per iteration.  This is the budget table VERDICT
r3 asks for (weak #1/#2): the output should add up to the bench number,
and the top line is the next optimization target.

    python tools/profile_fused.py --workload blocky --json PROFILE_r04.json

Mirrors the role of the reference's per-loop timing framework
(src/internals/Timer*.cpp, timing report in SparseMatrixWrapper.cpp) for
kernel-level attribution; the trace is the only reliable timer through
the axon tunnel (see CLAUDE.md).
"""

import argparse
import glob
import gzip
import json
import os
import sys
import tempfile
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from sparsex_tpu.platform import honor_jax_platforms_env  # noqa: E402

honor_jax_platforms_env()


def _sync(a):
    return float(np.asarray(a).ravel()[0])


def build(workload, k, spmm_k=0):
    import jax
    import jax.numpy as jnp

    import bench
    from sparsex_tpu.config import Config
    from sparsex_tpu.csx import CsxMatrix
    from sparsex_tpu.ops.exec import _compiled, _resolve_use_pallas

    cfg = Config.reset()
    cfg.set("spx.tpu.value_dtype", "float32")
    cfg.set("spx.preproc.xform", "all")
    cfg.set("spx.preproc.sampling", "portion")
    if os.environ.get("SPX_SB_PAGES"):
        cfg.set("spx.tpu.sb_pages", os.environ["SPX_SB_PAGES"])
    builders = {
        "headline": (bench.build_matrix, bench.N),
        "blocky": (bench.build_blocky_matrix, bench.N_BLOCKY),
        "symmetric": (bench.build_symmetric_matrix, bench.N_SYM),
        "diagc": (bench.build_diagc_matrix, bench.N_DIAGC),
    }
    builder, n = builders[workload]
    rows, cols, vals = builder(n)

    if workload == "symmetric":
        from sparsex_tpu.symmetric import build_symmetric_csx
        mat = build_symmetric_csx(n, n, rows, cols, vals)
        arrays = None
        x = jnp.asarray(
            np.random.default_rng(1).standard_normal(n).astype(np.float32))

        @jax.jit
        def chained(x):
            def body(c, _):
                y = mat.matvec(c)
                return y * jax.lax.rsqrt(jnp.mean(y * y) + 1e-20), ()
            y, _ = jax.lax.scan(body, x, None, length=k)
            return y

        return (lambda: chained(x)), rows.size
    if spmm_k:
        # k-batched SpMM chain (matmat path): the budget for VERDICT r4
        # #4 — where do the k-amortization claims break down?
        mat = CsxMatrix.from_coo(n, n, rows, cols, vals)
        X = jnp.asarray(np.random.default_rng(1).standard_normal(
            (n, spmm_k)).astype(np.float32))

        @jax.jit
        def chained_mm(X):
            def body(c, _):
                Y = mat.matmat(c)
                return Y * jax.lax.rsqrt(jnp.mean(Y * Y) + 1e-20), ()
            Y, _ = jax.lax.scan(body, X, None, length=k)
            return Y

        return (lambda: chained_mm(X)), rows.size
    mat = CsxMatrix.from_coo(n, n, rows, cols, vals)
    tables = mat.shards[0]
    ex = mat.executors[0]
    meta, arrays = ex.meta, ex.arrays
    if ex._pages_active():
        meta, arrays = ex._pages_meta, ex._pages_arrays
    arrays = jax.device_put(arrays)
    spmv = _compiled(meta, "float32",
                     _resolve_use_pallas(tables, routed=ex._routed()),
                     apply_alpha=False, apply_beta=False)
    zeros = jnp.zeros(n, dtype=jnp.float32)
    x = jnp.asarray(
        np.random.default_rng(1).standard_normal(n).astype(np.float32))

    @jax.jit
    def chained(arrays, x):
        def body(c, _):
            y = spmv(arrays, c, jnp.float32(1.0), jnp.float32(0.0), zeros)
            return y * jax.lax.rsqrt(jnp.mean(y * y) + 1e-20), ()
        y, _ = jax.lax.scan(body, x, None, length=k)
        return y

    return (lambda: chained(arrays, x)), rows.size


def trace_budget(fn, iters, reps=3):
    """{op name: us/iter} aggregated over device events, best rep."""
    import jax

    best_total, best = None, None
    for _ in range(reps):
        with tempfile.TemporaryDirectory() as td:
            with jax.profiler.trace(td):
                _sync(fn())
            files = glob.glob(td + "/**/*.trace.json.gz", recursive=True)
            if not files:
                return None
            with gzip.open(sorted(files)[-1]) as fh:
                tr = json.load(fh)
        ev = tr.get("traceEvents", [])
        pids = {e["pid"]: e["args"].get("name", "") for e in ev
                if e.get("ph") == "M" and e.get("name") == "process_name"}
        # durable device events live on the "/device:TPU:x" pid; skip the
        # outer jit_ wrapper rows (they double-count their children when
        # the thread also carries per-op rows) by aggregating per op name
        agg = {}
        for e in ev:
            if e.get("ph") != "X" or "dur" not in e:
                continue
            if "TPU" not in pids.get(e["pid"], ""):
                continue
            name = e["name"]
            if name.startswith("jit_"):
                continue
            agg[name] = agg.get(name, 0.0) + e["dur"]
        total = sum(agg.values())
        if not agg:
            continue
        if best_total is None or total < best_total:
            best_total, best = total, agg
    if best is None:
        return None
    return {k: v / iters for k, v in best.items()}


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--workload", default="headline",
                    choices=["headline", "blocky", "symmetric", "diagc"])
    ap.add_argument("--iters", type=int, default=64)
    ap.add_argument("--reps", type=int, default=3)
    ap.add_argument("--top", type=int, default=24)
    ap.add_argument("--spmm", type=int, default=0, metavar="K",
                    help="profile the SpMM (matmat) chain at width K")
    ap.add_argument("--json", default=None,
                    help="append {workload: budget} into this JSON file")
    args = ap.parse_args()

    import jax
    dev = jax.devices()[0]
    print(f"device: {dev} platform={dev.platform}")

    t0 = time.perf_counter()
    fn, nnz = build(args.workload, args.iters, spmm_k=args.spmm)
    _sync(fn())   # compile
    print(f"[{args.workload}] nnz={nnz} built+compiled "
          f"in {time.perf_counter() - t0:.1f}s"
          + (f" (spmm k={args.spmm})" if args.spmm else ""))
    budget = trace_budget(fn, args.iters, args.reps)
    if budget is None:
        print("no trace events captured (CPU backend?)", file=sys.stderr)
        sys.exit(1)
    total = sum(budget.values())
    print(f"[{args.workload}] device total: {total:.1f} us/iter")
    for name, us in sorted(budget.items(), key=lambda kv: -kv[1])[: args.top]:
        print(f"  {us:9.2f} us  {100 * us / total:5.1f}%  {name}")
    if args.json:
        data = {}
        if os.path.exists(args.json):
            with open(args.json) as fh:
                data = json.load(fh)
        data[args.workload] = {
            "nnz": nnz, "total_us_per_iter": round(total, 2),
            "kernels": {k: round(v, 2) for k, v in
                        sorted(budget.items(), key=lambda kv: -kv[1])},
        }
        with open(args.json, "w") as fh:
            json.dump(data, fh, indent=1)
        print(f"wrote {args.json}")


if __name__ == "__main__":
    main()
