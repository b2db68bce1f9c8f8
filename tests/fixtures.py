"""Test matrices, mirroring the semantics of the reference fixtures
(``test/matrices/``): a small crafted pattern matrix (hits horizontal /
vertical / diagonal / anti-diagonal / block substructures), symmetric
matrices including a very sparse one, and random/banded generators."""

from __future__ import annotations

import numpy as np


def pattern10():
    """10x10 with one of each substructure (analogous to demopatt)."""
    entries = []
    # horizontal run, row 0 cols 0..4
    entries += [(0, c, 1.0 + c) for c in range(5)]
    # vertical run, col 9 rows 0..4
    entries += [(r, 9, 10.0 + r) for r in range(5)]
    # diagonal run (2,2)..(5,5)
    entries += [(i, i, 20.0 + i) for i in range(2, 6)]
    # anti-diagonal run (6,8),(7,7),(8,6),(9,5)
    entries += [(6 + i, 8 - i, 30.0 + i) for i in range(4)]
    # 2x2 block at rows 7..8, cols 1..2
    entries += [(7, 1, 41.0), (7, 2, 42.0), (8, 1, 43.0), (8, 2, 44.0)]
    # singles
    entries += [(6, 3, 50.0), (9, 9, 51.0)]
    entries = sorted(set((r, c) for r, c, _ in entries))
    vals = {(r, c): v for r, c, v in [
        (r, c, 1.0 + 0.1 * i) for i, (r, c) in enumerate(entries)]}
    rows = np.array([r for r, _ in entries], dtype=np.int64)
    cols = np.array([c for _, c in entries], dtype=np.int64)
    v = np.array([vals[(r, c)] for r, c in entries])
    return 10, 10, rows, cols, v


def random_coo(nrows=80, ncols=97, density=0.06, seed=0):
    rng = np.random.default_rng(seed)
    mask = rng.random((nrows, ncols)) < density
    rows, cols = np.nonzero(mask)
    vals = rng.standard_normal(rows.size) + 1.5
    return nrows, ncols, rows.astype(np.int64), cols.astype(np.int64), vals


def banded_coo(n=120, bands=(0, 1, -1, 5, -7), seed=1):
    """Banded matrix: rich in diagonal runs."""
    rng = np.random.default_rng(seed)
    rows, cols = [], []
    for b in bands:
        r = np.arange(max(0, -b), min(n, n - b), dtype=np.int64)
        rows.append(r)
        cols.append(r + b)
    rows = np.concatenate(rows)
    cols = np.concatenate(cols)
    order = np.lexsort((cols, rows))
    rows, cols = rows[order], cols[order]
    vals = rng.standard_normal(rows.size) + 2.0
    return n, n, rows, cols, vals


def blocky_coo(n=96, bs=4, nblocks=40, seed=2):
    """Matrix of dense bs x bs blocks at random aligned positions."""
    rng = np.random.default_rng(seed)
    coords = set()
    while len(coords) < nblocks:
        coords.add((int(rng.integers(0, n // bs)),
                    int(rng.integers(0, n // bs))))
    rows, cols = [], []
    for (bi, bj) in sorted(coords):
        rr, cc = np.meshgrid(np.arange(bs), np.arange(bs), indexing="ij")
        rows.append((bi * bs + rr).ravel())
        cols.append((bj * bs + cc).ravel())
    rows = np.concatenate(rows).astype(np.int64)
    cols = np.concatenate(cols).astype(np.int64)
    order = np.lexsort((cols, rows))
    rows, cols = rows[order], cols[order]
    vals = rng.standard_normal(rows.size) + 1.0
    return n, n, rows, cols, vals


def symmetric_coo(n=60, density=0.08, seed=3):
    """Symmetric matrix as full (mirrored) COO."""
    rng = np.random.default_rng(seed)
    mask = np.tril(rng.random((n, n)) < density)
    np.fill_diagonal(mask, rng.random(n) < 0.7)
    rows, cols = np.nonzero(mask)
    vals = rng.standard_normal(rows.size) + 1.2
    full = {}
    for r, c, v in zip(rows, cols, vals):
        full[(r, c)] = v
        full[(c, r)] = v
    items = sorted(full.items())
    rr = np.array([k[0] for k, _ in items], dtype=np.int64)
    cc = np.array([k[1] for k, _ in items], dtype=np.int64)
    vv = np.array([v for _, v in items])
    return n, n, rr, cc, vv


def write_mmf(path, nrows, ncols, rows, cols, vals, banner=None):
    with open(path, "w") as fp:
        if banner:
            fp.write(banner + "\n")
        fp.write(f"{nrows} {ncols} {len(rows)}\n")
        for r, c, v in zip(rows, cols, vals):
            fp.write(f"{int(r) + 1} {int(c) + 1} {float(v)!r}\n")


def symmetric_mmf_text(n=8, seed=4):
    """Lower-triangle symmetric MMF with the reference's nonstandard
    '1-base row' banner tokens (like test/matrices/symmetric.mtx.sorted)."""
    rng = np.random.default_rng(seed)
    lines = ["%%MatrixMarket matrix coordinate real symmetric 1-base row"]
    entries = []
    for r in range(n):
        entries.append((r, r, float(np.round(rng.random() * 9, 1)) + 0.1))
        for c in range(r):
            if rng.random() < 0.4:
                entries.append((r, c, float(np.round(rng.random() * 9, 1)) + 0.1))
    entries.sort()
    lines.append(f"{n} {n} {len(entries)}")
    for r, c, v in entries:
        lines.append(f"{r + 1} {c + 1} {v}")
    return "\n".join(lines) + "\n"
