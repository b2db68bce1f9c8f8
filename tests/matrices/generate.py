#!/usr/bin/env python
"""Generate the test fixture matrices.

Mirrors the *semantics* of the reference fixtures (``test/matrices/``,
SURVEY §4) with freshly generated data: a small crafted pattern matrix
containing horizontal/vertical/diagonal/block substructure (demopatt), its
unsorted variant (negative test), a symmetric MMF with the nonstandard
``1-base row`` banner tokens, a very sparse symmetric matrix, and three
small general matrices.  Run this script to regenerate; files are committed
so tests and the bench tool work offline.
"""

import os

import numpy as np

HERE = os.path.dirname(os.path.abspath(__file__))


def write(path, lines):
    with open(os.path.join(HERE, path), "w") as fp:
        fp.write("\n".join(lines) + "\n")


def fmt(entries, nrows, ncols, banner=None):
    lines = []
    if banner:
        lines.append(banner)
    lines.append(f"{nrows} {ncols} {len(entries)}")
    for r, c, v in entries:
        lines.append(f"{r + 1} {c + 1} {v:g}")
    return lines


def demopatt():
    """10x10 with one of each substructure class."""
    e = []
    e += [(0, c, 1.0 + c) for c in range(5)]                 # horizontal run
    e += [(r, 9, 10.0 + r) for r in range(5)]                # vertical run
    e += [(i, i, 20.0 + i) for i in range(2, 6)]             # diagonal run
    e += [(6 + i, 8 - i, 30.0 + i) for i in range(4)]        # anti-diagonal
    e += [(7, 1, 41.0), (7, 2, 42.0), (8, 1, 43.0), (8, 2, 44.0)]  # 2x2 block
    e += [(6, 3, 50.0), (9, 0, 51.0)]                        # singles
    e = sorted(set(e))
    return e


def main():
    rng = np.random.default_rng(20260816)

    e = demopatt()
    write("demopatt.mtx.sorted", fmt(e, 10, 10))
    shuffled = list(e)
    rng.shuffle(shuffled)
    if shuffled == e:
        shuffled = e[::-1]
    write("demopatt.mtx.unsorted", fmt(shuffled, 10, 10))

    # symmetric 8x8, lower triangle, nonstandard banner tokens
    n = 8
    e = []
    for r in range(n):
        e.append((r, r, round(1.0 + 0.5 * r, 1)))
        for c in range(r):
            if rng.random() < 0.45:
                e.append((r, c, round(float(rng.random() * 9 + 0.1), 2)))
    e.sort()
    write("symmetric.mtx.sorted",
          fmt(e, n, n, "%%MatrixMarket matrix coordinate real symmetric "
                       "1-base row"))

    # symmetric very sparse: 30x30, only a few off-diagonals
    n = 30
    e = [(i, i, 2.0 + 0.1 * i) for i in range(n)]
    e += [(7, 2, 1.5), (15, 3, -0.5), (22, 20, 0.75), (29, 0, 0.25)]
    e.sort()
    write("symmetric-very-sparse.mtx.sorted",
          fmt(e, n, n, "%%MatrixMarket matrix coordinate real symmetric"))

    # three small general matrices (banded + random, growing sizes)
    for name, n, extra in (("test.mtx.sorted", 20, 30),
                           ("test2.mtx.sorted", 40, 120),
                           ("test3.mtx.sorted", 60, 300)):
        rows, cols = [], []
        for b in (0, 1, -2):
            r = np.arange(max(0, -b), min(n, n - b))
            rows.append(r)
            cols.append(r + b)
        rows.append(rng.integers(0, n, extra))
        cols.append(rng.integers(0, n, extra))
        rows = np.concatenate(rows)
        cols = np.concatenate(cols)
        _, u = np.unique(rows * n + cols, return_index=True)
        rows, cols = rows[u], cols[u]
        o = np.lexsort((cols, rows))
        rows, cols = rows[o], cols[o]
        vals = np.round(rng.standard_normal(rows.size) + 2.0, 3)
        e = list(zip(rows.tolist(), cols.tolist(), vals.tolist()))
        write(name, fmt(e, n, n,
                        "%%MatrixMarket matrix coordinate real general"))
    print("fixtures written to", HERE)


if __name__ == "__main__":
    main()
