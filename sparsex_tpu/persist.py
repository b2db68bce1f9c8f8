"""Matrix caching: save/restore of the preprocessed CSX tables.

Parity with the reference persistence layer (``include/sparsex/internals/
CsxSaveRestore.hpp:76-369``: boost binary serialization of the per-thread
CSX + re-JIT on restore).  Here the archive is a single ``.npz`` holding
every shard's tables plus a JSON metadata record; "re-JIT" is re-tracing —
executors are rebuilt from the tables on restore and XLA recompiles (and
caches) on first use, exactly like the reference regenerates ``spmv_fn``
from the saved ``id_map``.
"""

from __future__ import annotations

import json
from typing import Optional, Tuple

import numpy as np

from sparsex_tpu.csx import CsxMatrix
from sparsex_tpu.errors import ErrorCode, seterror
from sparsex_tpu.ops.exec import CsxExecutor
from sparsex_tpu.parallel.partition import RowPartition
from sparsex_tpu.preprocess.encodings import EncType
from sparsex_tpu.preprocess.tables import (
    BlockTable, CsxTables, DeltaTable, DiagTable, RunTable,
)

# v2: added per-table DIA occupancy masks, dvalues for symmetric archives
# and the partition/permutation arrays.  v1 archives predate the public
# release of those fields; restore rejects them with a clean error instead
# of a KeyError.
_MAGIC = "sparsex_tpu-csx-v2"
_OLD_MAGICS = ("sparsex_tpu-csx-v1",)


# --- layout (pages/route) serialization helpers -----------------------------
def _enc_tree(node, arrays: dict, prefix: str):
    """JSON-encodable structure with numpy leaves swapped for archive keys."""
    if node is None or isinstance(node, (bool, int, float, str)):
        return node
    if isinstance(node, np.ndarray):
        arrays[prefix] = node
        return {"__arr__": prefix}
    if isinstance(node, dict):
        return {"__dict__": {k: _enc_tree(v, arrays, f"{prefix}.{k}")
                             for k, v in node.items()}}
    if isinstance(node, (list, tuple)):
        return {"__list__" if isinstance(node, list) else "__tuple__":
                [_enc_tree(v, arrays, f"{prefix}.{i}")
                 for i, v in enumerate(node)]}
    raise TypeError(f"unserializable layout node: {type(node)}")


def _dec_tree(node, arrays: dict):
    if not isinstance(node, dict):
        return node
    if "__arr__" in node:
        return arrays[node["__arr__"]]
    if "__dict__" in node:
        return {k: _dec_tree(v, arrays) for k, v in node["__dict__"].items()}
    if "__list__" in node:
        return [_dec_tree(v, arrays) for v in node["__list__"]]
    if "__tuple__" in node:
        return tuple(_dec_tree(v, arrays) for v in node["__tuple__"])
    return node


def save_csx(mat: CsxMatrix, filename: str,
             permutation: Optional[np.ndarray] = None,
             include_layouts: bool = True) -> None:
    """``spx_mat_save`` parity (ref ``src/api/matvec.c:409``).

    ``include_layouts`` additionally archives each executor's built
    page/route layouts (building them if absent), so restore skips the
    planning cost entirely — the full realization of the reference's
    caching purpose (amortize preprocessing across runs,
    ``CsxSaveRestore.hpp``)."""
    arrays = {}
    meta = {
        "magic": _MAGIC,
        "nrows": mat.nrows,
        "ncols": mat.ncols,
        "nnz": mat.nnz,
        "symmetric": mat.symmetric,
        "nshards": len(mat.shards),
        "shards": [],
    }
    for i, t in enumerate(mat.shards):
        smeta = {
            "nrows": t.nrows, "ncols": t.ncols, "nnz": t.nnz,
            "row_start": t.row_start,
            "has_delta": t.delta is not None,
            "runs": [{"enc": int(r.enc), "delta": r.delta} for r in t.runs],
            "blocks": [{"enc": int(b.enc)} for b in t.blocks],
            "dias": [{"anti": d.anti, "nnz": d.nnz_count} for d in t.dias],
        }
        meta["shards"].append(smeta)
        if t.delta is not None:
            arrays[f"s{i}_d_rowptr"] = t.delta.rowptr
            arrays[f"s{i}_d_cols"] = t.delta.cols
            arrays[f"s{i}_d_vals"] = t.delta.vals
            arrays[f"s{i}_d_rowids"] = t.delta.row_ids
        for j, r in enumerate(t.runs):
            arrays[f"s{i}_r{j}_rows"] = r.rows
            arrays[f"s{i}_r{j}_cols"] = r.cols
            arrays[f"s{i}_r{j}_sizes"] = r.sizes
            arrays[f"s{i}_r{j}_vals"] = r.vals
        for j, b in enumerate(t.blocks):
            arrays[f"s{i}_b{j}_rows"] = b.rows
            arrays[f"s{i}_b{j}_cols"] = b.cols
            arrays[f"s{i}_b{j}_vals"] = b.vals
        for j, d in enumerate(t.dias):
            arrays[f"s{i}_g{j}_offsets"] = d.offsets
            arrays[f"s{i}_g{j}_vals"] = d.vals
            arrays[f"s{i}_g{j}_mask"] = np.packbits(d.mask, axis=None)
    if mat.symmetric:
        for i, dv in enumerate(getattr(mat, "dvalues", [])):
            arrays[f"s{i}_dvalues"] = dv
    if include_layouts and not mat.symmetric:
        layouts = []
        for i, ex in enumerate(mat.executors):
            ex._maybe_build_pages()  # host-only work; backend-independent
            if ex._pages_meta is None:
                layouts.append(None)
                continue
            layouts.append({
                "meta": _enc_tree(ex._pages_meta, arrays, f"s{i}_Lm"),
                "arrays": _enc_tree(ex._pages_arrays, arrays, f"s{i}_La"),
            })
        if any(l is not None for l in layouts):
            meta["layouts"] = layouts
    if permutation is not None:
        arrays["permutation"] = np.asarray(permutation)
    if mat.partition is not None:
        meta["partition"] = {
            "row_start": list(mat.partition.row_start),
            "row_end": list(mat.partition.row_end),
            "nnz": list(mat.partition.nnz_per_part),
        }
    arrays["meta"] = np.frombuffer(
        json.dumps(meta).encode("utf-8"), dtype=np.uint8)
    try:
        np.savez_compressed(filename, **arrays)
    except OSError as e:
        seterror(ErrorCode.SPX_ERR_FILE_WRITE, f"cannot write {filename}: {e}")


def restore_csx(filename: str) -> Tuple[CsxMatrix, Optional[np.ndarray]]:
    """``spx_mat_restore`` parity (ref ``src/api/matvec.c:427``)."""
    try:
        # np.savez_compressed appends ".npz" when missing; mirror that on
        # load so save/restore accept the same filename.
        import os
        if not os.path.exists(filename) and os.path.exists(filename + ".npz"):
            filename = filename + ".npz"
        with np.load(filename) as data:
            arrays = {k: data[k] for k in data.files}
    except OSError as e:
        seterror(ErrorCode.SPX_ERR_FILE_READ, f"cannot read {filename}: {e}")
    try:
        meta = json.loads(bytes(arrays["meta"]).decode("utf-8"))
        magic = meta["magic"]
    except Exception:
        seterror(ErrorCode.SPX_ERR_FILE_READ,
                 f"{filename} is not a sparsex_tpu CSX archive")
    if magic != _MAGIC:
        if magic in _OLD_MAGICS:
            seterror(ErrorCode.SPX_ERR_FILE_READ,
                     f"{filename} uses archive format '{magic}'; this "
                     f"build reads '{_MAGIC}' — re-save with mat_save")
        seterror(ErrorCode.SPX_ERR_FILE_READ,
                 f"{filename} is not a sparsex_tpu CSX archive")

    if meta["symmetric"]:
        from sparsex_tpu.symmetric import SymCsxMatrix
        mat = SymCsxMatrix(nrows=meta["nrows"], ncols=meta["ncols"],
                           nnz=meta["nnz"])
        try:
            mat.dvalues = [arrays[f"s{i}_dvalues"]
                           for i in range(meta["nshards"])]
        except KeyError:
            seterror(ErrorCode.SPX_ERR_FILE_READ,
                     f"{filename}: symmetric archive missing dvalues")
    else:
        mat = CsxMatrix(nrows=meta["nrows"], ncols=meta["ncols"],
                        nnz=meta["nnz"], symmetric=meta["symmetric"])
    for i, smeta in enumerate(meta["shards"]):
        delta = None
        if smeta["has_delta"]:
            delta = DeltaTable(
                rowptr=arrays[f"s{i}_d_rowptr"],
                cols=arrays[f"s{i}_d_cols"],
                vals=arrays[f"s{i}_d_vals"],
                row_ids=arrays[f"s{i}_d_rowids"],
            )
        runs = [RunTable(enc=EncType(rm["enc"]), delta=rm["delta"],
                         rows=arrays[f"s{i}_r{j}_rows"],
                         cols=arrays[f"s{i}_r{j}_cols"],
                         sizes=arrays[f"s{i}_r{j}_sizes"],
                         vals=arrays[f"s{i}_r{j}_vals"])
                for j, rm in enumerate(smeta["runs"])]
        blocks = [BlockTable(enc=EncType(bm["enc"]),
                             rows=arrays[f"s{i}_b{j}_rows"],
                             cols=arrays[f"s{i}_b{j}_cols"],
                             vals=arrays[f"s{i}_b{j}_vals"])
                  for j, bm in enumerate(smeta["blocks"])]
        dias = []
        for j, dm in enumerate(smeta.get("dias", [])):
            vals = arrays[f"s{i}_g{j}_vals"]
            mask = np.unpackbits(
                arrays[f"s{i}_g{j}_mask"],
                count=vals.size).reshape(vals.shape).astype(bool)
            dias.append(DiagTable(anti=dm["anti"],
                                  offsets=arrays[f"s{i}_g{j}_offsets"],
                                  vals=vals, mask=mask,
                                  nnz_count=dm["nnz"]))
        tables = CsxTables(nrows=smeta["nrows"], ncols=smeta["ncols"],
                           nnz=smeta["nnz"], row_start=smeta["row_start"],
                           delta=delta, runs=runs, blocks=blocks, dias=dias)
        mat.shards.append(tables)
        ex = CsxExecutor(tables)  # re-trace == re-JIT
        layouts = meta.get("layouts")
        if layouts and i < len(layouts) and layouts[i] is not None:
            ex._pages_meta = _dec_tree(layouts[i]["meta"], arrays)
            ex._pages_arrays = _dec_tree(layouts[i]["arrays"], arrays)
            ex._pages_tried = True  # planning cost fully amortized
        mat.executors.append(ex)
    if "partition" in meta:
        p = meta["partition"]
        mat.partition = RowPartition(
            nparts=len(p["row_start"]), row_start=p["row_start"],
            row_end=p["row_end"], nnz_per_part=p["nnz"])
    perm = arrays.get("permutation")
    return mat, perm
