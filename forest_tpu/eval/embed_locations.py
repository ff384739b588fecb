"""Embed point locations: coordinates CSV -> embedding columns CSV.

Behavioral contract from /root/reference/frl/training/embed_locations.py:1-80
(SURVEY.md §2.7, §4.5): map each input location to pixel coordinates, read a
patch around it, run the frozen encoder, and emit a CSV row with the split
label, ysfc, evt, and the x (raw feature) / z (embedding) / g (projection)
columns.

Coordinate handling: the reference uses pyproj + the zarr_builder YAML CRS;
pyproj is absent here, so the cube carries an affine ``geo_transform``
attr ``[x0, dx, y0, dy]`` (map = origin + pixel * step). Inputs may be
(row, col) pixels directly or (x, y) map coordinates.
"""
from __future__ import annotations

import csv
from pathlib import Path
from typing import Callable, Dict, List, Optional, Sequence

import jax.numpy as jnp
import numpy as np

from forest_tpu.data import checkerboard


def map_to_pixel(xs, ys, geo_transform) -> np.ndarray:
    """(x, y) map coords -> (row, col) via the affine [x0, dx, y0, dy]."""
    x0, dx, y0, dy = geo_transform
    col = np.round((np.asarray(xs) - x0) / dx).astype(np.int64)
    row = np.round((np.asarray(ys) - y0) / dy).astype(np.int64)
    return np.stack([row, col], axis=1)


def embed_locations(locations: np.ndarray, dataset, fb,
                    encode_type_fn: Callable,
                    encode_phase_fn: Optional[Callable] = None,
                    project_fn: Optional[Callable] = None,
                    patch_size: Optional[int] = None,
                    ysfc_source: str = "annual.ysfc",
                    evt_source: Optional[str] = None,
                    out_csv: Optional[str | Path] = None) -> List[Dict]:
    """locations: [N, 2] (row, col) pixel coords.

    Reads the patch containing each point, encodes it frozen, and collects
    per-point rows. Returns the row dicts (and writes CSV if requested).
    """
    p = patch_size or dataset.patch_size
    rows_out: List[Dict] = []
    # group points by containing patch to read each patch once
    by_patch: Dict[tuple, List[int]] = {}
    for i, (r, c) in enumerate(np.asarray(locations)):
        by_patch.setdefault((int(r) // p, int(c) // p), []).append(i)

    patch_origin = {(w.row_start // p, w.col_start // p): j
                    for j, w in enumerate(dataset.patches)}

    for (pr, pc), idxs in by_patch.items():
        j = patch_origin.get((pr, pc))
        if j is None:
            for i in idxs:
                rows_out.append({"index": i, "valid": 0})
            continue
        saved = dataset._current_indices
        dataset._current_indices = list(range(len(dataset.patches)))
        patch = {k: jnp.asarray(v)
                 for k, v in dataset.get_patch(j).items()}
        dataset._current_indices = saved
        batch = {k: v[None] for k, v in patch.items()}
        z_type = np.asarray(encode_type_fn(batch))[0]  # [H, W, zt]

        coords_local = np.asarray(
            [[int(locations[i][0]) - pr * p,
              int(locations[i][1]) - pc * p] for i in idxs])
        cj = jnp.asarray(coords_local)

        z_pts = z_type[coords_local[:, 0], coords_local[:, 1]]
        g_pts = (np.asarray(project_fn(jnp.asarray(z_pts)))
                 if project_fn else z_pts)
        zp_pts = None
        if encode_phase_fn is not None:
            zp_pts = np.asarray(encode_phase_fn(batch, cj))[0]  # [A,T,zp]

        gname, cname = ysfc_source.split(".")
        gc = fb.bindings.dataset[gname]
        ysfc = np.asarray(patch[gname])[..., gc.channel_index(cname)]
        evt = None
        if evt_source:
            eg, ec = evt_source.split(".")
            egc = fb.bindings.dataset[eg]
            evt = np.asarray(patch[eg])[..., egc.channel_index(ec)]

        for n, i in enumerate(idxs):
            r, c = coords_local[n]
            split = checkerboard.split_code(
                pr * p, pc * p, p, dataset.split_block_size)
            row: Dict = {
                "index": i, "valid": 1,
                "row": int(locations[i][0]), "col": int(locations[i][1]),
                "split": {1: "train", 2: "val", 3: "test"}[int(split)],
            }
            if ysfc.ndim == 3:
                row["ysfc"] = float(ysfc[-1, r, c])
            else:
                row["ysfc"] = float(ysfc[r, c])
            if evt is not None:
                row["evt"] = int(evt[r, c]) if np.isfinite(evt[r, c]) \
                    else -1
            for d, v in enumerate(z_pts[n]):
                row[f"z{d}"] = float(v)
            for d, v in enumerate(np.asarray(g_pts)[n]):
                row[f"g{d}"] = float(v)
            if zp_pts is not None:
                for d, v in enumerate(zp_pts[n, -1]):
                    row[f"zp{d}"] = float(v)
            rows_out.append(row)

    rows_out.sort(key=lambda r: r["index"])
    if out_csv:
        keys: List[str] = []
        for r in rows_out:
            for k in r:
                if k not in keys:
                    keys.append(k)
        with open(out_csv, "w", newline="") as f:
            w = csv.DictWriter(f, fieldnames=keys)
            w.writeheader()
            w.writerows(rows_out)
    return rows_out


__all__ = ["embed_locations", "map_to_pixel"]
