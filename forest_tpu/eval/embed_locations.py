"""Embed point locations: coordinates CSV -> embedding columns CSV.

Behavioral contract from /root/reference/frl/training/embed_locations.py:1-24
(SURVEY.md §2.7, §4.5): map each input location to pixel coordinates, read
the patch around it, run the frozen encoder, and emit one CSV row per point
with the full reference column families:

  pixel_row, pixel_col         zarr pixel coordinates
  split                        train/val/test (checkerboard partition)
  ysfc                         years-since-fast-change at the point's year
  evt                          EVT code (or -1)
  x_type_0..x_type_{C-1}       normalized type-encoder inputs at the pixel
  x_phase_0..x_phase_{C-1}     normalized phase inputs at the pixel + year
  z_type_0..z_type_{zt-1}      type embedding
  z_phase_0..z_phase_{zp-1}    phase embedding at the point's year
  g_type_0..g_type_{P-1}       projected type embedding (SimCLR g(h))

Coordinate handling: the reference uses pyproj + the zarr_builder YAML CRS;
pyproj is absent here, so the cube carries an affine ``geo_transform``
attr ``[x0, dx, y0, dy]`` (map = origin + pixel * step). Inputs may be
(row, col) pixels directly or (x, y) map coordinates. Per-point years map
to timestep indices through the dataset's year axis; points without a year
use the final timestep.

Run: python -m forest_tpu.eval.embed_locations --locations pts.csv \
        --checkpoint CKPT --bindings B.yaml --output emb.csv
"""
from __future__ import annotations

import argparse
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
                    type_feature: str = "type_encoder_input",
                    phase_feature: str = "phase_ccdc",
                    years: Optional[Sequence] = None,
                    out_csv: Optional[str | Path] = None) -> List[Dict]:
    """locations: [N, 2] (row, col) pixel coords; ``years``: optional
    per-point year (mapped to a timestep index; default last timestep).

    Reads the patch containing each point, encodes it frozen, and collects
    per-point rows with the reference column families (module docstring).
    Returns the row dicts (and writes CSV if requested).
    """
    p = patch_size or dataset.patch_size
    t_count = None
    # The patch T axis is the CONFIG time window: frl_dataset NaN-pads each
    # loaded year to temporal_window.year_to_index(year), so per-point years
    # must map through the window, not through the loaded-years positions
    # (cube years may be non-contiguous or start after the window).
    t_window = getattr(dataset, "temporal_window", None)
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
        x_type, _ = fb.build_feature(type_feature, batch)
        x_type = np.asarray(x_type)[0]                 # [H, W, C]
        x_phase, _ = fb.build_feature(phase_feature, batch)
        x_phase = np.asarray(x_phase)[0]               # [T, H, W, C]
        t_count = x_phase.shape[0]

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
            # point year -> timestep index (reference maps MEASYEAR into
            # the config time window; default = final timestep). Years
            # outside the window keep the default; in-window years missing
            # from the cube land on their NaN-padded slot.
            ti = t_count - 1
            if years is not None and years[i] is not None \
                    and t_window is not None:
                yr = int(years[i])
                if t_window.start_year <= yr <= t_window.end_year:
                    ti = min(t_window.year_to_index(yr), t_count - 1)
            split = checkerboard.split_code(
                pr * p, pc * p, p, dataset.split_block_size)
            row: Dict = {
                "index": i, "valid": 1,
                "pixel_row": int(locations[i][0]),
                "pixel_col": int(locations[i][1]),
                "split": {1: "train", 2: "val", 3: "test"}[int(split)],
            }
            if ysfc.ndim == 3:
                row["ysfc"] = float(ysfc[ti, r, c])
            else:
                row["ysfc"] = float(ysfc[r, c])
            if evt is not None:
                row["evt"] = int(evt[r, c]) if np.isfinite(evt[r, c]) \
                    else -1
            for d, v in enumerate(x_type[r, c]):
                row[f"x_type_{d}"] = float(v)
            for d, v in enumerate(x_phase[ti, r, c]):
                row[f"x_phase_{d}"] = float(v)
            for d, v in enumerate(z_pts[n]):
                row[f"z_type_{d}"] = float(v)
            if zp_pts is not None:
                for d, v in enumerate(zp_pts[n, ti]):
                    row[f"z_phase_{d}"] = float(v)
            for d, v in enumerate(np.asarray(g_pts)[n]):
                row[f"g_type_{d}"] = float(v)
            rows_out.append(row)

    rows_out.sort(key=lambda r: r["index"])
    if out_csv:
        write_rows_csv(rows_out, out_csv)
    return rows_out


def write_rows_csv(rows: List[Dict], out_csv: str | Path) -> None:
    keys: List[str] = []
    for r in rows:
        for k in r:
            if k not in keys:
                keys.append(k)
    with open(out_csv, "w", newline="") as f:
        w = csv.DictWriter(f, fieldnames=keys, restval="")
        w.writeheader()
        w.writerows(rows)


def main(argv=None):
    from forest_tpu.data.bindings import parse_bindings
    from forest_tpu.data.feature_builder import FeatureBuilder
    from forest_tpu.data.frl_dataset import ForestDatasetV2
    from forest_tpu.eval import frozen

    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--locations", required=True,
                    help="CSV with row,col[,year] or x,y[,year] columns")
    ap.add_argument("--checkpoint", required=True)
    ap.add_argument("--bindings", required=True)
    ap.add_argument("--output", required=True)
    ap.add_argument("--patch-size", type=int, default=128)
    ap.add_argument("--split-block-size", type=int, nargs=2, default=(4, 4))
    ap.add_argument("--map-coords", action="store_true",
                    help="locations are map x,y (uses the cube's "
                         "geo_transform attr)")
    ap.add_argument("--ysfc-source", default="annual.ysfc")
    ap.add_argument("--evt-source", default=None)
    a = ap.parse_args(argv)

    bindings = parse_bindings(a.bindings)
    fb = FeatureBuilder(bindings)
    ds = ForestDatasetV2(bindings, split=None, patch_size=a.patch_size,
                         split_block_size=tuple(a.split_block_size),
                         min_aoi=0.0)
    model, params = frozen.load_frozen_model(a.checkpoint)
    enc_t, enc_p, proj = frozen.make_encode_fns(model, params, fb)

    with open(a.locations) as f:
        rd = csv.DictReader(f)
        cols = [c.lower() for c in rd.fieldnames or []]
        pts, years = [], []
        for rec in rd:
            rec = {k.lower(): v for k, v in rec.items()}
            if a.map_coords:
                pts.append((float(rec["x"]), float(rec["y"])))
            else:
                pts.append((int(rec["row"]), int(rec["col"])))
            years.append(int(rec["year"]) if rec.get("year") else None)
    locs = np.asarray(pts)
    if a.map_coords:
        gt = ds.root.attrs.get("geo_transform")
        if gt is None:
            raise SystemExit("--map-coords needs a geo_transform cube attr")
        locs = map_to_pixel(locs[:, 0], locs[:, 1], gt)

    rows = embed_locations(
        locs, ds, fb, enc_t, enc_p, proj, ysfc_source=a.ysfc_source,
        evt_source=a.evt_source, years=years, out_csv=a.output)
    n_ok = sum(r.get("valid", 0) for r in rows)
    print(f"wrote {a.output}: {n_ok}/{len(rows)} points embedded")


if __name__ == "__main__":
    main()


__all__ = ["embed_locations", "map_to_pixel", "write_rows_csv", "main"]
