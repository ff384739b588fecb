"""Hierarchical (v2) zarr cube: layout + synthetic fixture + test bindings.

Layout contract from /root/reference/frl/zarr_structure.txt:1-30 and
zarr_builder/va_vae_dataset_test.yaml:52-70 (SURVEY.md §1):

  cube.zarr/
    annual/<group>/{data,mask,quality}/<band>   [T, H, W]  (chunks (1, cy, cx))
    static/<group>/{data,mask}/<band>           [H, W]
    aoi                                         [H, W] uint8
    attrs: time_coords (years), per-band attrs

:func:`build_synthetic_v2_cube` generates a forest-like cube with the band
families the FRL bindings reference (topo statics, CCDC history statics,
annual spectral series, ysfc disturbance ages, EVT categorical), structured
by latent forest types + disturbance events so phase losses have real signal.
:func:`synthetic_bindings` returns a matching bindings dict.
"""
from __future__ import annotations

from pathlib import Path
from typing import Dict, Sequence, Tuple

import numpy as np

from forest_tpu.data import zarrlite as zl


def create_band(root: zl.ZarrGroup, path: str, shape, chunks, dtype,
                fill=float("nan")) -> zl.ZarrArray:
    parts = path.split("/")
    g = root
    for p in parts[:-1]:
        sub = g.path / p
        g = zl.ZarrGroup(sub) if (sub / ".zgroup").exists() \
            else g.create_group(p)
    return g.create_array(parts[-1], shape, chunks, dtype, fill_value=fill)


def build_cube_for_bindings(bindings, path: str | Path, height: int = 128,
                            width: int = 128, chunk_yx: int = 64,
                            seed: int = 0) -> zl.ZarrGroup:
    """Synthesize a cube containing EVERY source array a bindings config
    references, shaped for its dataset groups -- so an UNMODIFIED
    reference bindings YAML (e.g. /root/reference/frl/config/
    frl_binding_v1.yaml) can drive the full training path end-to-end on
    synthetic data (the verbatim-config migration demo).

    Field realism follows build_synthetic_v2_cube: latent type blobs +
    per-pixel disturbance events so ysfc series carry real recovery
    structure, spectral bands modulated by type + recovery, masks/quality
    channels passing their ``ok_if`` ~95% of the time, ``fill_value``
    planted in a small fraction of pixels of channels that declare one.

    ``bindings``: a parsed BindingsConfig (parse with ZARR_ROOT pointing
    at the target directory) or a dict/path parse_bindings accepts.
    """
    from forest_tpu.data.bindings import BindingsConfig, parse_bindings

    if not isinstance(bindings, BindingsConfig):
        bindings = parse_bindings(bindings)
    rng = np.random.default_rng(seed)

    tw = bindings.time_window
    years = (list(range(tw.start, tw.end + 1)) if tw.num_years > 1
             else list(range(2010, 2025)))
    explicit_years = {ch.year for g in bindings.dataset.values()
                      for ch in g.channels if ch.year is not None}
    years = sorted(set(years) | explicit_years)
    t = len(years)

    root = zl.create_group(path)
    root.attrs["time_coords"] = [int(y) for y in years]
    root.write_attrs()
    ch2 = (min(chunk_yx, height), min(chunk_yx, width))
    ch3 = (1,) + ch2

    # Shared latent structure (types + disturbance ages) for realism.
    f = rng.normal(size=(8, height // 8 + 2, width // 8 + 2))
    type_map = np.kron(f, np.ones((1, 8, 8)))[:, :height, :width].argmax(0)
    dist_year = np.where(rng.random((height, width)) < 0.6,
                         rng.integers(years[0] - 20, years[-1],
                                      size=(height, width)), -9999)
    yy = np.asarray(years)[:, None, None]
    ysfc3 = np.clip(np.where(dist_year[None] > 0, yy - dist_year[None], 30),
                    0, 40).astype(np.float32)
    base = rng.uniform(0.3, 0.9, 8)[type_map]
    rec = 1.0 - np.exp(-ysfc3 / 7.0)

    # source path -> needs time axis? (group temporal OR year/reducer pull)
    sources: Dict[str, Dict] = {}
    for g in bindings.dataset.values():
        for ch in g.channels:
            if not ch.source:
                continue
            ent = sources.setdefault(
                ch.source, {"temporal": False, "ok_if": None, "fill": None,
                            "name": ch.name})
            if g.temporal or ch.year is not None or ch.reducer is not None:
                ent["temporal"] = True
            if ch.ok_if is not None:
                ent["ok_if"] = ch.ok_if
            if ch.fill_value is not None:
                ent["fill"] = ch.fill_value

    def synth(src: str, ent: Dict, shape) -> np.ndarray:
        name = (ent["name"] or "") + " " + src
        low = name.lower()
        if ent["ok_if"] is not None:
            # quality/mask channel: pass ok_if ~95% of the time. Pass/fail
            # values chosen per-op so strict ops ('>'/'<') and '!=' behave
            # (the threshold value itself FAILS those).
            v = float(ent["ok_if"].value)
            pass_val, fail_val = {
                ">=": (v, v - 1.0), ">": (v + 1.0, v),
                "<=": (v, v + 1.0), "<": (v - 1.0, v),
                "==": (v, v + 1.0), "!=": (v + 1.0, v),
            }[ent["ok_if"].op]
            bad = rng.random(shape) < 0.05
            return np.where(bad, fail_val, pass_val).astype(np.float32)
        if "/mask/" in src or low.endswith("_mask"):
            m = (rng.random(shape) > 0.03).astype(np.float32)
            return m
        if "ysfc" in low:
            arr = ysfc3 if len(shape) == 3 else ysfc3[-1]
            return np.broadcast_to(arr, shape).astype(np.float32).copy()
        if "aoi" in low:
            a = np.ones(shape, np.float32)
            a[..., :, :max(width // 16, 1)] = 0.0
            return a
        # generic continuous band: type base + recovery + noise, scaled
        scale = rng.uniform(0.5, 2.0)
        offset = rng.uniform(-0.2, 0.2)
        noise = rng.normal(scale=0.05, size=shape)
        sig = (base * rec + noise) if len(shape) == 3 \
            else (base * rec[-1] + noise)
        return (scale * sig + offset).astype(np.float32)

    for src, ent in sorted(sources.items()):
        shape = (t, height, width) if ent["temporal"] else (height, width)
        chunks = ch3 if ent["temporal"] else ch2
        data = synth(src, ent, shape)
        if ent["fill"] is not None:
            holes = rng.random(shape) < 0.01
            data = np.where(holes, np.float32(ent["fill"]), data)
        arr = create_band(root, src, shape, chunks, np.float32)
        arr[:] = data

    if "aoi" not in sources:
        a = root.create_array("aoi", (height, width), ch2, np.uint8,
                              fill_value=0)
        aoi = np.ones((height, width), np.uint8)
        aoi[:, :max(width // 16, 1)] = 0
        a[:] = aoi
    return root


def build_synthetic_v2_cube(path: str | Path, height: int = 128,
                            width: int = 128,
                            years: Sequence[int] = tuple(range(2010, 2025)),
                            chunk_yx: int = 64, n_types: int = 8,
                            seed: int = 0) -> zl.ZarrGroup:
    rng = np.random.default_rng(seed)
    t = len(years)
    root = zl.create_group(path)
    root.attrs["time_coords"] = [int(y) for y in years]
    root.write_attrs()
    ch2 = (chunk_yx, chunk_yx)
    ch3 = (1, chunk_yx, chunk_yx)

    # Latent type field (smoothed blobs).
    f = rng.normal(size=(n_types, height // 8 + 2, width // 8 + 2))
    up = np.kron(f, np.ones((1, 8, 8)))[:, :height, :width]
    type_map = up.argmax(0)                          # [H, W]

    # Disturbance events: per-pixel random disturbance year (or none).
    dist_year = np.where(rng.random((height, width)) < 0.5,
                         rng.integers(years[0] - 20, years[-1],
                                      size=(height, width)), -9999)
    yy = np.asarray(years)[:, None, None]
    ysfc = np.where(dist_year[None] > 0, yy - dist_year[None], 30)
    ysfc = np.clip(ysfc, -1, 40).astype(np.float32)
    ysfc[ysfc < 0] = 30  # pre-disturbance: treat as old

    # Annual spectral series: type base + recovery curve after disturbance.
    base_ndvi = rng.uniform(0.3, 0.9, n_types)[type_map]
    rec = 1.0 - np.exp(-np.maximum(ysfc, 0) / 7.0)     # recovery 0->1
    noise = rng.normal(scale=0.03, size=(t, height, width))
    ndvi = (base_ndvi[None] * rec + noise).astype(np.float32)
    nbr = (base_ndvi[None] * rec * 0.8 + 0.05
           + rng.normal(scale=0.03, size=(t, height, width))
           ).astype(np.float32)

    # Static topo + CCDC-history summaries.
    elevation = np.kron(rng.normal(300, 100, (height // 8 + 1,
                                              width // 8 + 1)),
                        np.ones((8, 8)))[:height, :width].astype(np.float32)
    slope = np.abs(np.gradient(elevation)[0]).astype(np.float32)
    mean_ndvi = ndvi.mean(0)
    var_ndvi = ndvi.var(0).astype(np.float32)

    evt_codes = np.sort(rng.choice(np.arange(7000, 7900), n_types,
                                   replace=False))
    evt = evt_codes[type_map].astype(np.int16)

    aoi = np.ones((height, width), np.uint8)
    aoi[:, :width // 16] = 0
    forest = (mean_ndvi > 0.35).astype(np.float32)

    def put2(p, data, dtype=np.float32, fill=float("nan")):
        a = create_band(root, p, (height, width), ch2, dtype, fill)
        a[:] = data.astype(dtype)

    def put3(p, data, dtype=np.float32, fill=float("nan")):
        a = create_band(root, p, (t, height, width), ch3, dtype, fill)
        a[:] = data.astype(dtype)

    a = root.create_array("aoi", (height, width), ch2, np.uint8,
                          fill_value=0)
    a[:] = aoi

    put2("static/topo/data/elevation", elevation)
    put2("static/topo/data/slope", slope)
    put2("static/topo/mask/dem_mask", np.ones((height, width)), np.uint8, 0)
    put2("static/ccdc/data/mean_ndvi", mean_ndvi)
    put2("static/ccdc/data/variance_ndvi", var_ndvi)
    put2("static/evt/data/evt", evt, np.int16, -1)
    put2("static/lcms/data/forest", forest)

    miss = rng.random((t, height, width)) < 0.02
    ndvi_m = ndvi.copy()
    ndvi_m[miss] = np.nan
    put3("annual/ccdc/data/ndvi", ndvi_m)
    put3("annual/ccdc/data/nbr", nbr)
    put3("annual/ccdc/mask/ok", (~miss).astype(np.uint8), np.uint8, 0)
    put3("annual/lcms/data/ysfc", ysfc)

    return root


def synthetic_bindings(zarr_path: str | Path, stats_file: str | Path,
                       start: int = 2010, end: int = 2024) -> Dict:
    """A bindings dict matching :func:`build_synthetic_v2_cube` -- the test
    analogue of frl_binding_v1.yaml (groups, features with whitening,
    sampling strategies, losses)."""
    return {
        "version": "1.0",
        "name": "synthetic_v2",
        "zarr": {"path": str(zarr_path), "structure": "hierarchical"},
        "time_window": {"start": start, "end": end},
        "stats": {
            "compute": "if-not-exists",
            "file": str(stats_file),
            "stats": ["mean", "sd", "min", "max", "q02", "q25", "q50",
                      "q75", "q98"],
            "covariance": True,
            "samples": {"n": 8, "reservoir_size": 100_000},
            "mask": ["static_mask.aoi"],
        },
        "dataset": {
            "static_mask": {
                "type": "uint8", "dim": ["C", "H", "W"],
                "channels": [
                    {"name": "aoi", "source": "aoi"},
                    {"name": "dem_mask",
                     "source": "static/topo/mask/dem_mask"},
                    {"name": "forest",
                     "source": "static/lcms/data/forest",
                     "ok_if": {"op": ">=", "value": 0.5}},
                ],
            },
            "annual_mask": {
                "type": "uint8", "dim": ["C", "T", "H", "W"],
                "channels": [
                    {"name": "ccdc_ok", "source": "annual/ccdc/mask/ok",
                     "ok_if": {"op": ">=", "value": 1}},
                ],
            },
            "static": {
                "type": "float32", "dim": ["C", "H", "W"],
                "channels": [
                    {"name": "elevation",
                     "source": "static/topo/data/elevation"},
                    {"name": "slope", "source": "static/topo/data/slope"},
                    {"name": "mean_ndvi",
                     "source": "static/ccdc/data/mean_ndvi"},
                    {"name": "variance_ndvi",
                     "source": "static/ccdc/data/variance_ndvi"},
                ],
            },
            "static_categorical": {
                "type": "int16", "dim": ["C", "H", "W"],
                "channels": [
                    {"name": "evt", "source": "static/evt/data/evt",
                     "fill_value": -1},
                ],
            },
            "annual": {
                "type": "float32", "dim": ["C", "T", "H", "W"],
                "channels": [
                    {"name": "ndvi", "source": "annual/ccdc/data/ndvi"},
                    {"name": "nbr", "source": "annual/ccdc/data/nbr"},
                    {"name": "ysfc", "source": "annual/lcms/data/ysfc"},
                    {"name": "tpos", "formula": "temporal_position"},
                ],
            },
        },
        "features": {
            "type_encoder_input": {
                "dim": ["C", "H", "W"],
                "channels": {
                    "static.elevation": {"mask": "static_mask.dem_mask",
                                         "norm": "zscore"},
                    "static.slope": {"mask": "static_mask.dem_mask",
                                     "norm": "zscore"},
                    "static.mean_ndvi": {"norm": "robust_iqr"},
                    "static.variance_ndvi": {"norm": "robust_iqr"},
                },
            },
            "infonce_type_spectral": {
                "dim": ["C", "H", "W"],
                "channels": {
                    "static.mean_ndvi": {"norm": "zscore"},
                    "static.variance_ndvi": {"norm": "zscore"},
                },
                "covariance": {"calculate": True, "stat_domain": "patch"},
            },
            "phase_ccdc": {
                "dim": ["C", "T", "H", "W"],
                "channels": {
                    "annual.ndvi": {"mask": "annual_mask.ccdc_ok",
                                    "norm": "zscore"},
                    "annual.nbr": {"norm": "zscore"},
                    "annual.tpos": {"norm": "identity"},
                },
                "covariance": {"calculate": True, "stat_domain": "patch"},
            },
            "ysfc": {
                "dim": ["C", "T", "H", "W"],
                "channels": {"annual.ysfc": {"norm": "identity"}},
            },
        },
        "sampling-strategy": {
            "grid": {"stride": 8, "exclude_border": 4,
                     "jitter": {"radius": 2}},
            "grid-plus-supplement": {
                "grid": {"stride": 8, "exclude_border": 4,
                         "jitter": {"radius": 2}},
                "supplement": {"n": 16, "sampling": {
                    "type": "weighted",
                    "weight_by": ["static_mask.aoi", "static_mask.forest"],
                }},
            },
        },
        "losses": {
            "infonce_type_spatial": {
                "type": "infonce", "feature": "infonce_type_spectral",
                "sampling_strategy": "grid-plus-supplement",
                "temperature": 0.2, "similarity": "l2",
                "knn_k": 4, "knn_max_radius": 8,
                "neg_min_distance": 16.0, "neg_per_anchor": 4,
                "spectral_sigma": 2.0,
            },
            "phase_neighborhood": {
                "type": "phase_neighborhood", "feature": "phase_ccdc",
                "ysfc_feature": "ysfc", "k": 8, "min_overlap": 2,
                "min_pairs": 2, "sigma": 5.0, "tau_ref": 0.1,
                "tau_learned": 0.1,
            },
        },
    }


def synthetic_feature_stats(bindings) -> Dict:
    """Handcrafted stats for :func:`synthetic_bindings` features -- used by
    dry runs / benches that never touch a real cube (shared by
    __graft_entry__ and scripts/bench_frl_step)."""
    stats: Dict = {}
    for fname, fc in bindings.features.items():
        stats[fname] = {ref: {"mean": 0.0, "sd": 1.0, "q25": -0.5,
                              "q50": 0.0, "q75": 0.5, "min": -3.0,
                              "max": 3.0} for ref in fc.channels}
        if fc.covariance.calculate:
            d = len(fc.channels)
            stats[fname]["__covariance__"] = {
                "matrix": np.eye(d).tolist(),
                "mean": np.zeros(d).tolist(), "n": 100.0,
                "stat_domain": fc.covariance.stat_domain}
    return stats


def synthetic_frl_batch(rng, b: int, hw: int, t: int = 15) -> Dict:
    """In-memory group batch matching :func:`synthetic_bindings`'s dataset
    groups (numpy; callers jnp-ify)."""
    return {
        "static_mask": (rng.random((b, hw, hw, 3)) > 0.1
                        ).astype(np.float32),
        "annual_mask": (rng.random((b, t, hw, hw, 1)) > 0.05
                        ).astype(np.float32),
        "static": rng.normal(size=(b, hw, hw, 4)).astype(np.float32),
        "static_categorical": rng.choice(
            [7001, 7002, 7003], size=(b, hw, hw, 1)).astype(np.float32),
        "annual": np.concatenate([
            rng.normal(size=(b, t, hw, hw, 2)),
            rng.integers(0, 20, size=(b, t, hw, hw, 1)).astype(float),
            np.broadcast_to(
                (np.arange(t) / (t - 1))[None, :, None, None, None],
                (b, t, hw, hw, 1))], axis=-1).astype(np.float32),
        "__window__": np.zeros((b, 2), np.int32),
    }


def main(argv=None):
    """CLI: generate a synthetic cube + matching bindings YAML (and stats).

    python -m forest_tpu.data.cube_v2 OUT_DIR [--height H] [--width W]
        [--stats]
    """
    import argparse

    import yaml

    ap = argparse.ArgumentParser(description=main.__doc__)
    ap.add_argument("out_dir")
    ap.add_argument("--height", type=int, default=512)
    ap.add_argument("--width", type=int, default=512)
    ap.add_argument("--chunk", type=int, default=256)
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--stats", action="store_true",
                    help="also compute the stats JSON")
    a = ap.parse_args(argv)
    out = Path(a.out_dir)
    out.mkdir(parents=True, exist_ok=True)
    build_synthetic_v2_cube(out / "cube.zarr", a.height, a.width,
                            chunk_yx=a.chunk, seed=a.seed)
    b = synthetic_bindings(out / "cube.zarr", out / "stats.json")
    (out / "bindings.yaml").write_text(yaml.safe_dump(b))
    print(f"wrote {out}/cube.zarr and bindings.yaml")
    if a.stats:
        from forest_tpu.data.bindings import parse_bindings
        from forest_tpu.data.frl_dataset import ForestDatasetV2
        from forest_tpu.data.stats import StatsCalculator

        bindings = parse_bindings(b)
        ds = ForestDatasetV2(bindings, split=None,
                             patch_size=min(256, a.height),
                             split_block_size=(1, 1))
        StatsCalculator(bindings, ds).compute_and_save()
        print(f"wrote {out}/stats.json")


if __name__ == "__main__":
    main()


__all__ = ["build_synthetic_v2_cube", "synthetic_bindings", "create_band"]
