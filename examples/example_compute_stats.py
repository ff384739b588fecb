"""REQUIRED pipeline step: compute the stats JSON for a bindings config.

The forest-tpu equivalent of /root/reference/frl/examples/
example_compute_stats.py (SURVEY.md §2.8 -- "a required pipeline step"):
run AFTER building a cube and BEFORE training so FeatureBuilder has its
normalization stats + whitening covariances.

Usage:
  python examples/example_compute_stats.py --bindings B.yaml \
      [--patch-size 256] [--n-patches 500]

With no --bindings it demos the full flow on a synthetic cube in a temp dir.
"""
import argparse
import tempfile
from pathlib import Path


def main(argv=None):
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--bindings", default=None)
    ap.add_argument("--patch-size", type=int, default=256)
    ap.add_argument("--n-patches", type=int, default=None)
    a = ap.parse_args(argv)

    from forest_tpu.data.bindings import parse_bindings
    from forest_tpu.data.frl_dataset import ForestDatasetV2
    from forest_tpu.data.stats import StatsCalculator

    if a.bindings:
        bindings = parse_bindings(a.bindings)
        patch = a.patch_size
    else:
        import yaml

        from forest_tpu.data.cube_v2 import (build_synthetic_v2_cube,
                                             synthetic_bindings)
        td = Path(tempfile.mkdtemp())
        print(f"[demo] building synthetic cube in {td}")
        build_synthetic_v2_cube(td / "cube.zarr", height=96, width=96,
                                chunk_yx=32)
        bindings = parse_bindings(synthetic_bindings(td / "cube.zarr",
                                                     td / "stats.json"))
        patch = 32

    ds = ForestDatasetV2(bindings, split=None, patch_size=patch,
                         split_block_size=(1, 1))
    calc = StatsCalculator(bindings, ds)
    out = calc.compute_and_save(a.n_patches)
    print(f"wrote {out}")
    import json
    stats = json.loads(Path(out).read_text())
    for fname, entries in stats.items():
        chans = [k for k in entries if not k.startswith("__")]
        cov = "with covariance" if "__covariance__" in entries else ""
        print(f"  {fname}: {len(chans)} channels {cov}")


if __name__ == "__main__":
    main()
