"""Dataset + feature-builder walkthrough on a synthetic cube.

The forest-tpu analogue of the reference's dataset/feature-builder/
normalization demos (SURVEY.md §2.8).

Run: python examples/example_dataset.py
"""
import tempfile
from pathlib import Path

import numpy as np


def main():
    import jax.numpy as jnp

    from forest_tpu.data.bindings import parse_bindings
    from forest_tpu.data.cube_v2 import (build_synthetic_v2_cube,
                                         synthetic_bindings)
    from forest_tpu.data.feature_builder import FeatureBuilder
    from forest_tpu.data.frl_dataset import ForestDatasetV2
    from forest_tpu.data.stats import StatsCalculator
    from forest_tpu.data.zarr_info import summarize

    td = Path(tempfile.mkdtemp())
    build_synthetic_v2_cube(td / "cube.zarr", height=96, width=96,
                            chunk_yx=32)
    print("== cube ==")
    print(summarize(td / "cube.zarr").split("files:")[0])

    bindings = parse_bindings(synthetic_bindings(td / "cube.zarr",
                                                 td / "stats.json"))
    print("== dataset ==")
    for split in ("train", "val", "test"):
        ds = ForestDatasetV2(bindings, split=split, patch_size=32,
                             split_block_size=(1, 1))
        print(f"  {split}: {len(ds.patches)} patches")

    ds = ForestDatasetV2(bindings, split=None, patch_size=32,
                         split_block_size=(1, 1))
    patch = ds.get_patch(0)
    print("  groups:", {k: v.shape for k, v in patch.items()
                        if not k.startswith('__')})

    print("== stats ==")
    stats = StatsCalculator(bindings, ds).compute(n_patches=4)
    e = stats["type_encoder_input"]["static.elevation"]
    print(f"  elevation: mean={e['mean']:.1f} sd={e['sd']:.1f} "
          f"q50={e['q50']:.1f}")

    print("== features ==")
    fb = FeatureBuilder(bindings, stats)
    x, mask = fb.build_feature("type_encoder_input", patch)
    print(f"  type_encoder_input: {x.shape}, "
          f"{float(jnp.mean(mask)) * 100:.0f}% valid")
    px, _ = fb.build_feature("phase_ccdc", patch)
    print(f"  phase_ccdc (whitened): {px.shape}, "
          f"|max|={float(jnp.abs(px).max()):.2f} (clip 5)")
    coords = jnp.asarray([[8, 8], [16, 24]])
    loc, _ = fb.build_feature_at_locations("phase_ccdc", patch, coords)
    full_at = np.stack([np.asarray(px[:, r, c])
                        for r, c in np.asarray(coords)])
    print(f"  at-locations == full grid: "
          f"{np.allclose(np.asarray(loc), full_at, atol=1e-6)}")


if __name__ == "__main__":
    main()
