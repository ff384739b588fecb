"""Figure sheets: test-patch probes and forest diagnostics.

Behavioral contracts (SURVEY.md §2.7):
- visualize_test_patches (/root/reference/frl/training/
  visualize_test_patches.py): per-patch sheets of probe predictions vs
  targets over test-split patches;
- visualize_forest_diagnostics (visualize_forest_diagnostics.py): smoothing
  gate maps + embedding-structure panels.

Matplotlib Agg backend; every function returns the saved figure paths.
"""
from __future__ import annotations

from pathlib import Path
from typing import Callable, List, Optional

import matplotlib

matplotlib.use("Agg")
import matplotlib.pyplot as plt  # noqa: E402
import numpy as np  # noqa: E402


def _pca_rgb(z: np.ndarray) -> np.ndarray:
    """[H, W, D] -> [H, W, 3] PCA false-color."""
    h, w, d = z.shape
    flat = z.reshape(-1, d)
    mu = flat.mean(0)
    c = np.cov((flat - mu).T)
    _, vec = np.linalg.eigh(c)
    proj = (flat - mu) @ vec[:, -3:]
    lo, hi = np.percentile(proj, 2, 0), np.percentile(proj, 98, 0)
    rgb = np.clip((proj - lo) / np.maximum(hi - lo, 1e-9), 0, 1)
    return rgb.reshape(h, w, 3)


def visualize_test_patches(encode_fn: Callable, fb, dataset,
                           target_feature: str,
                           probe_weights: Optional[np.ndarray],
                           out_dir: str | Path, n_patches: int = 4,
                           ) -> List[Path]:
    """Sheets: target channels vs probe predictions + z_type PCA-RGB."""
    import jax.numpy as jnp

    out_dir = Path(out_dir)
    out_dir.mkdir(parents=True, exist_ok=True)
    paths = []
    for i in range(min(n_patches, len(dataset))):
        batch = {k: jnp.asarray(v)
                 for k, v in dataset.load_batch([i]).items()}
        z = np.asarray(encode_fn(batch))[0]             # [H, W, D]
        y, ym = fb.build_feature(target_feature, batch)
        y = np.asarray(y)[0]
        k = min(y.shape[-1], 3)
        cols = 1 + k * (2 if probe_weights is not None else 1)
        fig, axes = plt.subplots(1, cols, figsize=(3 * cols, 3.2))
        axes = np.atleast_1d(axes)
        axes[0].imshow(_pca_rgb(z))
        axes[0].set_title("z_type (PCA rgb)")
        pred = None
        if probe_weights is not None:
            pred = (z.reshape(-1, z.shape[-1]) @ probe_weights[:-1]
                    + probe_weights[-1]).reshape(y.shape)
        for c in range(k):
            ax = axes[1 + c * (2 if pred is not None else 1)]
            im = ax.imshow(y[..., c])
            ax.set_title(f"target[{c}]")
            plt.colorbar(im, ax=ax, fraction=0.046)
            if pred is not None:
                ax2 = axes[2 + c * 2]
                im2 = ax2.imshow(pred[..., c], vmin=y[..., c].min(),
                                 vmax=y[..., c].max())
                ax2.set_title(f"probe pred[{c}]")
                plt.colorbar(im2, ax=ax2, fraction=0.046)
        for ax in axes:
            ax.set_xticks([])
            ax.set_yticks([])
        p = out_dir / f"test_patch_{i:03d}.png"
        fig.tight_layout()
        fig.savefig(p, dpi=110)
        plt.close(fig)
        paths.append(p)
    return paths


def visualize_forest_diagnostics(encode_gate_fn: Callable, dataset,
                                 out_dir: str | Path, n_patches: int = 4
                                 ) -> List[Path]:
    """Gate-map sheets: z_type PCA-RGB + smoothing-gate mean + histogram."""
    import jax.numpy as jnp

    out_dir = Path(out_dir)
    out_dir.mkdir(parents=True, exist_ok=True)
    paths = []
    for i in range(min(n_patches, len(dataset))):
        batch = {k: jnp.asarray(v)
                 for k, v in dataset.load_batch([i]).items()}
        z, gate = encode_gate_fn(batch)
        z = np.asarray(z)[0]
        g = np.asarray(gate)[0].mean(-1)
        fig, axes = plt.subplots(1, 3, figsize=(10, 3.2))
        axes[0].imshow(_pca_rgb(z))
        axes[0].set_title("z_type (PCA rgb)")
        im = axes[1].imshow(g, vmin=0, vmax=1, cmap="magma")
        axes[1].set_title(f"gate mean={g.mean():.3f}")
        plt.colorbar(im, ax=axes[1], fraction=0.046)
        axes[2].hist(g.ravel(), bins=40, range=(0, 1))
        axes[2].set_title("gate distribution")
        for ax in axes[:2]:
            ax.set_xticks([])
            ax.set_yticks([])
        p = out_dir / f"diagnostics_{i:03d}.png"
        fig.tight_layout()
        fig.savefig(p, dpi=110)
        plt.close(fig)
        paths.append(p)
    return paths


def main(argv=None):
    """CLI: figure sheets from a trained checkpoint.

    python -m forest_tpu.eval.visualize --checkpoint CKPT --bindings B.yaml
        --out DIR [--split test] [--patch-size 256] [--n 4] [--probe]
    """
    import argparse

    import jax

    from forest_tpu.data.bindings import parse_bindings
    from forest_tpu.data.feature_builder import FeatureBuilder
    from forest_tpu.data.frl_dataset import ForestDatasetV2
    from forest_tpu.eval import frozen, linear_probe as lp

    ap = argparse.ArgumentParser(description=main.__doc__)
    ap.add_argument("--checkpoint", required=True)
    ap.add_argument("--bindings", required=True)
    ap.add_argument("--out", required=True)
    ap.add_argument("--split", default="test")
    ap.add_argument("--patch-size", type=int, default=256)
    ap.add_argument("--split-block-size", type=int, nargs=2,
                    default=(4, 4))
    ap.add_argument("--n", type=int, default=4)
    ap.add_argument("--target-feature", default="infonce_type_spectral")
    ap.add_argument("--probe", action="store_true",
                    help="also fit + overlay a linear probe")
    a = ap.parse_args(argv)

    bindings = parse_bindings(a.bindings)
    fb = FeatureBuilder(bindings)
    ds = ForestDatasetV2(bindings, split=a.split, patch_size=a.patch_size,
                         split_block_size=tuple(a.split_block_size))
    model, params = frozen.load_frozen_model(a.checkpoint)
    enc_t, _, _ = frozen.make_encode_fns(model, params, fb)

    weights = None
    if a.probe:
        ds_tr = ForestDatasetV2(bindings, split="train",
                                patch_size=a.patch_size,
                                split_block_size=tuple(a.split_block_size))
        probe = lp.fit_linear_probe(enc_t, fb, ds_tr, ds,
                                    a.target_feature,
                                    max_batches_train=16,
                                    max_batches_eval=4)
        weights = probe["weights"]
        print("probe r2 (val):", probe["r2_val"])

    paths = visualize_test_patches(enc_t, fb, ds, a.target_feature,
                                   weights, a.out, a.n)

    variables = {"params": params}

    @jax.jit
    def encode_gate(batch):
        import jax.numpy as jnp
        x, _ = fb.build_feature("type_encoder_input", batch)
        return model.apply(variables, x, return_gate=True)

    paths += visualize_forest_diagnostics(encode_gate, ds, a.out, a.n)
    print(f"wrote {len(paths)} figures to {a.out}")


if __name__ == "__main__":
    main()


__all__ = ["visualize_test_patches", "visualize_forest_diagnostics",
           "_pca_rgb"]
