"""Phase diagnostics: per-EVT FiLM/variance heatmaps, recovery curves,
ysfc histograms, and the EVT contingency-table merger.

Behavioral contracts (SURVEY.md §2.7):
- phase_evt_diagnostics (/root/reference/frl/training/
  phase_evt_diagnostics.py): per-EVT FiLM gamma and z_phase temporal-
  variance heatmaps;
- phase_recovery_curves (phase_recovery_curves.py): per-EVT recovery
  (embedding response vs ysfc) box/line plots;
- ysfc_evt_histograms (ysfc_evt_histograms.py): data-level ysfc
  distributions per EVT code;
- combine_evt_contingency_tables (/root/reference/data/
  combine_evt_contingency_tables.py:1-30): sum aligned cells of two labeled
  confusion CSVs (NE + SE LANDFIRE tables).
"""
from __future__ import annotations

import csv
from pathlib import Path
from typing import Dict, List, Optional, Sequence, Tuple

import matplotlib

matplotlib.use("Agg")
import matplotlib.pyplot as plt  # noqa: E402
import numpy as np  # noqa: E402


def collect_phase_samples(encode_type_fn, encode_phase_fn, fb, dataset,
                          evt_source: str, ysfc_source: str,
                          n_patches: int = 8, stride: int = 4):
    """Gather (z_phase [N, T, zp], gamma [N, zp], ysfc [N, T], evt [N])
    at strided anchors across patches."""
    import jax
    import jax.numpy as jnp

    from forest_tpu.utils import spatial as sp

    zs, gs, ys, es = [], [], [], []
    for i in range(min(n_patches, len(dataset))):
        batch = {k: jnp.asarray(v)
                 for k, v in dataset.load_batch([i]).items()}
        zt = encode_type_fn(batch)
        h, w = zt.shape[1:3]
        rr, cc = np.meshgrid(np.arange(2, h - 2, stride),
                             np.arange(2, w - 2, stride), indexing="ij")
        coords = jnp.asarray(np.stack([rr.ravel(), cc.ravel()], 1))
        zp, gamma = encode_phase_fn(batch, coords)
        gname, cname = ysfc_source.split(".")
        gc = fb.bindings.dataset[gname]
        ygrid = jnp.asarray(batch[gname][..., gc.channel_index(cname)]
                            )[..., None]
        ysfc = jax.vmap(sp.extract_temporal_at_locations,
                        in_axes=(0, None))(ygrid, coords)[..., 0]
        eg, ec = evt_source.split(".")
        egc = fb.bindings.dataset[eg]
        egrid = jnp.asarray(batch[eg][..., egc.channel_index(ec)])[..., None]
        evt = jax.vmap(sp.extract_at_locations,
                       in_axes=(0, None))(egrid, coords)[..., 0]
        zs.append(np.asarray(zp).reshape(-1, zp.shape[-2], zp.shape[-1]))
        gs.append(np.asarray(gamma).reshape(-1, gamma.shape[-1]))
        ys.append(np.asarray(ysfc).reshape(-1, ysfc.shape[-1]))
        es.append(np.asarray(evt).reshape(-1))
    return (np.concatenate(zs), np.concatenate(gs), np.concatenate(ys),
            np.concatenate(es))


def phase_evt_diagnostics(z_phase, gamma, evt, out_path: str | Path,
                          max_codes: int = 12) -> Path:
    """Per-EVT heatmaps: mean FiLM gamma and z_phase temporal variance."""
    codes, counts = np.unique(evt[np.isfinite(evt)], return_counts=True)
    codes = codes[np.argsort(-counts)][:max_codes]
    g_rows, v_rows = [], []
    for c in codes:
        sel = evt == c
        g_rows.append(gamma[sel].mean(0))
        v_rows.append(z_phase[sel].var(axis=1).mean(0))
    fig, axes = plt.subplots(1, 2, figsize=(10, 0.5 * len(codes) + 2))
    for ax, rows, title in ((axes[0], g_rows, "FiLM gamma (mean)"),
                            (axes[1], v_rows,
                             "z_phase temporal variance")):
        im = ax.imshow(np.asarray(rows), aspect="auto", cmap="viridis")
        ax.set_yticks(range(len(codes)))
        ax.set_yticklabels([f"{int(c)}" for c in codes])
        ax.set_xlabel("dim")
        ax.set_title(title)
        plt.colorbar(im, ax=ax, fraction=0.046)
    axes[0].set_ylabel("EVT code")
    fig.tight_layout()
    out_path = Path(out_path)
    fig.savefig(out_path, dpi=110)
    plt.close(fig)
    return out_path


def phase_recovery_curves(z_phase, ysfc, evt, out_path: str | Path,
                          max_codes: int = 6,
                          ysfc_bins: Sequence[float] = (0, 2, 5, 10, 20,
                                                        40)) -> Path:
    """Per-EVT recovery: ||z_phase|| response binned by ysfc."""
    codes, counts = np.unique(evt[np.isfinite(evt)], return_counts=True)
    codes = codes[np.argsort(-counts)][:max_codes]
    mag = np.linalg.norm(z_phase, axis=-1)   # [N, T]
    fig, ax = plt.subplots(figsize=(7, 4))
    centers = [(ysfc_bins[i] + ysfc_bins[i + 1]) / 2
               for i in range(len(ysfc_bins) - 1)]
    for c in codes:
        sel = evt == c
        y = ysfc[sel].ravel()
        m = mag[sel].ravel()
        ok = np.isfinite(y) & np.isfinite(m)
        means = []
        for i in range(len(ysfc_bins) - 1):
            b = ok & (y >= ysfc_bins[i]) & (y < ysfc_bins[i + 1])
            means.append(m[b].mean() if b.any() else np.nan)
        ax.plot(centers, means, marker="o", label=f"EVT {int(c)}")
    ax.set_xlabel("years since fast change")
    ax.set_ylabel("||z_phase||")
    ax.set_title("phase recovery curves per EVT")
    ax.legend(fontsize=8)
    fig.tight_layout()
    out_path = Path(out_path)
    fig.savefig(out_path, dpi=110)
    plt.close(fig)
    return out_path


def ysfc_evt_histograms(ysfc, evt, out_path: str | Path,
                        max_codes: int = 8) -> Path:
    codes, counts = np.unique(evt[np.isfinite(evt)], return_counts=True)
    codes = codes[np.argsort(-counts)][:max_codes]
    n = len(codes)
    fig, axes = plt.subplots((n + 3) // 4, 4,
                             figsize=(12, 2.4 * ((n + 3) // 4)),
                             squeeze=False)
    for i, c in enumerate(codes):
        ax = axes[i // 4][i % 4]
        v = ysfc[evt == c].ravel()
        v = v[np.isfinite(v)]
        ax.hist(v, bins=20)
        ax.set_title(f"EVT {int(c)} (n={v.size})", fontsize=9)
    for j in range(n, axes.size):
        axes[j // 4][j % 4].axis("off")
    fig.suptitle("ysfc distribution per EVT")
    fig.tight_layout()
    out_path = Path(out_path)
    fig.savefig(out_path, dpi=110)
    plt.close(fig)
    return out_path


def combine_evt_contingency_tables(csv_a: str | Path, csv_b: str | Path,
                                   out_csv: str | Path) -> Path:
    """Sum aligned cells of two labeled square confusion CSVs."""
    def load(p):
        with open(p, newline="") as f:
            rows = list(csv.reader(f))
        cols = rows[0][1:]
        table = {}
        for r in rows[1:]:
            if not r or not r[0]:
                continue
            table[r[0]] = {c: float(v or 0)
                           for c, v in zip(cols, r[1:])}
        return table

    a, b = load(csv_a), load(csv_b)
    row_labels = sorted(set(a) | set(b),
                        key=lambda s: (len(s), s))
    col_labels = sorted({c for t in (a, b) for r in t.values()
                         for c in r}, key=lambda s: (len(s), s))
    out_csv = Path(out_csv)
    with open(out_csv, "w", newline="") as f:
        w = csv.writer(f)
        w.writerow([""] + col_labels)
        for r in row_labels:
            vals = [a.get(r, {}).get(c, 0.0) + b.get(r, {}).get(c, 0.0)
                    for c in col_labels]
            w.writerow([r] + vals)
    return out_csv


def main(argv=None):
    """CLI: all three phase diagnostics from a trained checkpoint.

    python -m forest_tpu.eval.phase_diagnostics --checkpoint CKPT
        --bindings B.yaml --out DIR [--split train] [--n-patches 8]
    """
    import argparse

    from forest_tpu.data.bindings import parse_bindings
    from forest_tpu.data.feature_builder import FeatureBuilder
    from forest_tpu.data.frl_dataset import ForestDatasetV2
    from forest_tpu.eval import frozen

    ap = argparse.ArgumentParser(description=main.__doc__)
    ap.add_argument("--checkpoint", required=True)
    ap.add_argument("--bindings", required=True)
    ap.add_argument("--out", required=True)
    ap.add_argument("--split", default="train")
    ap.add_argument("--patch-size", type=int, default=256)
    ap.add_argument("--split-block-size", type=int, nargs=2,
                    default=(4, 4))
    ap.add_argument("--n-patches", type=int, default=8)
    ap.add_argument("--evt-source", default="static_categorical.evt")
    ap.add_argument("--ysfc-source", default="annual.ysfc")
    a = ap.parse_args(argv)

    bindings = parse_bindings(a.bindings)
    fb = FeatureBuilder(bindings)
    ds = ForestDatasetV2(bindings, split=a.split, patch_size=a.patch_size,
                         split_block_size=tuple(a.split_block_size))
    frozen.require_patches(ds, a.split, a.patch_size, a.split_block_size)
    model, params = frozen.load_frozen_model(a.checkpoint)
    enc_t, _, _ = frozen.make_encode_fns(model, params, fb)
    enc_pf = frozen.make_encode_phase_film(model, params, fb)

    z_phase, gamma, ysfc, evt = collect_phase_samples(
        enc_t, enc_pf, fb, ds, a.evt_source, a.ysfc_source, a.n_patches)
    out = Path(a.out)
    out.mkdir(parents=True, exist_ok=True)
    p1 = phase_evt_diagnostics(z_phase, gamma, evt, out / "phase_evt.png")
    p2 = phase_recovery_curves(z_phase, ysfc, evt,
                               out / "recovery_curves.png")
    p3 = ysfc_evt_histograms(ysfc, evt, out / "ysfc_histograms.png")
    print(f"wrote {p1}, {p2}, {p3}")


if __name__ == "__main__":
    main()


__all__ = ["collect_phase_samples", "phase_evt_diagnostics",
           "phase_recovery_curves", "ysfc_evt_histograms",
           "combine_evt_contingency_tables"]
