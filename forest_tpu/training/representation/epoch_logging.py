"""Per-epoch diagnostic text block.

Contract from /root/reference/frl/training/representation/epoch_logging.py
(SURVEY.md §2.6, §6.5): a rich formatted block with every loss component,
pair counts, gate / FiLM / similarity summaries, and the wait/step pipeline
split. Metric keys double as checkpoint-monitor names.
"""
from __future__ import annotations

from typing import Dict


_SECTIONS = [
    ("losses", ["loss_total", "loss_spatial_infonce",
                "loss_spectral_infonce", "loss_vicreg_type",
                "loss_vicreg_phase", "loss_phase_neighborhood",
                "loss_phase_spread", "loss_recovery_disc",
                "loss_type_leakage", "loss_evt"]),
    ("phase", ["phase_loss_self", "phase_loss_cross", "phase_pairs_valid",
               "spread_frac_satisfied", "film_gamma_mean",
               "film_beta_mean"]),
    ("similarities", ["spatial_pos_sim", "spatial_neg_sim",
                      "spectral_pos_sim", "spectral_neg_sim",
                      "spectral_n_anchors"]),
    ("model", ["gate_mean", "grad_norm", "skipped", "n_anchors_valid"]),
    ("pipeline", ["n_steps", "epoch_time_s", "wait_s", "step_s"]),
]


def _fmt(v: float) -> str:
    if abs(v) >= 1000 or (v != 0 and abs(v) < 1e-3):
        return f"{v:.3e}"
    return f"{v:.4f}"


def format_epoch_block(epoch: int, train: Dict[str, float],
                       val: Dict[str, float] | None = None,
                       lr: float | None = None) -> str:
    lines = [f"===== epoch {epoch}"
             + (f"  lr={lr:.2e}" if lr is not None else "") + " ====="]
    for title, keys in _SECTIONS:
        present = [k for k in keys if k in train]
        if not present:
            continue
        lines.append(f"  [{title}]")
        for k in present:
            row = f"    {k:<26s} train {_fmt(train[k])}"
            if val and k in val:
                row += f"   val {_fmt(val[k])}"
            lines.append(row)
    extra = sorted(set(train) - {k for _, ks in _SECTIONS for k in ks})
    if extra:
        lines.append("  [other] " + "  ".join(
            f"{k}={_fmt(train[k])}" for k in extra))
    return "\n".join(lines)


def checkpoint_metrics(train: Dict[str, float],
                       val: Dict[str, float] | None) -> Dict[str, float]:
    """Flatten to monitor-name keys (train/... and val/...)."""
    out = {f"train/{k}": v for k, v in train.items()}
    if val:
        out.update({f"val/{k}": v for k, v in val.items()})
    return out


__all__ = ["format_epoch_block", "checkpoint_metrics"]
