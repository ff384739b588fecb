"""Learning-rate schedules (optax).

- ``cosine_lr``: warmup -> cosine from lr to min_lr over total steps (the
  legacy VQ-VAE contract, /root/reference/scripts/train_vqvae.py:250-253).
- ``two_phase_cosine_lr``: warmup -> cosine, then at the phase-loss entry
  step the LR drops to ``start_factor`` * peak and re-warms to
  ``peak_factor`` * peak before finishing the cosine -- because AdamW's
  second-moment state is cold for the newly-active phase parameters
  (/root/reference/frl/training/representation/scheduler.py:78-141,
  SURVEY.md §2.6).
- ``resume_cosine_lr``: fresh cosine over the remaining epochs (manual-resume
  semantics, scheduler.py:52-67).
"""
from __future__ import annotations

from typing import Optional

import jax.numpy as jnp
import optax


def cosine_lr(lr: float, total_steps: int, min_lr: float = 0.0,
              warmup_steps: int = 0) -> optax.Schedule:
    if warmup_steps > 0:
        return optax.warmup_cosine_decay_schedule(
            init_value=0.0, peak_value=lr, warmup_steps=warmup_steps,
            decay_steps=max(total_steps, warmup_steps + 1), end_value=min_lr)
    return optax.cosine_decay_schedule(
        init_value=lr, decay_steps=max(total_steps, 1),
        alpha=min_lr / max(lr, 1e-12))


def two_phase_cosine_lr(lr: float, total_steps: int,
                        phase_start_step: int,
                        rewarmup_steps: int, min_lr: float = 0.0,
                        warmup_steps: int = 0,
                        start_factor: float = 0.1,
                        peak_factor: float = 1.0) -> optax.Schedule:
    base = cosine_lr(lr, total_steps, min_lr, warmup_steps)

    def schedule(step):
        b = base(step)
        t = step - phase_start_step
        in_rewarm = (t >= 0) & (t < rewarmup_steps)
        u = jnp.clip(t / jnp.maximum(rewarmup_steps, 1), 0.0, 1.0)
        factor = start_factor + (peak_factor - start_factor) * u
        after = jnp.where(t >= rewarmup_steps, peak_factor, factor)
        mult = jnp.where(t < 0, 1.0, after)
        del in_rewarm
        return b * mult

    return schedule


def resume_cosine_lr(lr: float, remaining_steps: int,
                     min_lr: float = 0.0) -> optax.Schedule:
    return cosine_lr(lr, remaining_steps, min_lr, warmup_steps=0)


__all__ = ["cosine_lr", "two_phase_cosine_lr", "resume_cosine_lr"]
