"""Loss-weight annealing schedules (the ``vqvae.annealers`` contract).

Reconstructed from call sites at /root/reference/scripts/train_vqvae.py:236-248,
328 and the schedule family listed at train_vqvae.py:440-456 (SURVEY.md §3):
``load_scheduler(base_weights, flat_args) -> callable(step=...) -> {name: w}``
with schedules constant, linear, cosine, exponential(k), stepwise("s:v" list),
and warmup_hold_decay(start/warmup/hold/decay with floor/ceil/final).

All schedules are pure ``step -> float`` functions of a python/int step; the
resulting weights are passed into the jitted train step as scalar args (never
baked into the trace -- SURVEY.md §8.3 "data-dependent curricula").
"""
from __future__ import annotations

import math
from dataclasses import dataclass, field
from typing import Any, Callable, Dict, List, Optional, Sequence, Tuple


@dataclass
class AnnealConfig:
    """One loss term's schedule.

    kind: constant | linear | cosine | exponential | stepwise | warmup_hold_decay
    The schedule interpolates from ``start_value`` to ``end_value`` over
    ``[start_step, end_step]`` (clamped outside), except:
    - exponential: value = start + (end-start) * (1 - exp(-k * u)) / (1-exp(-k))
      with u in [0,1] and rate ``k``;
    - stepwise: piecewise-constant from ``milestones`` [(step, value), ...];
    - warmup_hold_decay: floor until ``start_step``, linear ramp to ``ceil``
      over ``warmup`` steps, hold for ``hold`` steps, cosine decay to
      ``final`` over ``decay`` steps.
    """
    kind: str = "constant"
    start_value: float = 1.0
    end_value: float = 1.0
    start_step: int = 0
    end_step: int = 1
    k: float = 5.0
    milestones: List[Tuple[int, float]] = field(default_factory=list)
    warmup: int = 0
    hold: int = 0
    decay: int = 0
    floor: float = 0.0
    ceil: float = 1.0
    final: float = 0.0

    def __call__(self, step: int) -> float:
        s = self.kind
        if s == "constant":
            return float(self.start_value)
        if s == "stepwise":
            v = self.start_value
            for ms, mv in sorted(self.milestones):
                if step >= ms:
                    v = mv
            return float(v)
        if s == "warmup_hold_decay":
            t = step - self.start_step
            if t < 0:
                return float(self.floor)
            if t < self.warmup:
                u = t / max(self.warmup, 1)
                return float(self.floor + (self.ceil - self.floor) * u)
            t -= self.warmup
            if t < self.hold:
                return float(self.ceil)
            t -= self.hold
            if t < self.decay:
                u = t / max(self.decay, 1)
                return float(self.final + (self.ceil - self.final)
                             * 0.5 * (1.0 + math.cos(math.pi * u)))
            return float(self.final)
        # Ramp family over [start_step, end_step].
        span = max(self.end_step - self.start_step, 1)
        u = min(max((step - self.start_step) / span, 0.0), 1.0)
        if s == "linear":
            w = u
        elif s == "cosine":
            w = 0.5 * (1.0 - math.cos(math.pi * u))
        elif s == "exponential":
            denom = 1.0 - math.exp(-self.k)
            w = (1.0 - math.exp(-self.k * u)) / max(denom, 1e-12)
        else:
            raise ValueError(f"unknown anneal kind {s!r}")
        return float(self.start_value + (self.end_value - self.start_value) * w)


def _parse_milestones(spec: Any) -> List[Tuple[int, float]]:
    """Parse 'step:value' strings (the reference CLI format) or pairs."""
    out: List[Tuple[int, float]] = []
    if spec is None:
        return out
    for item in spec if isinstance(spec, (list, tuple)) else [spec]:
        if isinstance(item, str):
            a, b = item.split(":")
            out.append((int(a), float(b)))
        else:
            out.append((int(item[0]), float(item[1])))
    return out


def anneal_from_dict(d: Any) -> AnnealConfig:
    """Build one AnnealConfig from YAML/flag values.

    Accepts a scalar (-> constant) or a dict of AnnealConfig fields; the
    ``milestones`` entry may use "step:value" strings.
    """
    if isinstance(d, (int, float)):
        return AnnealConfig(kind="constant", start_value=float(d))
    d = dict(d)
    if "milestones" in d:
        d["milestones"] = _parse_milestones(d["milestones"])
    # Common aliases from the reference flag style.
    d.setdefault("kind", d.pop("schedule", "constant"))
    return AnnealConfig(**{k: v for k, v in d.items()
                           if k in AnnealConfig.__dataclass_fields__})


class LossWeightScheduler:
    """Maps a training step to the full loss-weight dict.

    ``base_weights`` gives the static multiplier per loss name; any name with a
    schedule gets base * schedule(step), others stay constant.
    """

    def __init__(self, base_weights: Dict[str, float],
                 schedules: Optional[Dict[str, AnnealConfig]] = None):
        self.base = dict(base_weights)
        self.schedules = dict(schedules or {})

    def __call__(self, step: int) -> Dict[str, float]:
        out = {}
        for name, base in self.base.items():
            sched = self.schedules.get(name)
            out[name] = float(base) * (sched(step) if sched else 1.0)
        return out


def load_scheduler(base_weights: Dict[str, float],
                   flat_args: Optional[Dict[str, Any]] = None
                   ) -> LossWeightScheduler:
    """The ``vqvae.annealers.load_scheduler`` contract: ``flat_args`` maps
    loss names to schedule specs (scalar / dict / 'step:value' milestones)."""
    schedules = {}
    for name, spec in (flat_args or {}).items():
        schedules[name] = anneal_from_dict(spec)
    return LossWeightScheduler(base_weights, schedules)


__all__ = ["AnnealConfig", "LossWeightScheduler", "load_scheduler",
           "anneal_from_dict"]
