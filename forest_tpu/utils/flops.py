"""Compiled-graph FLOP accounting -> MFU (model FLOPs utilization).

VERDICT r4 weak #1: every perf artifact reported milliseconds and ratios
against the reference's wall-clock, never the fraction of the chip used.
This module derives the numerator (FLOPs per executed step) from XLA's own
cost model on the COMPILED executable -- ``jitted.lower(*args).compile()
.cost_analysis()["flops"]`` -- which works through the axon relay without
executing anything (CLAUDE.md: HLO dumps / memory_analysis are relay-safe),
and publishes utilization against three denominators:

- ``tpu_v5e_nominal_bf16``: 197 TFLOP/s, the v5 lite chip's bf16 systolic
  peak (public spec). The honest "how much of the silicon" number.
- ``tpu_relay_measured``: 57 TFLOP/s, the LARGE-matmul ceiling this
  container actually measured through the axon relay (CLAUDE.md r2 probes:
  2048^3 matmuls hit ~57 TFLOP/s for BOTH f32 and bf16 -- the relay chip is
  latency-bound, not precision-bound). Utilization against what this
  environment can physically deliver.
- ``a40_bf16``: 149.7 TFLOP/s dense bf16 tensor-core peak, for computing
  the REFERENCE's implied MFU at its 1.1 s/batch headline on the same
  model FLOPs (the reference torch model has the same architecture, so the
  compiled FLOP count of our step is the comparable numerator).

Derivation notes live in docs/MFU.md.
"""
from __future__ import annotations

PEAK_TFLOPS = {
    "tpu_v5e_nominal_bf16": 197.0,
    "tpu_relay_measured": 57.0,
    "a40_bf16": 149.7,
}

# The reference's production headline: ~1.1 s/batch at B=12, 256^2 patches
# on an A40 (/root/reference/CLAUDE.md:372, BASELINE.md).
REFERENCE_FRL_S_PER_BATCH = 1.1


def compiled_flops(jitted, *args, **kwargs) -> float:
    """FLOPs of one execution of ``jitted(*args, **kwargs)`` per XLA's cost
    model on the compiled executable.

    Compiles via the AOT path; with the persistent compile cache enabled the
    XLA compile is a cache hit when the jit path already ran (bench flows
    call this AFTER timing). Returns float('nan') when the backend's cost
    analysis is unavailable rather than raising: MFU is reporting, never a
    gate."""
    try:
        analysis = jitted.lower(*args, **kwargs).compile().cost_analysis()
        if isinstance(analysis, (list, tuple)):  # older JAX: one per device
            analysis = analysis[0]
        return float(analysis["flops"])
    except Exception:  # pragma: no cover - backend-dependent
        return float("nan")


def mfu(flops_per_step: float, seconds_per_step: float,
        peak_tflops: float) -> float:
    """Fraction of ``peak_tflops`` sustained: in [0, 1] for honest inputs."""
    return flops_per_step / seconds_per_step / (peak_tflops * 1e12)


def mfu_fields(prefix: str, flops_per_step: float, seconds_per_step: float,
               peaks: dict[str, float] | None = None) -> dict:
    """Benchmark-extra fields for one measured step.

    Returns ``{prefix}_gflops``, ``{prefix}_tflops_per_s`` and one
    ``{prefix}_mfu_pct_<peak>`` per denominator."""
    import math

    if not (math.isfinite(flops_per_step) and flops_per_step > 0
            and seconds_per_step > 0):
        return {f"{prefix}_gflops": -1.0}
    achieved = flops_per_step / seconds_per_step
    out = {f"{prefix}_gflops": round(flops_per_step / 1e9, 2),
           f"{prefix}_tflops_per_s": round(achieved / 1e12, 3)}
    for name, peak in (peaks or PEAK_TFLOPS).items():
        out[f"{prefix}_mfu_pct_{name}"] = round(
            100.0 * mfu(flops_per_step, seconds_per_step, peak), 2)
    return out


__all__ = ["PEAK_TFLOPS", "REFERENCE_FRL_S_PER_BATCH", "compiled_flops",
           "mfu", "mfu_fields"]
