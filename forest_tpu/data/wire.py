"""Compact host->device wire format for training batches.

The axon relay's H2D link is the end-to-end training bottleneck on this
hardware: 1.72 MB of batch arrays cost ~35 ms per transfer (~50 MB/s
effective, measured r4 with fetch-anchored timing) and transfers do NOT
overlap device compute, so every byte on the wire is wall-clock. The
reference never faces this (its CPU workers feed a local GPU over PCIe --
SURVEY.md §0); the TPU-native answer is to put the TPU-native dtype on
the wire:

- float32/float64 arrays travel as bfloat16 (half the bytes; inputs are
  z-scored features, so the ~3-decimal-digit rounding is far below
  feature noise) and are upcast to float32 INSIDE the jitted step;
- ``*_nan_mask`` uint8 validity planes travel bit-PACKED (8x fewer
  bytes) and are unpacked inside the step against the companion data
  array's shape;
- integer id arrays are untouched (vocabulary bounds are dataset
  properties this layer cannot assume).

``encode_wire_batch`` runs on the host loader thread; ``decode_wire_batch``
is jit-traceable and is a no-op on batches that never went through the
encoder, so every step function can call it unconditionally.
"""
from __future__ import annotations

from typing import Any, Dict

import numpy as np

_MASK_SUFFIX = "_nan_mask"


def _pack_mask(mask: np.ndarray) -> np.ndarray:
    """[B, ...] uint8 0/1 -> [B, ceil(S/8)] uint8 (bitorder=big)."""
    b = mask.shape[0]
    return np.packbits(np.asarray(mask, np.uint8).reshape(b, -1), axis=1)


def encode_wire_batch(batch: Dict[str, Any],
                      skip: tuple = ()) -> Dict[str, Any]:
    """Host-side: shrink a loader batch for the relay H2D link.

    ``skip`` keys keep their dtype. Keys containing "categorical" are
    ALWAYS skipped: FRL groups carry class codes (e.g. EVT 7000+) in
    float arrays, and bf16's 8-bit mantissa cannot represent integers
    past 256 exactly -- a rounded code would silently break the step's
    value-equality comparisons. 0/1 masks and small integer-valued
    floats (ysfc years <= 256) are bf16-exact."""
    import ml_dtypes

    out: Dict[str, Any] = {}
    for k, v in batch.items():
        if isinstance(v, dict):
            out[k] = encode_wire_batch(v, skip)
            continue
        a = np.asarray(v)
        if k in skip or "categorical" in k:
            out[k] = a
        elif k.endswith(_MASK_SUFFIX) and a.dtype == np.uint8 \
                and a.ndim >= 2:
            out[k] = _pack_mask(a)
        elif a.dtype in (np.float32, np.float64):
            out[k] = a.astype(ml_dtypes.bfloat16)
        else:
            out[k] = a
    return out


def decode_wire_batch(batch: Dict[str, Any]) -> Dict[str, Any]:
    """Jit-traceable inverse: upcast bf16 -> f32 and unpack bit-packed
    masks against the companion data array's shape. Identity for plain
    batches (safe to call unconditionally in step functions)."""
    import jax.numpy as jnp

    out: Dict[str, Any] = {}
    for k, v in batch.items():
        if isinstance(v, dict):
            out[k] = decode_wire_batch(v)
            continue
        if k.endswith(_MASK_SUFFIX):
            data = batch.get(k[:-len(_MASK_SUFFIX)])
            if data is not None and hasattr(v, "ndim") and v.ndim == 2 \
                    and data.ndim > 2:
                # bit-packed: [B, ceil(S/8)] -> data.shape
                b = v.shape[0]
                s = int(np.prod(data.shape[1:]))
                shifts = jnp.arange(7, -1, -1, dtype=jnp.uint8)
                bits = (v[:, :, None] >> shifts) & jnp.uint8(1)
                out[k] = bits.reshape(b, -1)[:, :s].reshape(data.shape)
                continue
        if hasattr(v, "dtype") and v.dtype == jnp.bfloat16:
            out[k] = v.astype(jnp.float32)
        else:
            out[k] = v
    return out


__all__ = ["encode_wire_batch", "decode_wire_batch"]
