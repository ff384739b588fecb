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
- integer id arrays travel uint8/uint16 (or int8/int16 when a sentinel
  like IGNORE_INDEX=-100 rides along) when the CALLER asserts a
  schema-derived value bound via ``int_bounds``; untouched otherwise
  (vocabulary bounds are dataset properties this layer cannot assume);
- loaders may assemble big channel-stacked groups CHANNEL-MAJOR
  ([B, C, (T,) H, W] under a ``<name>__cm`` key): each source channel is
  then a contiguous memcpy into the batch buffer instead of a
  channel-strided scatter (np.stack along a minor axis runs at ~1/20 of
  memcpy on the 1-core host -- it was 87% of FRL batch assembly), and
  ``decode_wire_batch`` restores the channel-LAST layout the compute
  graphs require with one on-device relayout (~milliseconds at HBM rate).

``encode_wire_batch`` runs on the host loader thread; ``decode_wire_batch``
is jit-traceable and is a no-op on batches that never went through the
encoder, so every step function can call it unconditionally.
"""
from __future__ import annotations

from typing import Any, Dict

import numpy as np

_MASK_SUFFIX = "_nan_mask"
# Channel-major group marker: "<name>__cm" holds [B, C, (T,) H, W]; decode
# moves C to the last axis and strips the suffix. The suffix is the wire's
# ONLY layout channel -- dict keys are static under jit, so the decode
# graph specializes per layout with no runtime flags.
_CM_SUFFIX = "__cm"


def _pack_mask(mask: np.ndarray) -> np.ndarray:
    """[B, ...] uint8 0/1 -> [B, ceil(S/8)] uint8 (bitorder=big)."""
    b = mask.shape[0]
    return np.packbits(np.asarray(mask, np.uint8).reshape(b, -1), axis=1)


def _companion_ndim(batch: Dict[str, Any], mask_key: str) -> int:
    """ndim of the data array a ``*_nan_mask`` key annotates (0 if absent)."""
    data = batch.get(mask_key[:-len(_MASK_SUFFIX)])
    return getattr(np.asarray(data), "ndim", 0) if data is not None else 0


def encode_wire_batch(batch: Dict[str, Any], skip: tuple = (),
                      int_bounds: Dict[str, int] | None = None
                      ) -> Dict[str, Any]:
    """Host-side: shrink a loader batch for the relay H2D link.

    ``skip`` keys keep their dtype. Keys containing "categorical" are
    ALWAYS skipped: FRL groups carry class codes (e.g. EVT 7000+) in
    float arrays, and bf16's 8-bit mantissa cannot represent integers
    past 256 exactly -- a rounded code would silently break the step's
    value-equality comparisons. 0/1 masks and small integer-valued
    floats (ysfc years <= 256) are bf16-exact.

    ``int_bounds`` maps id-array keys (matched at any nesting level) to
    their value bound: either an EXCLUSIVE upper bound ``hi`` (array is
    non-negative -- dense ids are schema-bounded by ``num_ids``,
    data/schema.py apply_schema) for an unsigned uint8/uint16 downcast,
    or an ``(lo, hi)`` tuple (lo inclusive, hi exclusive) for arrays
    that also carry sentinels like IGNORE_INDEX=-100 (cat_target) for a
    signed int8/int16 downcast. 2-4x fewer bytes; ids are ~35% of the
    VQ-VAE pipeline wire. The bound is a dataset property the CALLER
    asserts -- it must come from the schema, never from a per-batch max
    (a per-batch dtype would change the jit signature between batches).
    Lossless: consumers index embeddings/one-hots and compare sentinels
    with any int dtype, so decode leaves ints be."""
    import ml_dtypes

    out: Dict[str, Any] = {}
    for k, v in batch.items():
        if isinstance(v, dict):
            out[k] = encode_wire_batch(v, skip, int_bounds)
            continue
        a = np.asarray(v)
        # Skip/exact-group rules match the GROUP name the step configures,
        # not the wire-layout-decorated key.
        base = k[:-len(_CM_SUFFIX)] if k.endswith(_CM_SUFFIX) else k
        if base in skip or "categorical" in base:
            out[k] = a
        elif k.endswith(_MASK_SUFFIX) and a.dtype == np.uint8 \
                and a.ndim >= 2 and _companion_ndim(batch, k) > 2:
            # Pack ONLY what decode can unpack: decode recognizes a
            # packed mask by (mask.ndim == 2, companion data.ndim > 2),
            # so a mask whose companion is 2-D/absent must travel plain.
            out[k] = _pack_mask(a)
        elif a.dtype in (np.float32, np.float64):
            out[k] = a.astype(ml_dtypes.bfloat16)
        elif int_bounds and base in int_bounds \
                and a.dtype in (np.int32, np.int64):
            spec = int_bounds[base]
            lo, hi = ((int(spec[0]), int(spec[1]))
                      if isinstance(spec, (tuple, list))
                      else (0, int(spec)))
            if lo >= 0:
                if hi <= 2**8:
                    out[k] = a.astype(np.uint8)
                elif hi <= 2**16:
                    out[k] = a.astype(np.uint16)
                else:
                    out[k] = a
            elif lo >= -2**7 and hi <= 2**7:
                out[k] = a.astype(np.int8)
            elif lo >= -2**15 and hi <= 2**15:
                out[k] = a.astype(np.int16)
            else:
                out[k] = a
        else:
            out[k] = a
    return out


def stack_batches(batches) -> Dict[str, Any]:
    """Host-side: stack K same-shaped loader batches leaf-wise into one
    pytree with a leading K axis, for multi-step-per-dispatch training
    (``vqvae_step.make_scan_train_step``). ``np.stack`` produces OWNING
    contiguous arrays -- numpy views serialize pathologically through the
    relay (~4x slower than owning arrays of the same bytes, CLAUDE.md), so
    the stack doubles as the materialization step before H2D."""
    first = batches[0]
    out: Dict[str, Any] = {}
    for k, v in first.items():
        if isinstance(v, dict):
            out[k] = stack_batches([b[k] for b in batches])
        else:
            out[k] = np.stack([np.asarray(b[k]) for b in batches])
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
        if k.endswith(_CM_SUFFIX):
            # Channel-major group: upcast if the wire carried bf16, then
            # one relayout to the channel-LAST contract ([B, ..., C]).
            x = v.astype(jnp.float32) \
                if getattr(v, "dtype", None) == jnp.bfloat16 else v
            out[k[:-len(_CM_SUFFIX)]] = jnp.moveaxis(x, 1, -1)
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


__all__ = ["encode_wire_batch", "decode_wire_batch", "stack_batches"]
