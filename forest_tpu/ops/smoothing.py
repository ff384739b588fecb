"""Fused bank+mixing Pallas kernel for EdgeAwareSmoothingConv2D.

Reference behavior (/root/reference/frl/models/spatial.py:165-343): a fixed
4-orientation x 2-scale depthwise 3-tap filter bank followed by a per-pixel
rank-R factored channel mixing,

    smoothed[c] = sum_{k,r} filtered[c,k] * A[k,r] * B[c,r],

with softmaxed A (over directions k) and B (over rank slots r) predicted by
a small conv backbone. The XLA formulation (grouped depthwise convs + a
per-pixel bilinear einsum) is the single most expensive piece of the FRL
training step: the grouped convs materialize a [B,H,W,C,K] tensor in HBM and
the einsum maps to tiny per-pixel contractions the MXU cannot tile.

TPU-native design here: ONE Pallas pass per row-tile computes the eight
3-tap directional means as in-VMEM shift-adds (lane rolls along W, row
slices along H) and immediately contracts them against the mixing weights on
the VPU -- the [B,H,W,C,K] intermediate never exists. Layout is
[rows, C, W]: W (256) fills lanes exactly and C (48) fills sublanes with no
padding waste; halo rows come from passing the input three times with
i-1 / i / i+1 block index maps so Pallas still pipelines HBM->VMEM copies.
The backward pass is a second kernel (custom VJP) that recomputes the banks
and mixing terms in-halo instead of saving them.

The pure-XLA path (:func:`bank_mix_xla`) is the autodiff/CPU fallback and
the parity oracle for tests.
"""
from __future__ import annotations

import functools
import os
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from forest_tpu.ops._util import LANE as _LANE
from forest_tpu.ops._util import on_tpu as _on_tpu
from forest_tpu.ops._util import round_up as _round_up

Array = jax.Array


def _direction_bank() -> np.ndarray:
    """[4, 3, 3] fixed orientation templates (3-tap means).

    Order: horizontal, vertical, main diagonal, anti-diagonal
    (/root/reference/frl/models/spatial.py:222-237)."""
    t = np.zeros((4, 3, 3), np.float32)
    t[0, 1, :] = 1 / 3
    t[1, :, 1] = 1 / 3
    t[2, [0, 1, 2], [0, 1, 2]] = 1 / 3
    t[3, [0, 1, 2], [2, 1, 0]] = 1 / 3
    return t


# Unit (dy, dx) tap directions matching _direction_bank rows: the three taps
# of direction d at scale delta sit at offsets {-u*delta, 0, +u*delta}.
_DIR_TAPS = ((0, 1), (1, 0), (1, 1), (1, -1))


def _sobel() -> Tuple[np.ndarray, np.ndarray]:
    sx = np.array([[-1., 0., 1.], [-2., 0., 2.], [-1., 0., 1.]],
                  np.float32) / 4.0
    sy = np.array([[-1., -2., -1.], [0., 0., 0.], [1., 2., 1.]],
                  np.float32) / 4.0
    return sx, sy


def depthwise_bank_conv(x: Array, bank: Array, dilation: int = 1) -> Array:
    """Apply F fixed [3,3] filters depthwise to every channel.

    x: [B, H, W, C]; bank: [F, 3, 3] -> returns [B, H, W, C, F]. One grouped
    conv with C*F output features (XLA reference path)."""
    b, h, w, c = x.shape
    bank = jnp.asarray(bank)
    f = bank.shape[0]
    k = jnp.transpose(bank, (1, 2, 0))  # [3, 3, F]
    k = jnp.tile(k[:, :, None, :], (1, 1, 1, c)).reshape(3, 3, 1, c * f)
    out = jax.lax.conv_general_dilated(
        x, k.astype(x.dtype), window_strides=(1, 1),
        padding=[(dilation, dilation)] * 2,
        rhs_dilation=(dilation, dilation),
        feature_group_count=c,
        dimension_numbers=("NHWC", "HWIO", "NHWC"))
    return out.reshape(b, h, w, c, f)


def sobel_grads(x: Array) -> Array:
    """Per-channel Sobel gradients, channel-interleaved: [B,H,W,C] ->
    [B,H,W,2C] with out[..., 2c] = gx(c), out[..., 2c+1] = gy(c).

    Equivalent to ``depthwise_bank_conv(x, [sx, sy]).reshape(..., 2C)`` but
    expressed as ONE dense conv (a sparse [3,3,C,2C] kernel): XLA's grouped
    depthwise lowering measured 4.2 ms at [12,256,256,48] bf16 on v5e while
    the dense form tiles fully onto the MXU."""
    c = x.shape[-1]
    sx, sy = _sobel()
    k = np.zeros((3, 3, c, 2 * c), np.float32)
    for ci in range(c):
        k[:, :, ci, 2 * ci] = sx
        k[:, :, ci, 2 * ci + 1] = sy
    return jax.lax.conv_general_dilated(
        x, jnp.asarray(k, x.dtype), window_strides=(1, 1),
        padding=[(1, 1)] * 2,
        dimension_numbers=("NHWC", "HWIO", "NHWC"))


# ---------------------------------------------------------------------------
# XLA reference path (autodiff surface on CPU, parity oracle)
# ---------------------------------------------------------------------------


def bank_mix_xla(x: Array, a_w: Array, b_w: Array, *,
                 num_directions: int = 4, coarse_dilation: int = 3) -> Array:
    """smoothed = einsum(filtered, a_w, b_w) with the fine/coarse bank.

    x [B,H,W,C]; a_w [B,H,W,K,R] (K = 2*num_directions, fine/coarse
    interleaved k = 2*d + scale); b_w [B,H,W,C,R]."""
    b, h, w, c = x.shape
    bank = _direction_bank()[:num_directions]
    fine = depthwise_bank_conv(x, bank, dilation=1)
    coarse = depthwise_bank_conv(x, bank, dilation=coarse_dilation)
    filtered = jnp.stack([fine, coarse], axis=-1)  # [B,H,W,C,nd,2]
    filtered = filtered.reshape(b, h, w, c, 2 * num_directions)
    return jnp.einsum("bhwck,bhwkr,bhwcr->bhwc", filtered, a_w, b_w)


# ---------------------------------------------------------------------------
# Pallas kernels ([rows, C, W] layout, W in lanes)
# ---------------------------------------------------------------------------


def _row_window(prev, cur, nxt, *, m: int, th: int, h: int, tile_i):
    """Assemble [TH+2m, S, Wp] from three [TH, S, Wp] row blocks, zeroing
    rows that fall outside the true image height ``h``."""
    win = jnp.concatenate([prev[th - m:], cur, nxt[:m]], axis=0)
    grow = (tile_i * th - m
            + jax.lax.broadcasted_iota(jnp.int32, (th + 2 * m, 1, 1), 0))
    valid = (grow >= 0) & (grow < h)
    return jnp.where(valid, win, jnp.zeros_like(win))


def _col_shift(t: Array, dx: int, w: int):
    """out[..., w'] = t[..., w' + dx], zero where w' + dx is outside [0, w).

    t: [..., Wp] with Wp a lane multiple; roll wraps, so wrapped columns
    (and true-image borders) are masked explicitly. Always returns float32:
    Mosaic's lane rotate only supports 32-bit data, and every consumer
    accumulates in f32 anyway."""
    t = t.astype(jnp.float32)
    wp = t.shape[-1]
    if dx == 0:
        return t
    r = pltpu.roll(t, (-dx) % wp, axis=t.ndim - 1)
    col = jax.lax.broadcasted_iota(jnp.int32, (1, 1, wp), 2)
    ok = (col + dx >= 0) & (col + dx < w)
    return jnp.where(ok, r, jnp.zeros_like(r))


def _bank_taps(shifts, k: int, coarse_dilation: int, *, m: int, row0: int,
               nrows: int):
    """The three tap arrays of bank k over rows [row0, row0+nrows), taken
    from ``shifts``: dict dx -> column-shifted window [TH+2m, S, Wp]."""
    d, s = divmod(k, 2)
    delta = 1 if s == 0 else coarse_dilation
    uy, ux = _DIR_TAPS[d]

    def tap(dy, dx):
        src = shifts[dx]
        lo = m + row0 + dy
        return src[lo:lo + nrows]

    return (tap(-uy * delta, -ux * delta), tap(0, 0),
            tap(uy * delta, ux * delta))


def _fwd_kernel(xp_ref, xc_ref, xn_ref, a_ref, b_ref, out_ref, *,
                nd: int, dc: int, th: int, h: int, w: int, c: int, r: int):
    i = pl.program_id(1)
    m = dc
    xw = _row_window(xp_ref[0], xc_ref[0], xn_ref[0], m=m, th=th, h=h,
                     tile_i=i)
    shifts = {0: xw.astype(jnp.float32)}
    for dx in (1, -1, dc, -dc):
        if dx not in shifts:
            shifts[dx] = _col_shift(xw, dx, w)
    a = a_ref[0]  # [TH, K*R(+pad), Wp]
    b = b_ref[0]  # [TH, R*C, Wp]

    acc = jnp.zeros((th, c, out_ref.shape[-1]), jnp.float32)
    third = jnp.float32(1.0 / 3.0)
    for k in range(2 * nd):
        t0, t1, t2 = _bank_taps(shifts, k, dc, m=m, row0=0, nrows=th)
        f_k = (t0.astype(jnp.float32) + t1.astype(jnp.float32)
               + t2.astype(jnp.float32)) * third
        m_k = jnp.zeros_like(acc)
        for rr in range(r):
            a_l = a[:, k * r + rr:k * r + rr + 1, :].astype(jnp.float32)
            b_l = b[:, rr * c:(rr + 1) * c, :].astype(jnp.float32)
            m_k = m_k + a_l * b_l
        acc = acc + f_k * m_k
    out_ref[0] = acc.astype(out_ref.dtype)


def _bwd_kernel(xp_ref, xc_ref, xn_ref, gp_ref, gc_ref, gn_ref,
                ap_ref, ac_ref, an_ref, bp_ref, bc_ref, bn_ref,
                dx_ref, da_ref, db_ref, *,
                nd: int, dc: int, th: int, h: int, w: int, c: int, r: int):
    i = pl.program_id(1)
    m = dc
    f32 = jnp.float32
    xw = _row_window(xp_ref[0], xc_ref[0], xn_ref[0], m=m, th=th, h=h,
                     tile_i=i)
    gw = _row_window(gp_ref[0], gc_ref[0], gn_ref[0], m=m, th=th, h=h,
                     tile_i=i).astype(f32)
    aw = _row_window(ap_ref[0], ac_ref[0], an_ref[0], m=m, th=th, h=h,
                     tile_i=i).astype(f32)
    bw = _row_window(bp_ref[0], bc_ref[0], bn_ref[0], m=m, th=th, h=h,
                     tile_i=i).astype(f32)

    x_shifts = {0: xw.astype(f32)}
    for dx in (1, -1, dc, -dc):
        if dx not in x_shifts:
            x_shifts[dx] = _col_shift(xw, dx, w)

    g_c = gw[m:m + th]  # [TH, C, Wp]
    wp = dx_ref.shape[-1]
    dx_acc = jnp.zeros((th, c, wp), f32)
    da_planes = []             # [TH, 1, Wp] per (k, r), lane-major order
    y_acc = [jnp.zeros((th, c, wp), f32) for _ in range(r)]
    third = f32(1.0 / 3.0)

    for k in range(2 * nd):
        # M_k over the full halo window (needed by the dx bank adjoint).
        m_k = jnp.zeros((th + 2 * m, c, wp), f32)
        for rr in range(r):
            a_l = aw[:, k * r + rr:k * r + rr + 1, :]
            m_k = m_k + a_l * bw[:, rr * c:(rr + 1) * c, :]
        gm = gw * m_k  # [TH+2m, C, Wp]

        # dx += bank_k applied to g*M_k (banks are 180-degree symmetric).
        d, s = divmod(k, 2)
        delta = 1 if s == 0 else dc
        uy, ux = _DIR_TAPS[d]
        gm_m = _col_shift(gm, -ux * delta, w)
        gm_p = _col_shift(gm, ux * delta, w)
        lo = m - uy * delta
        hi = m + uy * delta
        dx_acc = dx_acc + (gm_m[lo:lo + th] + gm[m:m + th]
                           + gm_p[hi:hi + th]) * third

        # f_k at tile rows (recomputed), for dA and dB.
        t0, t1, t2 = _bank_taps(x_shifts, k, dc, m=m, row0=0, nrows=th)
        f_k = (t0.astype(f32) + t1.astype(f32) + t2.astype(f32)) * third
        gf = g_c * f_k  # [TH, C, Wp]
        a_c = aw[m:m + th]
        b_c = bw[m:m + th]
        for rr in range(r):
            red = jnp.sum(gf * b_c[:, rr * c:(rr + 1) * c, :], axis=1,
                          keepdims=True)  # [TH, 1, Wp]
            da_planes.append(red)
            a_l = a_c[:, k * r + rr:k * r + rr + 1, :]
            y_acc[rr] = y_acc[rr] + f_k * a_l

    krp = da_ref.shape[-2]
    if krp > 2 * nd * r:  # lane-padding planes beyond K*R
        da_planes.append(jnp.zeros((th, krp - 2 * nd * r, wp), f32))
    da = jnp.concatenate(da_planes, axis=1)
    db = jnp.concatenate([g_c * y_acc[rr] for rr in range(r)], axis=1)
    dx_ref[0] = dx_acc.astype(dx_ref.dtype)
    da_ref[0] = da.astype(da_ref.dtype)
    db_ref[0] = db.astype(db_ref.dtype)


# ---------------------------------------------------------------------------
# Pallas wrappers: layout transform, padding, grid/blockspecs
# ---------------------------------------------------------------------------

_TH = 16


def _prep(x: Array, a_w: Array, b_w: Array, nd: int):
    """[B,H,W,C]-family -> padded [B,Hp,S,Wp] channel-sublane layouts.

    Returns (xt, at, bt, dims) where dims carries the static geometry."""
    b, h, w, c = x.shape
    r = a_w.shape[-1]
    k = 2 * nd
    cp = _round_up(c, 16)
    krp = _round_up(k * r, 16)
    wp = _round_up(w, _LANE)
    th = _TH
    hp = _round_up(h, th)

    if c != cp:
        x = jnp.pad(x, ((0, 0), (0, 0), (0, 0), (0, cp - c)))
        b_w = jnp.pad(b_w, ((0, 0), (0, 0), (0, 0), (0, cp - c), (0, 0)))
    a2 = a_w.reshape(b, h, w, k * r)
    if k * r != krp:
        a2 = jnp.pad(a2, ((0, 0), (0, 0), (0, 0), (0, krp - k * r)))

    xt = jnp.transpose(x, (0, 1, 3, 2))                    # [B,H,Cp,W]
    at = jnp.transpose(a2, (0, 1, 3, 2))                   # [B,H,KRp,W]
    bt = jnp.transpose(b_w, (0, 1, 4, 3, 2))               # [B,H,R,Cp,W]
    bt = bt.reshape(b, h, r * cp, w)
    pad_hw = ((0, 0), (0, hp - h), (0, 0), (0, wp - w))
    xt = jnp.pad(xt, pad_hw)
    at = jnp.pad(at, pad_hw)
    bt = jnp.pad(bt, pad_hw)
    dims = dict(b=b, h=h, w=w, c=c, cp=cp, r=r, k=k, krp=krp, wp=wp, hp=hp,
                th=th)
    return xt, at, bt, dims


def _specs(th, s, wp, *, halo: bool):
    """BlockSpecs over a [B, Hp, S, Wp] array: (prev, cur, next) row-tile
    views when halo else the centered view only."""
    def ix(fn):
        return pl.BlockSpec((1, th, s, wp), fn, memory_space=pltpu.VMEM)
    cur = ix(lambda bi, hi: (bi, hi, 0, 0))
    if not halo:
        return (cur,)
    prev = ix(lambda bi, hi: (bi, jnp.maximum(hi - 1, 0), 0, 0))
    nxt = ix(lambda bi, hi: (bi, jnp.minimum(hi + 1, pl.num_programs(1) - 1),
                             0, 0))
    return (prev, cur, nxt)


def _pallas_fwd_call(xt, at, bt, dims, nd, dc, interpret):
    d = dims
    grid = (d["b"], d["hp"] // d["th"])
    kern = functools.partial(_fwd_kernel, nd=nd, dc=dc, th=d["th"], h=d["h"],
                             w=d["w"], c=d["cp"], r=d["r"])
    out = pl.pallas_call(
        kern,
        grid=grid,
        in_specs=[*_specs(d["th"], d["cp"], d["wp"], halo=True),
                  *_specs(d["th"], d["krp"], d["wp"], halo=False),
                  *_specs(d["th"], d["r"] * d["cp"], d["wp"], halo=False)],
        out_specs=_specs(d["th"], d["cp"], d["wp"], halo=False)[0],
        out_shape=jax.ShapeDtypeStruct(
            (d["b"], d["hp"], d["cp"], d["wp"]), xt.dtype),
        cost_estimate=pl.CostEstimate(
            flops=int(d["b"]) * d["hp"] * d["cp"] * d["wp"]
            * (2 * nd) * (2 * d["r"] + 8),
            bytes_accessed=2 * (3 * xt.size + at.size + 2 * bt.size),
            transcendentals=0),
        # The f32 path's double-buffered halo views of x plus the rank-R
        # bank block exceed the 16 MB default scoped-vmem budget at
        # production shapes ([12,256,48,256]: 18.4 MB); v5e has headroom.
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=64 * 1024 * 1024),
        interpret=interpret,
    )(xt, xt, xt, at, bt)
    return out


def _pallas_bwd_call(xt, at, bt, gt, dims, nd, dc, interpret):
    d = dims
    # The backward kernel holds ~2x the forward's live VMEM (halo'd g/a/b
    # windows + 4 rank accumulators); half the row tile keeps it under the
    # 16 MB scoped-vmem limit. hp is a multiple of _TH, so _TH // 2 divides.
    tb = max(_TH // 2, 1)
    grid = (d["b"], d["hp"] // tb)
    kern = functools.partial(_bwd_kernel, nd=nd, dc=dc, th=tb, h=d["h"],
                             w=d["w"], c=d["cp"], r=d["r"])
    shp = dict(x=(d["b"], d["hp"], d["cp"], d["wp"]),
               a=(d["b"], d["hp"], d["krp"], d["wp"]),
               bb=(d["b"], d["hp"], d["r"] * d["cp"], d["wp"]))
    dx, da, db = pl.pallas_call(
        kern,
        grid=grid,
        in_specs=[*_specs(tb, d["cp"], d["wp"], halo=True),
                  *_specs(tb, d["cp"], d["wp"], halo=True),
                  *_specs(tb, d["krp"], d["wp"], halo=True),
                  *_specs(tb, d["r"] * d["cp"], d["wp"], halo=True)],
        out_specs=[_specs(tb, d["cp"], d["wp"], halo=False)[0],
                   _specs(tb, d["krp"], d["wp"], halo=False)[0],
                   _specs(tb, d["r"] * d["cp"], d["wp"], halo=False)[0]],
        out_shape=[jax.ShapeDtypeStruct(shp["x"], xt.dtype),
                   jax.ShapeDtypeStruct(shp["a"], at.dtype),
                   jax.ShapeDtypeStruct(shp["bb"], bt.dtype)],
        cost_estimate=pl.CostEstimate(
            flops=int(d["b"]) * d["hp"] * d["cp"] * d["wp"]
            * (2 * nd) * (4 * d["r"] + 16),
            bytes_accessed=2 * 3 * (2 * xt.size + at.size + 2 * bt.size),
            transcendentals=0),
        # 12 double-buffered input blocks (3-view halos of x/g/a/b) exceed
        # the 16 MB default scoped-vmem budget; v5e has headroom above it.
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=64 * 1024 * 1024),
        interpret=interpret,
    )(xt, xt, xt, gt, gt, gt, at, at, at, bt, bt, bt)
    return dx, da, db


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4, 5))
def _bank_mix_pallas(x, a_w, b_w, nd, dc, interpret):
    out, _ = _bank_mix_fwd(x, a_w, b_w, nd, dc, interpret)
    return out


def _bank_mix_fwd(x, a_w, b_w, nd, dc, interpret):
    xt, at, bt, dims = _prep(x, a_w, b_w, nd)
    out = _pallas_fwd_call(xt, at, bt, dims, nd, dc, interpret)
    b, h, w, c = x.shape
    s = jnp.transpose(out[:, :h, :c, :w], (0, 1, 3, 2))
    return s, (xt, at, bt, dims)


def _bank_mix_bwd(nd, dc, interpret, res, g):
    xt, at, bt, dims = res
    d = dims
    b, h, w, c, r = d["b"], d["h"], d["w"], d["c"], d["r"]
    gt = jnp.transpose(g.astype(xt.dtype), (0, 1, 3, 2))
    gt = jnp.pad(gt, ((0, 0), (0, d["hp"] - h), (0, d["cp"] - c),
                      (0, d["wp"] - w)))
    dxt, dat, dbt = _pallas_bwd_call(xt, at, bt, gt, dims, nd, dc, interpret)
    dx = jnp.transpose(dxt[:, :h, :c, :w], (0, 1, 3, 2))
    da = jnp.transpose(dat[:, :h, :d["k"] * r, :w], (0, 1, 3, 2))
    da = da.reshape(b, h, w, d["k"], r)
    db = dbt[:, :h, :, :w].reshape(b, h, r, d["cp"], w)[:, :, :, :c, :]
    db = jnp.transpose(db, (0, 1, 4, 3, 2))
    return dx, da, db


_bank_mix_pallas.defvjp(_bank_mix_fwd, _bank_mix_bwd)


# Max batch per Pallas dispatch. Inside the full grad-mode FRL training
# step, the current TPU relay backend raises a device-level fault
# ("UNAVAILABLE: TPU device error") whenever the step contains ANY Pallas
# smoothing dispatch and the batch exceeds 17 at production patch size
# (256^2) -- while the same kernel standalone at B=24, the forward-only
# step at B=20, and the all-XLA step at B=18 all execute cleanly, and the
# identical code ran B=24 end-to-end on the previous day's relay backend.
# Extensive bisection (see CLAUDE.md) exonerated the per-dispatch kernel
# geometry: identical 9-sample chunks appear in both passing (B=17) and
# faulting (B=18) configurations, and remat, donation, has_side_effects,
# chunk sizes 1..16, and an XLA-only backward all leave the fault in
# place. Chunked dispatch is kept because it measurably extends the
# working envelope (unchunked B=17 faults; chunked B=17 passes) and
# bounds per-dispatch buffer footprint. Chunks split NEAR-EQUALLY
# (18 -> 9+9, never 16+2) so XLA's memory-space-assignment never sees a
# tiny chunk result it would place in VMEM (observed as "S(1)" layouts
# on 1-2 sample tails; not itself the fault trigger, but gratuitous).
# B <= 16 (the production config) takes the identical single-call path.
# Override for experiments via FOREST_TPU_SMOOTH_BATCH_CHUNK.
_BATCH_CHUNK = int(os.environ.get("FOREST_TPU_SMOOTH_BATCH_CHUNK", "16"))

# Auto-routing ladder (VERDICT r3 weak #4 -> task #5): in AUTO mode
# (use_pallas=None) batches past the measured Pallas fault envelope
# (chunked dispatch survives to B=17; B>=18 faults on the affected relay
# backend regardless of chunk size) fall back to REMAT'd XLA smoothing:
# jax.checkpoint recomputes the directional banks in the backward instead
# of storing the [B,H,W,C,K] intermediate, which ducks the B=20 HBM OOM
# the plain XLA path hits (16.17 G needed vs 15.75 G). The routing is
# batch-size + env gated (the fault is environmental -- raise the cap
# when the relay backend recovers) and each distinct decision is logged
# once per process.
_PALLAS_MAX_BATCH = int(os.environ.get(
    "FOREST_TPU_SMOOTH_PALLAS_MAX_BATCH", "17"))
# Plain-XLA smoothing OOMs at B>=20 (256^2 production shapes); remat the
# fallback from this batch on even when use_pallas=False was explicit.
_XLA_REMAT_BATCH = int(os.environ.get(
    "FOREST_TPU_SMOOTH_XLA_REMAT_BATCH", "18"))
# Remat alone is NOT enough at B=20: the rematted block's [B,H,W,C,K]
# bank concatenate + mixing einsum temps coexist in the backward
# (measured 17.20 G needed vs 15.75 G HBM). The fallback therefore
# chunks the batch, each chunk its own checkpoint region, so peak temp
# is ONE chunk's bank tensor regardless of B.
_XLA_FALLBACK_CHUNK = int(os.environ.get(
    "FOREST_TPU_SMOOTH_XLA_CHUNK", "8"))
_routing_logged: set = set()


def _log_routing_once(key: str, message: str) -> None:
    if key not in _routing_logged:
        _routing_logged.add(key)
        import logging

        logging.getLogger("forest_tpu.ops.smoothing").warning(message)


def _chunk_bounds(b: int, chunk: int):
    """Near-equal split of ``b`` into ceil(b/chunk) parts (each <= chunk)."""
    n = -(-b // chunk)
    cuts = [round(i * b / n) for i in range(n + 1)]
    return list(zip(cuts[:-1], cuts[1:]))


def bank_mix(x: Array, a_w: Array, b_w: Array, *, num_directions: int = 4,
             coarse_dilation: int = 3, use_pallas: Optional[bool] = None,
             interpret: bool = False,
             batch_chunk: Optional[int] = None) -> Array:
    """Fused fine/coarse directional bank + rank-R mixing (differentiable).

    x [B,H,W,C]; a_w [B,H,W,K,R] softmaxed over K (k = 2*direction + scale);
    b_w [B,H,W,C,R] softmaxed over R. ``use_pallas=None`` auto-selects:
    the Pallas kernel on TPU backends up to ``_PALLAS_MAX_BATCH`` samples
    (chunked past ``_BATCH_CHUNK``), then remat'd XLA past the fault
    envelope -- no config change needed for large batches; the decision
    is logged once. Explicit ``use_pallas`` is honored (XLA still gains
    remat past ``_XLA_REMAT_BATCH`` to duck the B>=20 HBM OOM).
    ``batch_chunk`` caps the batch per Pallas dispatch (default
    ``_BATCH_CHUNK``); larger batches are split and concatenated."""
    b = x.shape[0]
    remat_xla = False
    if use_pallas is None:
        use_pallas = _on_tpu()
        if use_pallas and b > _PALLAS_MAX_BATCH:
            use_pallas = False
            remat_xla = True
            _log_routing_once(
                f"auto-xla-{b}",
                f"smoothing auto-route: batch {b} > Pallas fault "
                f"envelope ({_PALLAS_MAX_BATCH}); using remat'd XLA "
                "smoothing (override via "
                "FOREST_TPU_SMOOTH_PALLAS_MAX_BATCH)")
    if use_pallas or interpret:
        # Halo rows come from the adjacent row TILES, so the dilation is
        # bounded by the backward kernel's halved row tile: beyond it the
        # halo window silently truncates (forward) or the backward fails
        # at trace time with an opaque broadcast error.
        if coarse_dilation > _TH // 2:
            raise ValueError(
                f"coarse_dilation={coarse_dilation} exceeds the Pallas "
                f"kernel's halo capacity ({_TH // 2} = row tile / 2); use "
                "use_pallas=False for larger dilations")
        chunk = _BATCH_CHUNK if batch_chunk is None else batch_chunk
        if chunk and b > chunk:
            parts = [
                _bank_mix_pallas(x[lo:hi], a_w[lo:hi], b_w[lo:hi],
                                 num_directions, coarse_dilation, interpret)
                for lo, hi in _chunk_bounds(b, chunk)]
            return jnp.concatenate(parts, axis=0)
        return _bank_mix_pallas(x, a_w, b_w, num_directions, coarse_dilation,
                                interpret)
    if remat_xla or b >= _XLA_REMAT_BATCH:
        if not remat_xla:
            _log_routing_once(
                f"xla-remat-{b}",
                f"smoothing: chunked-remat XLA path at batch {b} >= "
                f"{_XLA_REMAT_BATCH} (plain XLA smoothing OOMs at B>=20 "
                "on 16 GB HBM; override via "
                "FOREST_TPU_SMOOTH_XLA_REMAT_BATCH)")
        fn = jax.checkpoint(functools.partial(
            bank_mix_xla, num_directions=num_directions,
            coarse_dilation=coarse_dilation))
        if _XLA_FALLBACK_CHUNK and b > _XLA_FALLBACK_CHUNK:
            parts = [fn(x[lo:hi], a_w[lo:hi], b_w[lo:hi])
                     for lo, hi in _chunk_bounds(b, _XLA_FALLBACK_CHUNK)]
            return jnp.concatenate(parts, axis=0)
        return fn(x, a_w, b_w)
    return bank_mix_xla(x, a_w, b_w, num_directions=num_directions,
                        coarse_dilation=coarse_dilation)


__all__ = ["bank_mix", "bank_mix_xla", "depthwise_bank_conv",
           "_direction_bank", "_sobel"]
