"""Vector-quantization hot core: fused Pallas TPU kernel + XLA reference path.

Behavioral contract reconstructed from the reference's (missing) ``vqvae.model``
package via its call sites (/root/reference/scripts/train_vqvae.py:183-198,
284-329; SURVEY.md §3): a codebook of K vectors of dim D, nearest-neighbor
assignment under squared L2 with deterministic lowest-index tie-break,
straight-through ("st") and EMA ("ema") quantizer variants, commitment cost
beta, perplexity diagnostic, and cumulative per-code usage tracking
(CodebookManager contract, /root/reference/scripts/export_codebook.py:124-128).

TPU-first design (NOT a torch translation):
- The hot path is one fused Pallas kernel per batch tile: distance matrix on
  the MXU (``-2 x @ C^T + ||C||^2`` -- the ``||x||^2`` term is dropped since it
  does not affect the argmin), argmin on the VPU, one-hot gather back through
  the MXU, and EMA sufficient statistics (per-code counts and vector sums)
  accumulated across grid steps in VMEM. One pass over HBM for x.
- Gradients: straight-through estimator via ``x + sg(q - x)``; the codebook
  gradient for the "st" variant flows through an XLA one-hot matmul (cheap --
  K*D ~ 32K floats), keeping the Pallas kernel gradient-free.
- Multi-chip: EMA counts/sums are *local* sufficient statistics; pass
  ``axis_name`` to :func:`ema_codebook_update` to psum them across the
  data-parallel mesh axis before folding into the EMA (the BASELINE.json north
  star: "codebook statistics psum'd across data-parallel replicas").
"""
from __future__ import annotations

import functools
from typing import NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from forest_tpu.ops._util import LANE as _LANE
from forest_tpu.ops._util import on_tpu as _on_tpu
from forest_tpu.ops._util import round_up as _round_up

Array = jax.Array


# ---------------------------------------------------------------------------
# XLA reference path (also the CPU / interpret fallback and autodiff surface)
# ---------------------------------------------------------------------------


def vq_distances_xla(x: Array, codebook: Array) -> Array:
    """Squared L2 distances [N, K] between x [N, D] and codebook [K, D].

    Computed as ||x||^2 - 2 x.C^T + ||C||^2 in fp32 on the MXU.
    """
    x = x.astype(jnp.float32)
    c = codebook.astype(jnp.float32)
    x2 = jnp.sum(x * x, axis=-1, keepdims=True)
    c2 = jnp.sum(c * c, axis=-1)
    xc = jnp.dot(x, c.T, preferred_element_type=jnp.float32)
    return x2 - 2.0 * xc + c2[None, :]


def _sanitize_dist(d: Array) -> Array:
    """NaN distances -> +inf on EVERY path, so both backends agree:

    - a NaN INPUT row NaNs the whole row -> all-inf -> argmin 0 (the
      containment index; unchanged behavior);
    - a NaN CODEBOOK row NaNs only its column -> that code is simply never
      assigned (it decays dead and is reseedable) instead of the paths
      diverging (XLA's raw argmin would pick the NaN code, the Pallas
      kernels' comparison-based argmin would pick 0 -- a silent
      bit-parity break that also hides codebook corruption)."""
    return jnp.where(jnp.isnan(d), jnp.float32(jnp.inf), d)


def _vq_core_xla(x: Array, codebook: Array, with_qx: bool = False):
    d = _sanitize_dist(vq_distances_xla(x, codebook))
    idx = jnp.argmin(d, axis=-1).astype(jnp.int32)  # lowest-index tie-break
    onehot = jax.nn.one_hot(idx, codebook.shape[0], dtype=jnp.float32)
    q = jnp.dot(onehot, codebook.astype(jnp.float32),
                preferred_element_type=jnp.float32)
    counts = jnp.sum(onehot, axis=0)
    sums = jnp.dot(onehot.T, x.astype(jnp.float32),
                   preferred_element_type=jnp.float32)
    if with_qx:
        return idx, q, counts, sums, jnp.sum(q * x.astype(jnp.float32))
    return idx, q, counts, sums


# ---------------------------------------------------------------------------
# Pallas fused kernel
# ---------------------------------------------------------------------------


def _vq_kernel(x_ref, c_ref, c2_ref, idx_ref, q_ref, counts_ref, sums_ref,
               *qx_ref, n_actual: int, tile_n: int):
    """One grid step: a (TILE_N, D) tile of x against the full (K, D) codebook.

    Outputs per tile: indices (int32), quantized vectors; accumulates EMA
    sufficient statistics (counts [1, K], sums [K, D]) across grid steps --
    TPU grids execute sequentially per core, so read-modify-write on the
    accumulator outputs is race-free. Rows past ``n_actual`` (padding) are
    masked out of the statistics.

    With a 5th output ref, the commitment dot sum(q*x) is fused in-VMEM
    while the q tile is still in registers -- the consumer-side XLA
    fusion the pallas_call boundary otherwise blocks (a bare outside
    sum(q*x) re-reads 2 N*D arrays from HBM). x's zero padding already
    nulls padded rows' contribution.
    """
    i = pl.program_id(0)

    x = x_ref[...]  # [T, D] fp32
    c = c_ref[...]  # [K, D] fp32
    # Distance (up to the x-norm constant): ||C||^2 - 2 x.C^T  -> [T, K]
    xc = jax.lax.dot_general(
        x, c, dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32)
    dist = c2_ref[...] - 2.0 * xc  # c2 is [1, K], broadcasts over rows
    # NaN -> +inf: identical to _sanitize_dist on the XLA path, so NaN
    # input rows land on index 0 and NaN codebook rows are never assigned
    # on EITHER backend.
    dist = jnp.where(jnp.isnan(dist), jnp.float32(jnp.inf), dist)

    k = dist.shape[1]
    # Deterministic lowest-index argmin on the VPU.
    min_d = jnp.min(dist, axis=1, keepdims=True)  # [T, 1]
    col = jax.lax.broadcasted_iota(jnp.int32, dist.shape, dimension=1)
    big = jnp.int32(k)
    idx = jnp.min(jnp.where(dist <= min_d, col, big), axis=1)  # [T]
    # Backstop: the sanitize above makes min_d finite-or-inf, so some
    # column always satisfies <=; never leak k as an index regardless.
    idx = jnp.where(idx >= k, 0, idx)
    idx_ref[...] = idx[:, None]

    # One-hot through the MXU: gather q and the EMA statistics in-tile.
    onehot = (col == idx[:, None]).astype(jnp.float32)  # [T, K]
    q_tile = jax.lax.dot_general(
        onehot, c, dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)
    q_ref[...] = q_tile

    # Mask padded rows (beyond n_actual) out of the sufficient statistics.
    row = jax.lax.broadcasted_iota(jnp.int32, (dist.shape[0], 1), dimension=0)
    valid = (i * tile_n + row) < n_actual  # [T, 1]
    onehot_v = jnp.where(valid, onehot, 0.0)
    tile_counts = jnp.sum(onehot_v, axis=0)[None, :]  # [1, K]
    tile_sums = jax.lax.dot_general(
        onehot_v, x, dimension_numbers=(((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)  # [K, D]

    tile_qx = (jnp.sum(q_tile * x) if qx_ref else None)

    @pl.when(i == 0)
    def _():
        counts_ref[...] = tile_counts
        sums_ref[...] = tile_sums
        if qx_ref:
            qx_ref[0][...] = jnp.full(qx_ref[0].shape, tile_qx,
                                      jnp.float32)

    @pl.when(i > 0)
    def _():
        counts_ref[...] = counts_ref[...] + tile_counts
        sums_ref[...] = sums_ref[...] + tile_sums
        if qx_ref:
            qx_ref[0][...] = qx_ref[0][...] + tile_qx


def _vq_core_pallas(x: Array, codebook: Array, *, tile_n: int = 1024,
                    interpret: bool = False, with_qx: bool = False):
    n, d = x.shape
    k = codebook.shape[0]
    dp = _round_up(d, _LANE)
    kp = _round_up(k, _LANE)
    npad = _round_up(max(n, 8), tile_n)

    xf = jnp.zeros((npad, dp), jnp.float32).at[:n, :d].set(
        x.astype(jnp.float32))
    cf = jnp.zeros((kp, dp), jnp.float32).at[:k, :d].set(
        codebook.astype(jnp.float32))
    c2 = jnp.sum(cf * cf, axis=-1)
    # Padding codes must never win the argmin.
    c2 = jnp.where(jnp.arange(kp) < k, c2, jnp.float32(jnp.inf))[None, :]

    grid = (npad // tile_n,)
    out_specs = [
        pl.BlockSpec((tile_n, 1), lambda i: (i, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((tile_n, dp), lambda i: (i, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, kp), lambda i: (0, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((kp, dp), lambda i: (0, 0), memory_space=pltpu.VMEM),
    ]
    out_shape = [
        jax.ShapeDtypeStruct((npad, 1), jnp.int32),
        jax.ShapeDtypeStruct((npad, dp), jnp.float32),
        jax.ShapeDtypeStruct((1, kp), jnp.float32),
        jax.ShapeDtypeStruct((kp, dp), jnp.float32),
    ]
    if with_qx:
        out_specs.append(pl.BlockSpec((1, _LANE), lambda i: (0, 0),
                                      memory_space=pltpu.VMEM))
        out_shape.append(jax.ShapeDtypeStruct((1, _LANE), jnp.float32))
    outs = pl.pallas_call(
        functools.partial(_vq_kernel, n_actual=n, tile_n=tile_n),
        grid=grid,
        in_specs=[
            pl.BlockSpec((tile_n, dp), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((kp, dp), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, kp), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=out_specs,
        out_shape=out_shape,
        cost_estimate=pl.CostEstimate(
            flops=4 * npad * kp * dp,
            bytes_accessed=4 * (npad * dp * 2 + kp * dp * 2 + npad * kp // 64),
            transcendentals=0,
        ),
        interpret=interpret,
    )(xf, cf, c2)

    idx, q, counts, sums = outs[:4]
    base = (idx[:n, 0], q[:n, :d], counts[0, :k], sums[:k, :d])
    if with_qx:
        return (*base, outs[4][0, 0])
    return base


def _vq_assign_kernel(x_ref, c_ref, c2_ref, idx_ref, *, mxu_bf16: bool):
    """Assignment-only grid step: distances + deterministic argmin, no q/stats.

    Hybrid layout (measured on v5e, scripts/bench_vq_variants.py): x streams
    ROW-major -- (tile, D) blocks are fully contiguous in HBM (a transposed
    [D, tile] block DMAs 8 KB strided segments at ~1/6 the bandwidth) --
    while the distance matrix is computed in the TRANSPOSED [K, tile]
    orientation via dot_general (no in-kernel transpose): anchors live in
    VPU lanes, so the argmin reduces over sublanes and the [1, tile] index
    store is lane-contiguous. The [K, tile] distances never touch HBM.

    ``mxu_bf16`` casts the matmul operands to bf16 (fp32 accumulate) -- the
    same numerics XLA's DEFAULT matmul precision uses for f32 inputs on TPU
    (in Mosaic an f32 dot is a native multi-pass fp32 matmul).
    """
    x = x_ref[...]                                     # [T, D]
    c = c_ref[...]                                     # [K, D]
    if mxu_bf16:
        x = x.astype(jnp.bfloat16)
        c = c.astype(jnp.bfloat16)
    xc = jax.lax.dot_general(                          # [K, T]
        c, x, dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32)
    dist = c2_ref[...] - 2.0 * xc                      # c2 [K, 1] broadcasts
    # NaN -> +inf (same convention as _sanitize_dist / _vq_kernel).
    dist = jnp.where(jnp.isnan(dist), jnp.float32(jnp.inf), dist)
    min_d = jnp.min(dist, axis=0, keepdims=True)       # [1, T]
    row = jax.lax.broadcasted_iota(jnp.int32, dist.shape, dimension=0)
    idx = jnp.min(jnp.where(dist <= min_d, row, jnp.int32(dist.shape[0])),
                  axis=0, keepdims=True)               # [1, T]
    # backstop only; the sanitize above keeps the comparison satisfiable
    idx = jnp.where(idx >= jnp.int32(dist.shape[0]), 0, idx)
    idx_ref[...] = idx


def _vq_assign_pallas(x: Array, codebook: Array, *, tile_n: int = 2048,
                      mxu_bf16: bool = False,
                      interpret: bool = False) -> Array:
    n, d = x.shape
    k = codebook.shape[0]
    dp = _round_up(d, _LANE)
    kp = _round_up(k, _LANE)
    npad = _round_up(max(n, 8), tile_n)

    xf = jnp.zeros((npad, dp), jnp.float32).at[:n, :d].set(
        x.astype(jnp.float32))
    cf = jnp.zeros((kp, dp), jnp.float32).at[:k, :d].set(
        codebook.astype(jnp.float32))
    c2 = jnp.sum(cf * cf, axis=-1)
    # Padding codes must never win the argmin.
    c2 = jnp.where(jnp.arange(kp) < k, c2, jnp.float32(jnp.inf))[:, None]

    idx = pl.pallas_call(
        functools.partial(_vq_assign_kernel, mxu_bf16=mxu_bf16),
        grid=(npad // tile_n,),
        in_specs=[
            pl.BlockSpec((tile_n, dp), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((kp, dp), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((kp, 1), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, tile_n), lambda i: (0, i),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((1, npad), jnp.int32),
        cost_estimate=pl.CostEstimate(
            flops=2 * npad * kp * dp,
            bytes_accessed=4 * (npad * dp + kp * dp + npad),
            transcendentals=0,
        ),
        interpret=interpret,
    )(xf, cf, c2)
    return idx[0, :n]


def vq_core(x: Array, codebook: Array, *, use_pallas: Optional[bool] = None,
            interpret: bool = False, with_qx: bool = False):
    """Fused assignment pass: (indices [N], quantized [N,D], counts [K], sums [K,D]).

    Non-differentiable (inputs are stop-gradiented by callers as needed).
    ``use_pallas=None`` auto-selects the Pallas kernel on TPU backends.
    ``with_qx=True`` appends the commitment dot ``sum(q * x)`` as a 5th
    return, fused INSIDE the Pallas kernel while the q tile is still in
    VMEM (an outside sum(q*x) costs a 2*N*D HBM re-read that XLA's
    consumer fusion avoids on its own path -- this restores the symmetry).
    """
    if use_pallas is None:
        use_pallas = _on_tpu()
    if use_pallas or interpret:
        return _vq_core_pallas(x, codebook, interpret=interpret,
                               with_qx=with_qx)
    return _vq_core_xla(x, codebook, with_qx=with_qx)


def vq_assign(x: Array, codebook: Array, *, use_pallas: Optional[bool] = None,
              interpret: bool = False, **kw) -> Array:
    """Nearest-code indices [N] (int32), lowest-index tie-break.

    Assignment-only fast path: on TPU this runs a distances+argmin Pallas
    kernel (no quantized output, no EMA statistics -- 1/3 the matmul FLOPs of
    :func:`vq_core` and no [N, K] distance matrix in HBM). Default numerics
    are f32, bit-consistent with vq_core's training-side assignments (the
    CLAUDE.md parity gate); pass ``mxu_bf16=True`` to opt into XLA-DEFAULT
    -precision bf16 distances (near-ties may flip) for extra speed.
    """
    known = {"mxu_bf16", "tile_n"}
    bad = set(kw) - known
    if bad:
        raise TypeError(f"vq_assign got unexpected kwargs {sorted(bad)}; "
                        f"accepted: {sorted(known)}")
    if use_pallas is None:
        use_pallas = _on_tpu()
    if use_pallas or interpret:
        return _vq_assign_pallas(x, codebook, interpret=interpret, **kw)
    # XLA fallback honors the same numerics knobs instead of silently
    # dropping them: mxu_bf16 rounds the matmul operands to bf16 with f32
    # accumulation, matching the kernel's cast.
    if kw.get("mxu_bf16"):
        x32 = x.astype(jnp.float32)
        c32 = codebook.astype(jnp.float32)
        xc = jnp.dot(x32.astype(jnp.bfloat16), c32.astype(jnp.bfloat16).T,
                     preferred_element_type=jnp.float32)
        d = (jnp.sum(x32 * x32, -1, keepdims=True) - 2.0 * xc
             + jnp.sum(c32 * c32, -1)[None, :])
    else:
        d = vq_distances_xla(x, codebook)
    return jnp.argmin(_sanitize_dist(d), axis=-1).astype(jnp.int32)


# ---------------------------------------------------------------------------
# Quantizer variants (gradient semantics)
# ---------------------------------------------------------------------------


class VQResult(NamedTuple):
    quantized: Array      # [N, D] straight-through output (grads -> encoder)
    indices: Array        # [N] int32
    vq_loss: Array        # scalar: codebook + beta*commitment (st) or beta*commit (ema)
    counts: Array         # [K] per-code assignment counts (this batch, local)
    sums: Array           # [K, D] per-code vector sums (this batch, local)
    perplexity: Array     # scalar exp(entropy) of the batch code distribution


def _ste(x: Array, q: Array) -> Array:
    return x + jax.lax.stop_gradient(q - x)


def perplexity_from_counts(counts: Array) -> Array:
    p = counts / jnp.maximum(jnp.sum(counts), 1.0)
    return jnp.exp(-jnp.sum(jnp.where(p > 0, p * jnp.log(p), 0.0)))


def quantize_st(x: Array, codebook: Array, beta: float = 0.25,
                **kw) -> VQResult:
    """Straight-through quantizer: codebook learns by gradient.

    vq_loss = ||sg(x) - q||^2 + beta * ||x - sg(q)||^2 (van den Oord et al.).
    """
    idx, _, counts, sums = vq_core(
        jax.lax.stop_gradient(x), jax.lax.stop_gradient(codebook), **kw)
    onehot = jax.nn.one_hot(idx, codebook.shape[0], dtype=x.dtype)
    # Keep the ST output in x.dtype (matching quantize_ema) so the
    # downstream compute dtype doesn't depend on the quantizer mode.
    q = jnp.dot(onehot, codebook,
                preferred_element_type=jnp.float32).astype(x.dtype)
    codebook_loss = jnp.mean(
        jnp.sum((jax.lax.stop_gradient(x) - q) ** 2, axis=-1))
    commit_loss = jnp.mean(
        jnp.sum((x - jax.lax.stop_gradient(q)) ** 2, axis=-1))
    vq_loss = codebook_loss + beta * commit_loss
    return VQResult(_ste(x, q), idx, vq_loss, counts, sums,
                    perplexity_from_counts(counts))


def quantize_ema(x: Array, codebook: Array, beta: float = 0.25,
                 **kw) -> VQResult:
    """EMA quantizer: codebook updated by :func:`ema_codebook_update`, not grads.

    vq_loss = beta * ||x - sg(q)||^2 (commitment only).
    """
    idx, q, counts, sums = vq_core(
        jax.lax.stop_gradient(x), jax.lax.stop_gradient(codebook), **kw)
    q = q.astype(x.dtype)
    commit_loss = jnp.mean(jnp.sum((x - q) ** 2, axis=-1))
    return VQResult(_ste(x, q), idx, beta * commit_loss, counts, sums,
                    perplexity_from_counts(counts))


def quantize(x: Array, codebook: Array, mode: str = "ema", beta: float = 0.25,
             **kw) -> VQResult:
    if mode == "st":
        return quantize_st(x, codebook, beta, **kw)
    if mode == "ema":
        return quantize_ema(x, codebook, beta, **kw)
    raise ValueError(f"unknown quantizer mode {mode!r} (expected 'st'|'ema')")


# ---------------------------------------------------------------------------
# EMA codebook state
# ---------------------------------------------------------------------------


class VQStats(NamedTuple):
    """EMA state + cumulative usage (the CodebookManager contract)."""
    cluster_size: Array   # [K] EMA of per-code counts
    cluster_sum: Array    # [K, D] EMA of per-code vector sums
    code_usage: Array     # [K] cumulative (non-EMA) assignment counts

    @staticmethod
    def init(num_codes: int, code_dim: int, dtype=jnp.float32,
             codebook: Optional[Array] = None) -> "VQStats":
        """``codebook`` given (the production path, vqvae_step
        init_train_state): seed cluster_size=1 and cluster_sum=codebook so
        a never-assigned code's EMA ratio stays EXACTLY its init vector
        (size and sum decay at the same rate) instead of collapsing to the
        zero vector on the first update -- zero-init made every unassigned
        code row 0/smoothed = 0 after batch 1, and identical zero rows
        dead-lock under the lowest-index tie-break (permanent capacity
        loss unless reseeding runs). Without a codebook the legacy
        zero-init is kept for callers that fold stats from scratch."""
        if codebook is not None:
            # copy=True: the stats leaf must not ALIAS the params leaf --
            # a shared buffer donated twice (donate_argnums on the train
            # state) is an XLA execution error.
            return VQStats(jnp.ones((num_codes,), dtype),
                           jnp.array(codebook, dtype=dtype, copy=True),
                           jnp.zeros((num_codes,), dtype))
        return VQStats(jnp.zeros((num_codes,), dtype),
                       jnp.zeros((num_codes, code_dim), dtype),
                       jnp.zeros((num_codes,), dtype))


def ema_codebook_update(stats: VQStats, codebook: Array, counts: Array,
                        sums: Array, decay: float = 0.99, eps: float = 1e-5,
                        axis_name: Optional[str] = None
                        ) -> Tuple[VQStats, Array]:
    """Fold one batch's sufficient statistics into the EMA codebook.

    With ``axis_name`` set (inside pmap/shard_map), counts and sums are first
    psum'd across the data-parallel axis so every replica applies the identical
    global update -- the TPU-native replacement for the reference's single-GPU
    update (SURVEY.md §6.8).
    Laplace smoothing keeps dead codes numerically alive.
    """
    if axis_name is not None:
        counts = jax.lax.psum(counts, axis_name)
        sums = jax.lax.psum(sums, axis_name)
    k = stats.cluster_size.shape[0]
    new_size = decay * stats.cluster_size + (1.0 - decay) * counts
    new_sum = decay * stats.cluster_sum + (1.0 - decay) * sums
    n = jnp.sum(new_size)
    smoothed = (new_size + eps) / (n + k * eps) * n
    new_codebook = new_sum / smoothed[:, None]
    new_stats = VQStats(new_size, new_sum, stats.code_usage + counts)
    return new_stats, new_codebook.astype(codebook.dtype)


def reseed_dead_codes(codebook: Array, stats: VQStats, candidates: Array,
                      key: Array, threshold: float = 1e-3
                      ) -> Tuple[Array, VQStats]:
    """Replace codes whose EMA cluster size fell below ``threshold`` with
    random encoder outputs from the current batch (dead-code revival implied by
    the CodebookManager usage tracking, SURVEY.md §3). In-graph: a masked
    ``where``, safe under jit.
    """
    k, d = codebook.shape
    dead = stats.cluster_size < threshold  # [K]
    pick = jax.random.randint(key, (k,), 0, candidates.shape[0])
    fresh = candidates[pick].astype(codebook.dtype)  # [K, D]
    new_cb = jnp.where(dead[:, None], fresh, codebook)
    # Reset EMA state for revived codes so stale sums don't drag them back.
    mean_size = jnp.maximum(jnp.mean(stats.cluster_size), 1.0)
    new_stats = VQStats(
        jnp.where(dead, mean_size, stats.cluster_size),
        jnp.where(dead[:, None], fresh * mean_size, stats.cluster_sum),
        stats.code_usage,
    )
    return new_cb, new_stats


__all__ = [
    "VQResult", "VQStats", "vq_core", "vq_assign", "vq_distances_xla",
    "quantize", "quantize_st", "quantize_ema", "ema_codebook_update",
    "reseed_dead_codes", "perplexity_from_counts",
]
