"""MXU row scatter-add: the backward of batched row extraction.

The FRL step extracts ~2k rows per sample from the [B, H*W, C] type-embedding
grid (anchors + positive neighbors + the shared negative pool,
training/representation/step.py stage 3). XLA lowers the transpose of that
gather to a serial per-row scatter-add (~150-220 ns/row regardless of
hints -- measured in scripts/bench_scatter_model.py), which at production
scale (12 x 2012 rows) is ~5 ms/step, the single largest op left in the
step. The reference never sees this cost: torch's CUDA ``index_put_``
scatters in parallel (/root/reference/frl/training/representation/step.py
builds the same anchor/neighbor extractions via advanced indexing).

TPU-native reformulation: scatter-add into a table of R rows is a one-hot
matmul -- ``out[p, c] = sum_j [idx_j == p] * dz[j, c]`` -- but a dense
one-hot over R=65536 rows is 1.6 G compares/step. Instead:

1. Group the N cotangent rows by destination TILE (R is cut into
   ``tile_rows``-row tiles): a rank/counting pass in pure XLA
   (broadcast compares, no sort network, no scatter).
2. Reorder rows into tile order with ONE one-hot permutation einsum over
   the small N axis (backward-free; N ~ 2k, so the [N, N] one-hot is
   cheap on the MXU).
3. A Pallas kernel walks (batch, tile) grid steps; each step slices the
   tile's contiguous run of sorted rows (dynamic, 128-aligned via the
   in-kernel shift mask), builds a [tile_rows, cap] one-hot by lane
   compares, and accumulates through one MXU matmul. f32 one-hot matmul
   is exact: products are 0 or the row value, so duplicates accumulate in
   f32 like the serial scatter (order may differ -> last-bit tolerance).

If any tile holds more than the static ``cap`` rows (adversarial anchor
clustering), a ``lax.cond`` falls back to XLA's sorted segment-sum inside
the same jitted graph -- correctness never depends on the cap.
"""
from __future__ import annotations

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from forest_tpu.ops._util import LANE as _LANE
from forest_tpu.ops._util import on_tpu as _on_tpu
from forest_tpu.ops._util import round_up as _round_up

Array = jax.Array


# ---------------------------------------------------------------------
# host-graph side: tile grouping
# ---------------------------------------------------------------------
def _rank_and_bounds(flat_idx: Array, n_rows: int, tile_rows: int
                     ) -> Tuple[Array, Array, Array]:
    """Group rows by destination tile without sort networks or scatters.

    flat_idx [B, N] int32 in [0, n_rows) (padding rows carry ``n_rows``).
    Returns (dest [B, N] position of row j in tile-grouped order,
    bounds [B, T+1] start offset of each tile's run, maxcnt scalar).
    """
    n_tiles = n_rows // tile_rows
    tile = flat_idx // tile_rows                                # [B, N]
    # bounds[b, t] = #rows with tile < t  (tile-start offsets)
    starts = jnp.arange(n_tiles + 1, dtype=flat_idx.dtype)      # [T+1]
    bounds = jnp.sum(tile[:, :, None] < starts[None, None, :],
                     axis=1).astype(jnp.int32)                  # [B, T+1]
    # dest[b, j] = #rows before j in tile-grouped stable order
    lt = tile[:, :, None] < tile[:, None, :]                    # j' vs j
    eq = tile[:, :, None] == tile[:, None, :]
    n = flat_idx.shape[1]
    before = jnp.tril(jnp.ones((n, n), bool), k=-1)             # j' < j
    dest = jnp.sum(lt | (eq & before.T[None]), axis=1).astype(jnp.int32)
    maxcnt = jnp.max(bounds[:, 1:] - bounds[:, :-1])
    return dest, bounds, maxcnt


def _permute_rows(dz: Array, dest: Array) -> Array:
    """Reorder rows so each tile's rows are contiguous: out[dest[j]] = dz[j].

    One-hot einsum on the small N axis -- its transpose is another matmul,
    but this path only ever runs on cotangents (no further backward).
    f32 * {0,1} products are exact at HIGHEST precision.
    """
    n = dz.shape[1]
    onehot = (dest[:, :, None]
              == jnp.arange(n, dtype=dest.dtype)[None, None, :])
    return jnp.einsum("bjm,bjc->bmc", onehot.astype(dz.dtype), dz,
                      precision=jax.lax.Precision.HIGHEST)


# ---------------------------------------------------------------------
# Pallas kernel
# ---------------------------------------------------------------------
def _scatter_kernel(bounds_ref, sidx_ref, sdz_ref, out_ref, *,
                    tile_rows: int, cap: int, n_pad: int):
    b = pl.program_id(0)
    t = pl.program_id(1)
    lo = bounds_ref[b, t]
    hi = bounds_ref[b, t + 1]
    # 128-align the dynamic slice start; mask the overhang below.
    lo_a = jnp.minimum((lo // _LANE) * _LANE, n_pad - cap)
    # n_pad and cap are both lane multiples, so lo_a stays 128-aligned;
    # Mosaic needs the explicit hint to allow the dynamic vector loads.
    lo_a = pl.multiple_of(lo_a, _LANE)
    # sidx rides as ONE full [B, n_pad] block (tiny, DMA'd once): a
    # (1, n_pad) per-sample block would violate the sublane-divisibility
    # rule for block shapes.
    idx_s = sidx_ref[pl.ds(b, 1), pl.ds(lo_a, cap)]             # [1, cap]
    dz_s = sdz_ref[0, pl.ds(lo_a, cap), :]                      # [cap, C]
    j = jax.lax.broadcasted_iota(jnp.int32, (tile_rows, cap), 1)
    valid = (j >= lo - lo_a) & (j < hi - lo_a)
    rows = (jax.lax.broadcasted_iota(jnp.int32, (tile_rows, cap), 0)
            + t * tile_rows)
    onehot = jnp.where(valid & (idx_s == rows), 1.0, 0.0)
    # HIGHEST precision: Mosaic's default f32 dot truncates operands to
    # single-pass bf16 (measured ~1.6e-2 abs error on N(0,1) sums on
    # v5e); 0/1 one-hot times f32 rows is exact only with the full
    # multi-pass f32 contraction.
    out_ref[...] = jax.lax.dot_general(
        onehot, dz_s, dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST)[None]


def _scatter_pallas(sidx: Array, sdz: Array, bounds: Array, n_rows: int,
                    tile_rows: int, cap: int, interpret: bool) -> Array:
    bsz, n_pad = sidx.shape
    c = sdz.shape[-1]
    n_tiles = n_rows // tile_rows
    kernel = functools.partial(_scatter_kernel, tile_rows=tile_rows,
                               cap=cap, n_pad=n_pad)
    out = pl.pallas_call(
        kernel,
        grid=(bsz, n_tiles),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),  # bounds, whole array
            pl.BlockSpec((bsz, n_pad), lambda b, t: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, n_pad, c), lambda b, t: (b, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, tile_rows, c), lambda b, t: (b, t, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((bsz, n_rows, c), jnp.float32),
        cost_estimate=pl.CostEstimate(
            flops=2 * bsz * n_rows * cap * c,
            bytes_accessed=4 * bsz * (n_rows * c + n_pad * c * n_tiles // 8),
            transcendentals=0,
        ),
        interpret=interpret,
    )(bounds, sidx, sdz)
    return out


def _scatter_xla(idx: Array, dz: Array, n_rows: int) -> Array:
    """Plain segment-sum fallback (same [B, n_rows, C] contract).

    Tile-grouped order is NOT index-sorted, so no sortedness hint."""
    def one(i, g):
        return jax.ops.segment_sum(g, i, num_segments=n_rows)
    return jax.vmap(one)(idx, dz)


# ---------------------------------------------------------------------
# public op
# ---------------------------------------------------------------------
def scatter_add_rows(dz: Array, flat_idx: Array, n_rows: int, *,
                     tile_rows: int = 2048, cap: int = 384,
                     use_pallas: Optional[bool] = None,
                     interpret: bool = False) -> Array:
    """out[b, p, c] = sum over j with flat_idx[b, j] == p of dz[b, j, c].

    dz [B, N, C] float32, flat_idx [B, N] int32 in [0, n_rows);
    out [B, n_rows, C] float32. ``n_rows`` must be a tile_rows multiple.
    ``use_pallas=None`` auto-selects the kernel on TPU backends.
    """
    if use_pallas is None:
        use_pallas = _on_tpu()
    use_pallas = use_pallas or interpret
    if dz.dtype != jnp.float32:
        dz = dz.astype(jnp.float32)
    bsz, n, c = dz.shape
    if not use_pallas:
        def one(i, g):
            return jnp.zeros((n_rows, c), g.dtype).at[i].add(g)
        return jax.vmap(one)(flat_idx, dz)
    if n_rows % tile_rows:
        raise ValueError(f"n_rows={n_rows} not a multiple of {tile_rows}")

    n_pad = _round_up(max(n, cap), _LANE)
    idx_p = jnp.full((bsz, n_pad), n_rows, jnp.int32).at[:, :n].set(
        flat_idx.astype(jnp.int32))
    dz_p = jnp.zeros((bsz, n_pad, c), jnp.float32).at[:, :n].set(dz)

    dest, bounds, maxcnt = _rank_and_bounds(idx_p, n_rows, tile_rows)
    # One permutation pass for rows AND their indices: carry the index as
    # an extra channel so the [N, N] one-hot materializes once. Index
    # values stay exact in f32 (< 2^24).
    dzx = jnp.concatenate([dz_p, idx_p[..., None].astype(jnp.float32)],
                          axis=-1)
    sorted_ = _permute_rows(dzx, dest)
    sdz = sorted_[..., :c]
    sidx = sorted_[..., c].astype(jnp.int32)

    # The static cap covers maxcnt rows plus <=127 alignment overhang.
    fits = maxcnt <= (cap - (_LANE - 1))
    return jax.lax.cond(
        fits,
        lambda: _scatter_pallas(sidx, sdz, bounds, n_rows, tile_rows, cap,
                                interpret),
        lambda: _scatter_xla(idx_p, dz_p, n_rows))


# ---------------------------------------------------------------------
# custom-VJP extraction built on it
# ---------------------------------------------------------------------
@functools.partial(jax.custom_vjp, nondiff_argnums=(2, 3))
def extract_rows(grid: Array, flat_idx: Array,
                 use_pallas: Optional[bool] = None,
                 interpret: bool = False) -> Array:
    """grid [B, R, C], flat_idx [B, N] -> [B, N, C]; backward is the MXU
    scatter instead of XLA's serial per-row scatter-add."""
    return jnp.take_along_axis(grid, flat_idx[:, :, None], axis=1)


def _extract_fwd(grid, flat_idx, use_pallas, interpret):
    # residuals must be JAX types: carry the grid dtype as a 0-d token
    return extract_rows(grid, flat_idx, use_pallas, interpret), (
        flat_idx, grid.shape[1], jnp.zeros((), grid.dtype))


def _extract_bwd(use_pallas, interpret, res, ct):
    flat_idx, n_rows, dtype_token = res
    dg = scatter_add_rows(ct, flat_idx, n_rows, use_pallas=use_pallas,
                          interpret=interpret)
    return dg.astype(dtype_token.dtype), None


extract_rows.defvjp(_extract_fwd, _extract_bwd)


def extract_at_coords(grid: Array, coords: Array, *,
                      use_pallas: Optional[bool] = None,
                      interpret: bool = False) -> Array:
    """grid [B, H, W, C], coords [B, N, 2] (row, col) -> [B, N, C].

    Drop-in for ``vmap(spatial.extract_at_locations)`` with the MXU
    scatter backward. Requires H*W to be a 2048 multiple (production
    patch sizes 128/256/512 all qualify); callers with odd shapes use the
    XLA path.
    """
    b, h, w, c = grid.shape
    flat = (coords[..., 0] * w + coords[..., 1]).astype(jnp.int32)
    if use_pallas is None:
        use_pallas = _on_tpu()
    use_pallas = use_pallas or interpret
    if use_pallas and (h * w) % 2048:
        use_pallas, interpret = False, False
    out = extract_rows(grid.reshape(b, h * w, c), flat, use_pallas,
                       interpret)
    return out


__all__ = ["scatter_add_rows", "extract_rows", "extract_at_coords"]
