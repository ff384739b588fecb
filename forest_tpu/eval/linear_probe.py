"""Closed-form streaming ridge probes + SGD variant on frozen encoders.

Behavioral contracts (SURVEY.md §2.7, §4.5):

- fit_linear_probe (/root/reference/frl/training/fit_linear_probe.py:1-15):
  stream TRAIN-split patches through the frozen encoder, accumulate X^T X /
  X^T Y over valid pixels (never materializing the design matrix), solve
  ridge ``argmin ||XW + b - Y||^2 + lam ||W||^2`` in closed form with a
  bias column, report per-metric masked MSE and R^2 on train and val;
- fit_phase_linear_probe (fit_phase_linear_probe.py): the probe input is
  ``[z_type, z_phase, z_type (x) z_phase]`` at anchor pixels against
  whitened phase targets;
- train_linear_probe (train_linear_probe.py): the SGD variant (optax) kept
  for parity.

The accumulation (X^T X) is jitted -- it is a plain matmul reduction, MXU
work (SURVEY.md §8.2 item 6).
"""
from __future__ import annotations

from typing import Callable, Dict, List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

Array = jax.Array


class StreamingRidge:
    """Accumulate sufficient statistics for ridge regression with bias.

    ``f64_blocks=True`` computes each block's Gram product on the HOST in
    float64 (matching the reference's ``Xaug.astype(np.float64)`` before
    ``Xaug.T @ Xaug``, fit_phase_linear_probe.py:668-675); the default
    keeps the fast device f32 per-block product with float64 cross-block
    accumulation."""

    def __init__(self, in_dim: int, out_dim: int, f64_blocks: bool = False):
        d = in_dim + 1  # bias column
        self.xtx = np.zeros((d, d), np.float64)
        self.xty = np.zeros((d, out_dim), np.float64)
        self.n = 0
        self.f64_blocks = f64_blocks

        @jax.jit
        def _acc(x, y, valid):
            v = valid.astype(jnp.float32)
            xb = jnp.concatenate(
                [x, jnp.ones((x.shape[0], 1), x.dtype)], axis=1)
            xb = xb * v[:, None]
            y = jnp.where(valid[:, None], y, 0.0)
            return (jnp.dot(xb.T, xb, preferred_element_type=jnp.float32),
                    jnp.dot(xb.T, y, preferred_element_type=jnp.float32),
                    jnp.sum(v))

        self._acc = _acc

    def update(self, x: Array, y: Array,
               valid: Optional[Array] = None) -> None:
        """x [N, D]; y [N, K]; valid [N]."""
        if self.f64_blocks:
            x = np.asarray(x, np.float64)
            y = np.asarray(y, np.float64)
            if valid is None:
                valid = np.isfinite(y).all(1) & np.isfinite(x).all(1)
            v = np.asarray(valid, bool)
            xb = np.concatenate([x, np.ones((x.shape[0], 1))], axis=1)[v]
            self.xtx += xb.T @ xb
            self.xty += xb.T @ y[v]
            self.n += int(v.sum())
            return
        if valid is None:
            valid = jnp.all(jnp.isfinite(y), axis=1) \
                & jnp.all(jnp.isfinite(x), axis=1)
        a, b, n = self._acc(jnp.asarray(x), jnp.asarray(y),
                            jnp.asarray(valid))
        self.xtx += np.asarray(a, np.float64)
        self.xty += np.asarray(b, np.float64)
        self.n += int(n)

    def solve(self, lam: float = 1e-3) -> np.ndarray:
        d = self.xtx.shape[0]
        reg = lam * np.eye(d)
        reg[-1, -1] = 0.0  # don't penalize the bias
        return np.linalg.solve(self.xtx + reg, self.xty)  # [D+1, K]


def predict(w: np.ndarray, x: np.ndarray) -> np.ndarray:
    return x @ w[:-1] + w[-1]


def masked_r2(pred: np.ndarray, y: np.ndarray,
              valid: np.ndarray) -> np.ndarray:
    """Per-column R^2 over valid rows."""
    out = np.zeros(y.shape[1])
    for k in range(y.shape[1]):
        v = valid & np.isfinite(y[:, k]) & np.isfinite(pred[:, k])
        if v.sum() < 2:
            out[k] = np.nan
            continue
        yy, pp = y[v, k], pred[v, k]
        ss_res = np.sum((yy - pp) ** 2)
        ss_tot = np.sum((yy - yy.mean()) ** 2)
        out[k] = 1.0 - ss_res / max(ss_tot, 1e-12)
    return out


def _iter_embeddings(encode_fn: Callable, dataset, fb, target_feature: str,
                     max_batches: Optional[int], batch_size: int = 4):
    """Yield (z [N, D], targets [N, K], valid [N]) per batch of patches."""
    n = len(dataset)
    count = 0
    for i in range(0, n, batch_size):
        idx = list(range(i, min(i + batch_size, n)))
        batch = {k: jnp.asarray(v)
                 for k, v in dataset.load_batch(idx).items()}
        z = encode_fn(batch)                       # [B, H, W, D]
        y, ym = fb.build_feature(target_feature, batch)  # [B, H, W, K]
        d = z.shape[-1]
        k = y.shape[-1]
        yield (np.asarray(z).reshape(-1, d),
               np.asarray(y).reshape(-1, k),
               np.asarray(jnp.all(ym, axis=-1)).reshape(-1))
        count += 1
        if max_batches and count >= max_batches:
            break


def fit_linear_probe(encode_fn: Callable, fb, ds_train, ds_val,
                     target_feature: str, ridge_lambda: float = 1e-3,
                     max_batches_train: Optional[int] = None,
                     max_batches_eval: Optional[int] = None,
                     batch_size: int = 4) -> Dict[str, np.ndarray]:
    """Closed-form probe. ``encode_fn(batch) -> [B, H, W, D]`` (frozen).

    Returns dict with weights and per-metric train/val R^2 + MSE arrays
    aligned to the target feature's channel order.
    """
    try:
        first = next(_iter_embeddings(encode_fn, ds_train, fb,
                                      target_feature, 1, batch_size))
    except StopIteration:
        raise ValueError(
            "train dataset yielded no patches -- check the split / "
            "split_block_size geometry") from None
    ridge = StreamingRidge(first[0].shape[1], first[1].shape[1])
    for z, y, v in _iter_embeddings(encode_fn, ds_train, fb,
                                    target_feature, max_batches_train,
                                    batch_size):
        ridge.update(z, y, jnp.asarray(v))
    w = ridge.solve(ridge_lambda)

    out = {"weights": w, "n_train_pixels": ridge.n}
    for name, ds, mb in (("train", ds_train, max_batches_eval),
                         ("val", ds_val, max_batches_eval)):
        zs, ys, vs = [], [], []
        for z, y, v in _iter_embeddings(encode_fn, ds, fb, target_feature,
                                        mb, batch_size):
            zs.append(z)
            ys.append(y)
            vs.append(v)
        z = np.concatenate(zs)
        y = np.concatenate(ys)
        v = np.concatenate(vs)
        pred = predict(w, z)
        out[f"r2_{name}"] = masked_r2(pred, y, v)
        err = np.where(v[:, None], (pred - y) ** 2, 0.0)
        out[f"mse_{name}"] = err.sum(0) / np.maximum(v.sum(), 1)
    return out


def phase_probe_inputs(z_type: Array, z_phase: Array) -> Array:
    """[N, zt], [N, zp] -> [N, zt + zp + zt*zp] (the fit_phase_linear_probe
    design matrix: [z_type, z_phase, z_type (x) z_phase])."""
    outer = (z_type[:, :, None] * z_phase[:, None, :]).reshape(
        z_type.shape[0], -1)
    return jnp.concatenate([z_type, z_phase, outer], axis=1)


def fit_phase_linear_probe(encode_type_fn: Callable,
                           encode_phase_fn: Callable, fb, ds_train, ds_val,
                           target_feature: str, anchor_stride: int = 4,
                           ridge_lambda: float = 1e-3,
                           max_batches: Optional[int] = None,
                           batch_size: int = 2) -> Dict[str, np.ndarray]:
    """Probe [z_type, z_phase, outer] at strided anchor pixels against a
    temporal target feature (whitened phase targets)."""

    def batches(ds):
        n = len(ds)
        count = 0
        for i in range(0, n, batch_size):
            idx = list(range(i, min(i + batch_size, n)))
            batch = {k: jnp.asarray(v)
                     for k, v in ds.load_batch(idx).items()}
            zt = encode_type_fn(batch)           # [B, H, W, zt]
            h, w = zt.shape[1:3]
            rr, cc = jnp.meshgrid(jnp.arange(0, h, anchor_stride),
                                  jnp.arange(0, w, anchor_stride),
                                  indexing="ij")
            coords = jnp.stack([rr.reshape(-1), cc.reshape(-1)], 1)
            zp, ta, tm = encode_phase_fn(batch, coords)  # [B,A,T,zp], tgt
            b, a, t, _ = zp.shape
            zt_a = jax.vmap(
                lambda z, c: z[c[:, 0], c[:, 1]],
                in_axes=(0, None))(zt, coords)   # [B, A, zt]
            zt_rep = jnp.repeat(zt_a[:, :, None, :], t, axis=2)
            x = phase_probe_inputs(
                zt_rep.reshape(-1, zt_a.shape[-1]),
                zp.reshape(-1, zp.shape[-1]))
            y = np.asarray(ta).reshape(x.shape[0], -1)
            v = np.asarray(tm).reshape(x.shape[0], -1).all(1)
            yield np.asarray(x), y, v
            count += 1
            if max_batches and count >= max_batches:
                break

    first = next(batches(ds_train))
    ridge = StreamingRidge(first[0].shape[1], first[1].shape[1])
    for x, y, v in batches(ds_train):
        ridge.update(jnp.asarray(x), jnp.asarray(y), jnp.asarray(v))
    w = ridge.solve(ridge_lambda)
    out = {"weights": w, "n_train_pixels": ridge.n}
    for name, ds in (("train", ds_train), ("val", ds_val)):
        xs, ys, vs = [], [], []
        for x, y, v in batches(ds):
            xs.append(x)
            ys.append(y)
            vs.append(v)
        x = np.concatenate(xs)
        y = np.concatenate(ys)
        v = np.concatenate(vs)
        out[f"r2_{name}"] = masked_r2(predict(w, x), y, v)
    return out


def train_linear_probe(x: np.ndarray, y: np.ndarray, valid: np.ndarray,
                       lr: float = 1e-2, steps: int = 500,
                       weight_decay: float = 1e-4,
                       batch_size: int = 4096, seed: int = 0
                       ) -> np.ndarray:
    """SGD probe variant (train_linear_probe.py parity): returns W [D+1, K]."""
    import optax

    d, k = x.shape[1], y.shape[1]
    params = {"w": jnp.zeros((d, k)), "b": jnp.zeros((k,))}
    opt = optax.adamw(lr, weight_decay=weight_decay)
    opt_state = opt.init(params)
    xj = jnp.asarray(x)
    yj = jnp.where(jnp.asarray(valid)[:, None], jnp.asarray(y), 0.0)
    vj = jnp.asarray(valid, jnp.float32)

    @jax.jit
    def step(params, opt_state, key):
        idx = jax.random.randint(key, (min(batch_size, x.shape[0]),), 0,
                                 x.shape[0])

        def loss_fn(p):
            pred = xj[idx] @ p["w"] + p["b"]
            err = ((pred - yj[idx]) ** 2).sum(-1) * vj[idx]
            return jnp.sum(err) / jnp.maximum(jnp.sum(vj[idx]), 1.0)

        g = jax.grad(loss_fn)(params)
        updates, opt_state = opt.update(g, opt_state, params)
        return optax.apply_updates(params, updates), opt_state

    key = jax.random.key(seed)
    for i in range(steps):
        key, sub = jax.random.split(key)
        params, opt_state = step(params, opt_state, sub)
    return np.concatenate([np.asarray(params["w"]),
                           np.asarray(params["b"])[None, :]], axis=0)


__all__ = ["StreamingRidge", "fit_linear_probe", "fit_phase_linear_probe",
           "train_linear_probe", "masked_r2", "predict",
           "phase_probe_inputs"]
