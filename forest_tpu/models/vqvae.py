"""Mixed-input geospatial VQ-VAE (Flax).

Implements the behavioral contract of the reference's missing ``vqvae.model``
package, reconstructed from call sites (SURVEY.md §3;
/root/reference/scripts/train_vqvae.py:183-198,284-329 and the model docstring
quoted at train_vqvae.py:11-13): a MixedInputEncoder (normalized continuous
time series, per-categorical learned embeddings, a NAIP patch encoder) feeding
a VectorQuantizer (straight-through or EMA), then per-head decoders
reconstructing the continuous channels, every categorical head, and a scalar
canopy target. Forward returns
``(cont_pred [B,T,C_cont], cat_logits {name: [B,T,num_ids]}, canopy_pred [B],
vq_loss, perplexity)`` plus EMA sufficient statistics.

TPU-first design decisions (the reference's encoder internals are unknown and
were never going to be copied):
- the unit of modeling is one 30 m pixel: a T-step mixed time series plus a
  (krow, kcol) NAIP patch (/root/reference/VQ-VAE description.:1-13);
- all temporal mixing is static-shape dense algebra over the flattened
  [B*T, ...] axis -- T is tiny (5), so time is folded into feature space with
  a learned per-timestep embedding rather than a conv/RNN, keeping everything
  on the MXU with zero dynamic control flow;
- the quantizer hot core is the fused Pallas kernel in
  :mod:`forest_tpu.ops.vq`; EMA updates are applied functionally by the train
  step (with cross-replica psum), never inside ``apply``.
"""
from __future__ import annotations

from typing import Any, Dict, NamedTuple, Optional, Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from forest_tpu.ops import vq as vq_ops

Array = jax.Array


class VQVAEOutput(NamedTuple):
    cont_pred: Array                 # [B, T, C_cont]
    cat_logits: Dict[str, Array]     # {name: [B, T, num_ids]}
    canopy_pred: Array               # [B]
    vq_loss: Array                   # scalar
    perplexity: Array                # scalar
    indices: Array                   # [B] int32 codebook assignment
    counts: Array                    # [K] this-batch per-code counts (local)
    sums: Array                      # [K, D] this-batch per-code sums (local)
    z_e: Array                       # [B, D] pre-quantization encoder output


class MixedInputEncoder(nn.Module):
    """Continuous TS + categorical TS + NAIP patch -> [B, emb_dim]."""
    cat_vocab_sizes: Dict[str, int]
    emb_dim: int = 128
    hidden: int = 128
    cat_emb_dim: int = 8

    @nn.compact
    def __call__(self, cont: Array, cat: Array, naip: Array,
                 cont_nan_mask: Optional[Array] = None,
                 naip_nan_mask: Optional[Array] = None) -> Array:
        b, t, c_cont = cont.shape
        feats = []
        if c_cont:
            # NaN-safe continuous input with an explicit missingness channel
            # per feature (the loader's cont_nan_mask contract, SURVEY.md §3).
            finite = jnp.isfinite(cont)
            if cont_nan_mask is not None:
                finite = finite & (cont_nan_mask > 0)
            xc = jnp.where(finite, cont, 0.0)
            feats += [xc, finite.astype(xc.dtype)]

        # Per-categorical learned embeddings (dense ids, MISS=0/UNK=1).
        names = sorted(self.cat_vocab_sizes)
        for i, name in enumerate(names):
            emb = nn.Embed(self.cat_vocab_sizes[name], self.cat_emb_dim,
                           name=f"cat_emb_{name}")
            ids = jnp.clip(cat[..., i], 0, self.cat_vocab_sizes[name] - 1)
            feats.append(emb(ids.astype(jnp.int32)))
        x = jnp.concatenate(feats, axis=-1)  # [B, T, F]

        # Learned per-timestep embedding added before temporal pooling:
        # keeps the whole temporal path as dense MXU work (T is 5).
        h = nn.Dense(self.hidden, name="ts_proj")(x)
        time_emb = self.param(
            "time_emb", nn.initializers.normal(0.02), (t, self.hidden))
        h = nn.silu(h + time_emb[None, :, :])
        h = nn.Dense(self.hidden, name="ts_mix")(h)
        h = nn.silu(h)
        # Masked mean + max pooling over time.
        pooled = jnp.concatenate([jnp.mean(h, axis=1), jnp.max(h, axis=1)],
                                 axis=-1)  # [B, 2H]

        # NAIP patch branch: [B, kr, kc, bands] -> conv -> pooled vector.
        # Skipped entirely for band-less configs (EVT-only ladder rung).
        if naip.shape[-1]:
            nfin = jnp.isfinite(naip)
            if naip_nan_mask is not None:
                nfin = nfin & (naip_nan_mask > 0)
            xn = jnp.where(nfin, naip, 0.0)
            xn = jnp.concatenate([xn, nfin.astype(xn.dtype)], axis=-1)
            g = nn.Conv(self.hidden // 2, (3, 3), padding="SAME",
                        name="naip_conv")(xn)
            g = nn.silu(g)
            g = jnp.mean(g, axis=(1, 2))  # [B, H/2]
            z = jnp.concatenate([pooled, g], axis=-1)
        else:
            z = pooled
        z = nn.silu(nn.Dense(self.hidden, name="fuse")(z))
        z = nn.Dense(self.emb_dim, name="out")(z)
        return z


class MixedDecoder(nn.Module):
    """Quantized code [B, D] -> per-timestep heads + canopy scalar."""
    cont_dim: int
    cat_vocab_sizes: Dict[str, int]
    num_timesteps: int
    hidden: int = 128

    @nn.compact
    def __call__(self, q: Array) -> Tuple[Array, Dict[str, Array], Array]:
        b = q.shape[0]
        t = self.num_timesteps
        # Learned time queries; decode all T steps in one [B*T] dense pass.
        tq = self.param("time_query", nn.initializers.normal(0.02),
                        (t, self.hidden))
        h = nn.Dense(self.hidden, name="code_proj")(q)      # [B, H]
        h = h[:, None, :] + tq[None, :, :]                  # [B, T, H]
        h = nn.silu(h)
        h = nn.silu(nn.Dense(self.hidden, name="mix1")(h))
        h = h + nn.silu(nn.Dense(self.hidden, name="mix2")(h))

        if self.cont_dim:
            cont_pred = nn.Dense(self.cont_dim, name="cont_head")(h)
        else:  # EVT-only ladder rung: no continuous channels to decode
            cont_pred = jnp.zeros(h.shape[:-1] + (0,), h.dtype)
        cat_logits = {
            name: nn.Dense(self.cat_vocab_sizes[name],
                           name=f"cat_head_{name}")(h)
            for name in sorted(self.cat_vocab_sizes)
        }
        c = nn.silu(nn.Dense(self.hidden // 2, name="canopy_hidden")(q))
        canopy_pred = nn.Dense(1, name="canopy_head")(c)[:, 0]
        return cont_pred, cat_logits, canopy_pred


class VQVAE(nn.Module):
    """Full model. Ctor signature mirrors the reconstructed contract
    (/root/reference/scripts/train_vqvae.py:183-195, SURVEY.md §3)."""
    cont_dim: int
    cat_vocab_sizes: Dict[str, int]
    naip_bands: int
    num_timesteps: int
    emb_dim: int = 128
    codebook_size: int = 256
    beta: float = 0.25
    hidden: int = 128
    quantizer: str = "ema"            # "st" | "ema"
    cat_emb_dim: int = 8
    ema_decay: float = 0.99
    ema_eps: float = 1e-5

    def setup(self):
        self.encoder = MixedInputEncoder(
            cat_vocab_sizes=dict(self.cat_vocab_sizes), emb_dim=self.emb_dim,
            hidden=self.hidden, cat_emb_dim=self.cat_emb_dim)
        self.decoder = MixedDecoder(
            cont_dim=self.cont_dim,
            cat_vocab_sizes=dict(self.cat_vocab_sizes),
            num_timesteps=self.num_timesteps, hidden=self.hidden)
        # Codebook is a param in both modes; in "ema" mode it receives zero
        # gradient (stop_gradient inside quantize_ema) and the train step
        # overwrites it with the EMA update.
        self.codebook = self.param(
            "codebook", nn.initializers.normal(1.0),
            (self.codebook_size, self.emb_dim))

    def encode(self, batch: Dict[str, Array]) -> Array:
        return self.encoder(batch["cont"], batch["cat"], batch["naip"],
                            batch.get("cont_nan_mask"),
                            batch.get("naip_nan_mask"))

    def decode_code(self, q: Array) -> Tuple[Array, Dict[str, Array], Array]:
        return self.decoder(q)

    def decode_codebook(self) -> Tuple[Array, Dict[str, Array], Array]:
        """Decode every codebook entry as a length-T sequence -- the
        ``decode_codebook_sequences`` contract
        (/root/reference/scripts/export_codebook.py:93, SURVEY.md §3)."""
        return self.decoder(self.codebook)

    def __call__(self, batch: Dict[str, Array],
                 use_pallas: Optional[bool] = None) -> VQVAEOutput:
        z_e = self.encode(batch)
        r = vq_ops.quantize(z_e, self.codebook, mode=self.quantizer,
                            beta=self.beta, use_pallas=use_pallas)
        cont_pred, cat_logits, canopy_pred = self.decoder(r.quantized)
        return VQVAEOutput(cont_pred, cat_logits, canopy_pred, r.vq_loss,
                           r.perplexity, r.indices, r.counts, r.sums, z_e)


def model_config_dict(model: VQVAE) -> Dict[str, Any]:
    """Serializable model config for versioned checkpoints (SURVEY.md §6.4)."""
    return dict(
        cont_dim=model.cont_dim, cat_vocab_sizes=dict(model.cat_vocab_sizes),
        naip_bands=model.naip_bands, num_timesteps=model.num_timesteps,
        emb_dim=model.emb_dim, codebook_size=model.codebook_size,
        beta=model.beta, hidden=model.hidden, quantizer=model.quantizer,
        cat_emb_dim=model.cat_emb_dim, ema_decay=model.ema_decay,
        ema_eps=model.ema_eps)


__all__ = ["VQVAE", "VQVAEOutput", "MixedInputEncoder", "MixedDecoder",
           "model_config_dict"]
