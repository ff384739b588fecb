"""Full VQ-VAE TRAINING-RUN parity vs a torch-CPU oracle.

Extends the per-primitive oracle gate (tests/test_oracle_parity.py) to the
whole training loop contract (SURVEY.md §3 "Training loop contract",
/root/reference/scripts/train_vqvae.py:296-339): a functional torch mirror of
the forest-tpu VQVAE (MixedInputEncoder -> EMA VectorQuantizer ->
MixedDecoder), the nan-safe masked losses, AdamW with the codebook excluded
from weight decay, global-norm grad clipping, and the Laplace-smoothed EMA
codebook update -- trained LOCKSTEP from identical initial weights on
identical batches. Codebook assignments, losses, perplexity, and the final
codebook must track within float32-trajectory tolerance for every step.

The torch side is built from the flax param tree directly (flax Dense
kernels are [in, out], so ``x @ kernel`` needs no transpose; the NHWC/HWIO
conv maps to NCHW/OIHW by permute), so any silent re-initialization or
layout mismatch fails loudly.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from forest_tpu.models.vqvae import VQVAE
from forest_tpu.training import vqvae_step

B, T, C_CONT, KR, KC, NB = 64, 5, 3, 3, 3, 2
CAT_SIZES = {"evt": 9, "lcms": 6}
EMB, K, HID = 16, 24, 24
LR, WD, CLIP, BETA, DECAY, EPS = 3e-3, 1e-4, 1.0, 0.25, 0.99, 1e-5
STEPS = 10


def make_batch(rng):
    cont = rng.normal(size=(B, T, C_CONT)).astype(np.float32)
    cont[rng.random(cont.shape) < 0.05] = np.nan
    cat = rng.integers(0, 6, size=(B, T, 2)).astype(np.int32)
    tgt_evt = rng.integers(0, 9, size=(B, T)).astype(np.int32)
    tgt_evt[rng.random(tgt_evt.shape) < 0.1] = -100
    return {
        "cont": cont,
        "cat": cat,
        "cat_target": {"evt": tgt_evt,
                       "lcms": rng.integers(0, 6, size=(B, T)).astype(
                           np.int32)},
        "naip": rng.normal(size=(B, KR, KC, NB)).astype(np.float32),
        "canopy": rng.normal(size=(B,)).astype(np.float32),
    }


def to_jnp(b):
    return jax.tree_util.tree_map(jnp.asarray, b)


# ---------------------------------------------------------------------------
# torch functional mirror
# ---------------------------------------------------------------------------


def flatten_params(tree, prefix=""):
    out = {}
    for k, v in tree.items():
        p = f"{prefix}{k}"
        if isinstance(v, dict):
            out.update(flatten_params(v, p + "/"))
        else:
            out[p] = np.asarray(v)
    return out


class TorchOracle:
    def __init__(self, flax_params):
        import torch

        self.torch = torch
        self.p = {k: torch.nn.Parameter(torch.from_numpy(v.copy()))
                  for k, v in flatten_params(flax_params).items()}
        # mirrors VQStats.init(codebook=...): size ones, sum = codebook
        self.cluster_size = torch.ones(K)
        self.cluster_sum = self.p["codebook"].detach().clone()
        others = [v for k, v in self.p.items() if k != "codebook"]
        self.opt = torch.optim.AdamW(
            [{"params": others, "weight_decay": WD},
             {"params": [self.p["codebook"]], "weight_decay": 0.0}],
            lr=LR, betas=(0.9, 0.999), eps=1e-8)

    def dense(self, name, x):
        return x @ self.p[f"{name}/kernel"] + self.p[f"{name}/bias"]

    def encode(self, b):
        t, F = self.torch, self.torch.nn.functional
        cont = b["cont"]
        finite = t.isfinite(cont)
        xc = t.where(finite, cont, t.zeros(()))
        feats = [xc, finite.float()]
        for i, name in enumerate(sorted(CAT_SIZES)):
            ids = b["cat"][..., i].clamp(0, CAT_SIZES[name] - 1).long()
            feats.append(F.embedding(
                ids, self.p[f"encoder/cat_emb_{name}/embedding"]))
        x = t.cat(feats, -1)
        h = self.dense("encoder/ts_proj", x)
        h = F.silu(h + self.p["encoder/time_emb"][None])
        h = F.silu(self.dense("encoder/ts_mix", h))
        pooled = t.cat([h.mean(1), h.max(1).values], -1)
        naip = b["naip"]
        nfin = t.isfinite(naip)
        xn = t.cat([t.where(nfin, naip, t.zeros(())), nfin.float()], -1)
        w = self.p["encoder/naip_conv/kernel"].permute(3, 2, 0, 1)
        g = F.conv2d(xn.permute(0, 3, 1, 2), w,
                     self.p["encoder/naip_conv/bias"], padding=1)
        g = F.silu(g).mean((2, 3))
        z = t.cat([pooled, g], -1)
        z = F.silu(self.dense("encoder/fuse", z))
        return self.dense("encoder/out", z)

    def quantize_ema(self, z):
        t = self.torch
        xd, cd = z.detach(), self.p["codebook"].detach()
        d = (xd * xd).sum(-1, keepdim=True) - 2.0 * xd @ cd.T \
            + (cd * cd).sum(-1)
        idx = d.argmin(1)
        q = cd[idx]
        commit = ((z - q) ** 2).sum(-1).mean()
        onehot = t.nn.functional.one_hot(idx, K).float()
        counts = onehot.sum(0)
        sums = onehot.T @ xd
        pr = counts / counts.sum().clamp(min=1.0)
        perp = t.exp(-(pr[pr > 0] * pr[pr > 0].log()).sum())
        return z + (q - z).detach(), idx, BETA * commit, counts, sums, perp

    def decode(self, q):
        t, F = self.torch, self.torch.nn.functional
        h = self.dense("decoder/code_proj", q)
        h = F.silu(h[:, None, :] + self.p["decoder/time_query"][None])
        h = F.silu(self.dense("decoder/mix1", h))
        h = h + F.silu(self.dense("decoder/mix2", h))
        cont = self.dense("decoder/cont_head", h)
        logits = {n: self.dense(f"decoder/cat_head_{n}", h)
                  for n in sorted(CAT_SIZES)}
        c = F.silu(self.dense("decoder/canopy_hidden", q))
        return cont, logits, self.dense("decoder/canopy_head", c)[:, 0]

    @staticmethod
    def recon_loss(pred, target):
        import torch
        valid = torch.isfinite(target)
        tgt = torch.where(valid, target, torch.zeros(()))
        prd = torch.where(valid, pred, torch.zeros(()))
        per = torch.where(valid, (prd - tgt) ** 2, torch.zeros(()))
        return per.sum() / valid.float().sum().clamp(min=1.0)

    @staticmethod
    def cat_loss(logits, target):
        import torch
        valid = target != -100
        tgt = torch.where(valid, target, torch.zeros((), dtype=target.dtype))
        logp = torch.log_softmax(logits.float(), -1)
        nll = -logp.gather(-1, tgt[..., None].long())[..., 0]
        w = torch.where(valid, torch.ones(()), torch.zeros(()))
        return (nll * w).sum() / w.sum().clamp(min=1e-8)

    def step(self, b):
        t = self.torch
        z = self.encode(b)
        q, idx, vq_loss, counts, sums, perp = self.quantize_ema(z)
        cont_pred, logits, canopy = self.decode(q)
        loss = (self.recon_loss(cont_pred, b["cont"])
                + sum(self.cat_loss(logits[n], b["cat_target"][n])
                      for n in sorted(CAT_SIZES))
                + self.recon_loss(canopy, b["canopy"])
                + vq_loss)
        self.opt.zero_grad()
        loss.backward()
        t.nn.utils.clip_grad_norm_([v for v in self.p.values()], CLIP)
        self.opt.step()
        with t.no_grad():
            self.cluster_size = DECAY * self.cluster_size \
                + (1 - DECAY) * counts
            self.cluster_sum = DECAY * self.cluster_sum + (1 - DECAY) * sums
            n = self.cluster_size.sum()
            smoothed = (self.cluster_size + EPS) / (n + K * EPS) * n
            self.p["codebook"].copy_(self.cluster_sum / smoothed[:, None])
        return (float(loss.detach()), np.asarray(idx), float(perp))


# ---------------------------------------------------------------------------
# lockstep trajectory test
# ---------------------------------------------------------------------------


class TestTrainingRunParity:
    def test_lockstep_trajectories(self):
        import torch

        rng = np.random.default_rng(7)
        batches = [make_batch(rng) for _ in range(STEPS)]

        model = VQVAE(cont_dim=C_CONT, cat_vocab_sizes=CAT_SIZES,
                      naip_bands=NB, num_timesteps=T, emb_dim=EMB,
                      codebook_size=K, hidden=HID, quantizer="ema",
                      beta=BETA, ema_decay=DECAY, ema_eps=EPS)
        opt = vqvae_step.make_optimizer(LR, WD, CLIP)
        state = vqvae_step.init_train_state(model, opt, to_jnp(batches[0]),
                                            jax.random.key(0))
        oracle = TorchOracle(state.params)

        step = jax.jit(
            vqvae_step.make_train_step(model, opt, use_pallas=False))
        weights = {k: jnp.float32(1.0) for k in
                   ("cont", "cat", "canopy", "vq")}

        jl, tl = [], []
        for i, b in enumerate(batches):
            # jax side needs indices BEFORE the update for comparison; the
            # metrics dict doesn't carry them, so recompute via apply.
            out = model.apply({"params": state.params}, to_jnp(b),
                              use_pallas=False)
            state, m = step(state, to_jnp(b), weights, jax.random.key(i))
            tb = {k: (({n: torch.from_numpy(v2) for n, v2 in v.items()})
                      if isinstance(v, dict) else torch.from_numpy(v))
                  for k, v in b.items()}
            o_loss, o_idx, o_perp = oracle.step(tb)

            j_idx = np.asarray(out.indices)
            agree = float((j_idx == o_idx).mean())
            jl.append(float(m["loss/total"]))
            tl.append(o_loss)
            tol = 1e-3 * (1 + i)
            assert agree >= (1.0 if i == 0 else 0.98), \
                f"step {i}: assignment agreement {agree}"
            assert abs(jl[-1] - o_loss) <= tol * max(1.0, abs(o_loss)), \
                f"step {i}: loss {jl[-1]} vs oracle {o_loss}"
            assert abs(float(m["perplexity"]) - o_perp) <= 0.05 * K

        # training actually progressed, identically on both sides
        assert jl[-1] < jl[0]
        assert tl[-1] < tl[0]

        cb_j = np.asarray(state.params["codebook"])
        cb_t = oracle.p["codebook"].detach().numpy()
        np.testing.assert_allclose(cb_j, cb_t, atol=5e-3, rtol=5e-3)
        np.testing.assert_allclose(
            np.asarray(state.vq_stats.cluster_size),
            oracle.cluster_size.numpy(), atol=1e-4, rtol=1e-4)
