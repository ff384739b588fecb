"""Encoder demos: every model block on synthetic tensors.

The forest-tpu analogue of /root/reference/frl/examples/encoder_examples
(SURVEY.md §2.8).

Run: python examples/example_encoders.py
"""
import jax
import jax.numpy as jnp
import numpy as np


def main():
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=(2, 32, 32, 10)), jnp.float32)

    from forest_tpu.models.conv2d_encoder import Conv2DEncoder
    enc = Conv2DEncoder(channels=(32, 16))
    p = enc.init(jax.random.key(0), x)["params"]
    h = enc.apply({"params": p}, x)
    print(f"Conv2DEncoder: {x.shape} -> {h.shape}")

    from forest_tpu.models.spatial import EdgeAwareSmoothingConv2D
    sm = EdgeAwareSmoothingConv2D(channels=16)
    sp = sm.init(jax.random.key(0), h)["params"]
    out, gate = sm.apply({"params": sp}, h, return_gate=True)
    print(f"EdgeAwareSmoothing: gate mean {float(gate.mean()):.3f} "
          f"(1 = preserve, 0 = smooth)")

    from forest_tpu.models.tcn import TCNEncoder
    tcn = TCNEncoder(channels=(24, 24), dilations=(1, 2), pooling="stats")
    ts = jnp.asarray(rng.normal(size=(5, 15, 3)), jnp.float32)
    tp = tcn.init(jax.random.key(0), ts)["params"]
    pooled = tcn.apply({"params": tp}, ts)
    print(f"TCN (stats pooling): {ts.shape} -> {pooled.shape}")

    from forest_tpu.models.conditioning import FiLMLayer
    film = FiLMLayer(target_dim=8)
    cond = jnp.asarray(rng.normal(size=(5, 16)), jnp.float32)
    fp = film.init(jax.random.key(0), cond)["params"]
    gamma, beta = film.apply({"params": fp}, cond)
    print(f"FiLM at init: gamma~{float(gamma.mean()):.3f} "
          f"beta~{float(beta.mean()):.3f} (near identity)")

    from forest_tpu.models import representation as rep
    model = rep.RepresentationModel(
        type_in_channels=10, phase_in_channels=3, z_type_dim=16,
        type_encoder_channels=(32, 16), z_phase_dim=4,
        phase_tcn_channels=(16, 16), phase_tcn_dilations=(1, 2))
    params = rep.init_variables(model, jax.random.key(0),
                                num_timesteps=15)["params"]
    z = model.apply({"params": params}, x)
    px = jnp.asarray(rng.normal(size=(7, 15, 3)), jnp.float32)
    zt = jnp.asarray(rng.normal(size=(7, 16)), jnp.float32)
    zp = model.apply({"params": params}, px, zt,
                     method=model.forward_phase_at_locations)
    n = sum(int(np.prod(p.shape))
            for p in jax.tree_util.tree_leaves(params))
    print(f"RepresentationModel ({n/1e3:.0f}k params): "
          f"z_type {z.shape}, z_phase {zp.shape}")

    from forest_tpu.models.vqvae import VQVAE
    batch = {
        "cont": jnp.asarray(rng.normal(size=(4, 5, 6)), jnp.float32),
        "cat": jnp.asarray(rng.integers(0, 9, (4, 5, 1)), jnp.int32),
        "cat_target": {"evt": jnp.asarray(rng.integers(0, 9, (4, 5)),
                                          jnp.int32)},
        "naip": jnp.asarray(rng.normal(size=(4, 3, 3, 2)), jnp.float32),
        "canopy": jnp.zeros((4,), jnp.float32),
    }
    vq = VQVAE(cont_dim=6, cat_vocab_sizes={"evt": 9}, naip_bands=2,
               num_timesteps=5, emb_dim=16, codebook_size=8, hidden=16)
    vp = vq.init(jax.random.key(0), batch, use_pallas=False)["params"]
    out = vq.apply({"params": vp}, batch, use_pallas=False)
    print(f"VQVAE: indices {np.asarray(out.indices)}, "
          f"perplexity {float(out.perplexity):.2f}")


if __name__ == "__main__":
    main()
