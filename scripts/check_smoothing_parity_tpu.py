"""On-TPU numerical parity of the fused smoothing kernel vs the XLA path.

Small shapes (fast compiles over the axon relay): forward value + all three
input gradients, bf16 and fp32. Prints one JSON line per check.
"""

# Containers can lose the editable install between rounds; make the
# repo-root import work regardless of pip state.
import pathlib as _pl
import sys as _sys
_sys.path.insert(0, str(_pl.Path(__file__).resolve().parents[1]))
import json
import sys

import jax
import jax.numpy as jnp
import numpy as np

from forest_tpu.ops.smoothing import bank_mix


def main():
    print(f"backend: {jax.default_backend()}", file=sys.stderr)
    rng = np.random.default_rng(0)
    ok = True
    for dtype, atol in (("float32", 5e-5), ("bfloat16", 0.05)):
        dt = jnp.dtype(dtype)
        b, h, w, c, k, r = 2, 64, 128, 48, 8, 4
        x = jnp.asarray(rng.normal(size=(b, h, w, c)), dt)
        aw = jax.nn.softmax(
            jnp.asarray(rng.normal(size=(b, h, w, k, r)), dt), 3)
        bw = jax.nn.softmax(
            jnp.asarray(rng.normal(size=(b, h, w, c, r)), dt), 4)

        def loss(fn):
            return lambda x, aw, bw: jnp.sum(
                fn(x, aw, bw).astype(jnp.float32) ** 2)

        vg_p = jax.jit(jax.value_and_grad(
            loss(lambda *t: bank_mix(*t, use_pallas=True)),
            argnums=(0, 1, 2)))

        # The fused kernel accumulates in f32; the honest XLA reference is
        # therefore highest matmul precision (the DEFAULT XLA path runs the
        # grouped convs/einsum through the MXU in bf16 even for f32 inputs
        # and is ~0.4% off from its own highest-precision answer).
        def xla_hi(x, aw, bw):
            with jax.default_matmul_precision("highest"):
                return loss(lambda *t: bank_mix(*t, use_pallas=False))(
                    x, aw, bw)
        vg_x = jax.jit(jax.value_and_grad(xla_hi, argnums=(0, 1, 2)))
        (vp, gp), (vx, gx) = vg_p(x, aw, bw), vg_x(x, aw, bw)
        errs = [float(jnp.max(jnp.abs(a.astype(jnp.float32)
                                      - b2.astype(jnp.float32))))
                for a, b2 in zip(jax.tree_util.tree_leaves(gp),
                                 jax.tree_util.tree_leaves(gx))]
        scale = [float(jnp.max(jnp.abs(b2.astype(jnp.float32))))
                 for b2 in jax.tree_util.tree_leaves(gx)]
        rel = abs(float(vp) - float(vx)) / max(abs(float(vx)), 1e-9)
        max_rel_grad = max(e / max(s, 1e-9) for e, s in zip(errs, scale))
        passed = rel < atol and max_rel_grad < atol * 20
        ok &= passed
        print(json.dumps({"dtype": dtype, "loss_rel_err": rel,
                          "grad_max_rel_err": max_rel_grad,
                          "pass": bool(passed)}))
        sys.stdout.flush()
    sys.exit(0 if ok else 1)


if __name__ == "__main__":
    main()
