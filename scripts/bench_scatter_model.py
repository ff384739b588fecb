"""Scatter-add cost-model probe for the FRL merged-extract backward.

Measures jax.lax.scatter_add at the production extraction geometry
([B=12, HW=65536, C=48] grids) across row counts and the
unique_indices / indices_are_sorted hints, chained-carry per the repo
microbench rules (CLAUDE.md).

r2 findings on the axon v5e (recorded in CLAUDE.md roadmap #2): the
scatter lowers to a serial per-row loop at ~147 ns/row; the hints move
results <5%, so row count is the only optimization lever. This is the
evidence behind declaring the 5.2 ms fusion.38 backward scatter at
floor for the current loss structure (300 anchors + 1200 offset
positives + 1200 pool negatives per sample).

Run (TPU session env): python scripts/bench_scatter_model.py
"""

# Containers can lose the editable install between rounds; make the
# repo-root import work regardless of pip state.
import pathlib as _pl
import sys as _sys
_sys.path.insert(0, str(_pl.Path(__file__).resolve().parents[1]))
import time

import jax
import jax.numpy as jnp
import numpy as np

HW, C, B = 65536, 48, 12


def timeit(f, x, iters=30):
    x = f(x)
    x.block_until_ready()  # compile
    t0 = time.perf_counter()
    for _ in range(iters):
        x = f(x)
    x.block_until_ready()
    return (time.perf_counter() - t0) / iters * 1e3


def main():
    rng = np.random.default_rng(0)

    def make_idx(n, unique, srt):
        if unique:
            i = np.stack([rng.choice(HW, n, replace=False)
                          for _ in range(B)])
        else:
            i = rng.integers(0, HW, (B, n))
        if srt:
            i = np.sort(i, axis=1)
        return jnp.asarray(i, jnp.int32)

    g = jnp.asarray(rng.normal(size=(B, 4096, C)), jnp.float32)

    for n in (300, 812, 1500, 2700):
        for unique in (False, True):
            for srt in (False, True) if unique else (False,):
                idx = make_idx(n, unique, srt)

                def f(x, idx=idx, n=n, unique=unique, srt=srt):
                    upd = (g[:, :n] + x.mean()).astype(jnp.float32)
                    out = jnp.zeros((B, HW, C), jnp.float32)
                    dnums = jax.lax.ScatterDimensionNumbers(
                        update_window_dims=(2,), inserted_window_dims=(1,),
                        scatter_dims_to_operand_dims=(1,),
                        operand_batching_dims=(0,),
                        scatter_indices_batching_dims=(0,))
                    out = jax.lax.scatter_add(
                        out, idx[..., None], upd, dnums,
                        indices_are_sorted=srt, unique_indices=unique)
                    return out.sum(axis=(1, 2))  # chained carry [B]

                ms = timeit(jax.jit(f), jnp.zeros((B,)))
                print(f"n={n:5d} unique={int(unique)} sorted={int(srt)}: "
                      f"{ms:7.3f} ms")


if __name__ == "__main__":
    main()
