"""Dense full-map embedding export: frozen encoder over every patch ->
embedding zarr cube.

The serving-scale complement to the point-wise ``embed_locations``
(SURVEY.md §2.7): iterate all patches of a (split=None) dataset through the
frozen type encoder (and optionally the dense phase path), writing
``z_type [H, W, zt]`` (and ``z_phase [T, H, W, zp]``) into a chunked zarr
aligned to the source cube. Batched device execution with async dispatch so
host writeback of patch i overlaps compute of patch i+1.

Run: python -m forest_tpu.eval.export_embeddings --checkpoint CKPT \
         --bindings B.yaml --out EMB.zarr [--patch-size 256] [--phase]
"""
from __future__ import annotations

import argparse
from pathlib import Path
from typing import Optional

import numpy as np

from forest_tpu.data import zarrlite as zl


def export_embeddings(encode_type_fn, dataset, out_path: str | Path,
                      z_dim: int, batch_size: int = 4,
                      encode_phase_dense_fn=None,
                      z_phase_dim: Optional[int] = None,
                      num_timesteps: Optional[int] = None,
                      needed_features: Optional[list] = None
                      ) -> zl.ZarrGroup:
    """``needed_features``: feature names the encode fns build; when given,
    only the dataset groups those features read are shipped to the device
    (the relay H2D link is the export bottleneck at full batches)."""
    import jax.numpy as jnp

    keep = (dataset.bindings.groups_for_features(needed_features)
            if needed_features else None)

    h, w = dataset.height, dataset.width
    p = dataset.patch_size
    # Never write into an existing cube: zarrlite only rewrites metadata,
    # so stale chunk files from a previous run (possibly under a DIFFERENT
    # chunk grid) would read back as valid embeddings. Re-exports must
    # remove or rename the old output first.
    out_path = Path(out_path)
    if (out_path / ".zgroup").exists():
        raise FileExistsError(
            f"{out_path} already holds a zarr group; remove it (or pick a "
            "new --out) before re-exporting -- stale chunks from an old "
            "run would silently mix into the new embedding cube")
    root = zl.create_group(out_path)
    root.attrs["source_cube"] = str(dataset.bindings.zarr_path)
    root.attrs["z_type_dim"] = int(z_dim)
    root.write_attrs()
    zt_arr = root.create_array("z_type", (h, w, z_dim), (p, p, z_dim),
                               np.float16, fill_value=float("nan"))
    zp_arr = None
    if encode_phase_dense_fn is not None:
        zp_arr = root.create_array(
            "z_phase", (num_timesteps, h, w, z_phase_dim),
            (1, p, p, z_phase_dim), np.float16, fill_value=float("nan"))

    from forest_tpu.data.loader import PrefetchLoader

    saved = dataset._current_indices
    dataset._current_indices = list(range(len(dataset.patches)))
    try:
        n = len(dataset.patches)
        batches = [list(range(i, min(i + batch_size, n)))
                   for i in range(0, n, batch_size)]
        # Thread-pool prefetch overlaps host decode of batch i+1 with device
        # compute of batch i and zarr writeback of batch i-1 (the host-bound
        # export fix: decode, compute, and IO run concurrently).
        # close() in the finally below: an exception mid-export must tear
        # the feeder/pool down NOW, not at generator GC -- in-flight
        # load_batch futures would otherwise race the _current_indices
        # restore and pin decoded batches.
        loader = PrefetchLoader(dataset, iter(batches), num_workers=2,
                                prefetch=2)
        # Writer thread: the device->host transfer rides a slow relay link
        # (~23 MB/s measured), so np.asarray + zarr writeback must overlap
        # the next batch's decode + device compute, not serialize with them.
        # In-flight futures are bounded so device buffers don't accumulate
        # when writeback is the bottleneck.
        from collections import deque
        from concurrent.futures import ThreadPoolExecutor
        writer = ThreadPoolExecutor(max_workers=1)
        try:
            futures: deque = deque()
            for idx, host_batch in zip(batches, loader):
                batch = {k: jnp.asarray(v) for k, v in host_batch.items()
                         if not k.startswith("__")
                         and (keep is None or k in keep)}
                # device-side cast: halves D2H bytes; f16 is the storage
                # dtype anyway
                z = encode_type_fn(batch).astype(jnp.float16)
                zp = (encode_phase_dense_fn(batch).astype(jnp.float16)
                      if encode_phase_dense_fn is not None else None)
                futures.append(writer.submit(
                    _drain, (idx, z, zp), dataset, zt_arr, zp_arr))
                while len(futures) > 2:
                    futures.popleft().result()
            while futures:
                futures.popleft().result()
        finally:
            writer.shutdown(wait=False, cancel_futures=True)
            loader.close()
    finally:
        dataset._current_indices = saved
    return root


def _drain(item, dataset, zt_arr, zp_arr) -> None:
    idx, z, zp = item
    z = np.asarray(z, np.float16)
    if zp is not None:
        zp = np.asarray(zp, np.float16)
    for k, j in enumerate(idx):
        win = dataset.patches[j]
        zt_arr[win.row_slice, win.col_slice] = \
            z[k, :win.height, :win.width]
        if zp is not None:
            zp_arr[:, win.row_slice, win.col_slice] = \
                zp[k, :, :win.height, :win.width]


def main(argv=None):
    import jax

    from forest_tpu.data.bindings import parse_bindings
    from forest_tpu.data.feature_builder import FeatureBuilder
    from forest_tpu.data.frl_dataset import ForestDatasetV2
    from forest_tpu.eval import frozen

    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--checkpoint", required=True)
    ap.add_argument("--bindings", required=True)
    ap.add_argument("--out", required=True)
    ap.add_argument("--patch-size", type=int, default=256)
    ap.add_argument("--batch-size", type=int, default=4)
    ap.add_argument("--phase", action="store_true")
    a = ap.parse_args(argv)

    bindings = parse_bindings(a.bindings)
    ds = ForestDatasetV2(bindings, split=None, patch_size=a.patch_size)
    fb = FeatureBuilder(bindings)
    model, params = frozen.load_frozen_model(a.checkpoint)
    enc_t, _, _ = frozen.make_encode_fns(model, params, fb)

    enc_p_dense = None
    if a.phase:
        variables = {"params": params}

        @jax.jit
        def enc_p_dense(batch):
            import jax.numpy as jnp
            x, _ = fb.build_feature("type_encoder_input", batch)
            zt = model.apply(variables, x)
            px, _ = fb.build_feature(
                getattr(model, "phase_feature", "phase_ccdc"), batch)
            return model.apply(variables, px, zt,
                               method=model.forward_phase)

    feats = ["type_encoder_input"]
    if a.phase:
        feats.append(getattr(model, "phase_feature", "phase_ccdc"))
    root = export_embeddings(
        enc_t, ds, a.out, model.z_type_dim, a.batch_size, enc_p_dense,
        model.z_phase_dim, bindings.time_window.num_years,
        needed_features=feats)
    print(f"wrote {root.path}")


if __name__ == "__main__":
    main()
