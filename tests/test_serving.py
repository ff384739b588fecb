"""Embedding serving: micro-batcher, EncoderService, HTTP front.

No reference counterpart (the reference ships batch export only); the
correctness bar is exact agreement with the frozen-eval encode path.
"""
import threading
import urllib.request

import numpy as np
import pytest
import yaml

from forest_tpu import serving


# ---------------------------------------------------------------- batcher
class TestMicroBatcher:
    def test_single_and_results_in_order(self):
        calls = []

        def run(items):
            calls.append(len(items))
            return [x * 10 for x in items]

        b = serving.MicroBatcher(run, max_batch=4, max_wait_ms=1.0)
        try:
            assert b.submit(3) == 30
            assert calls == [1]
        finally:
            b.close()

    def test_coalesces_concurrent_requests(self):
        sizes = []
        gate = threading.Event()

        def run(items):
            gate.wait(2.0)  # hold the first batch so others queue up
            sizes.append(len(items))
            return [x + 1 for x in items]

        b = serving.MicroBatcher(run, max_batch=8, max_wait_ms=50.0)
        try:
            results = {}

            def call(i):
                results[i] = b.submit(i)

            threads = [threading.Thread(target=call, args=(i,))
                       for i in range(6)]
            for t in threads:
                t.start()
            gate.set()
            for t in threads:
                t.join(5.0)
            assert results == {i: i + 1 for i in range(6)}
            # first batch may be small (race to the gate) but the rest
            # must have coalesced: far fewer batches than requests
            assert sum(sizes) == 6 and len(sizes) <= 3
        finally:
            b.close()

    def test_batch_error_reaches_every_caller(self):
        def run(items):
            raise RuntimeError("boom")

        b = serving.MicroBatcher(run, max_batch=2, max_wait_ms=1.0)
        try:
            with pytest.raises(RuntimeError, match="boom"):
                b.submit(1)
        finally:
            b.close()

    def test_submit_after_close_raises(self):
        b = serving.MicroBatcher(lambda xs: xs, max_batch=2)
        b.close()
        with pytest.raises(RuntimeError, match="closed"):
            b.submit(1)

    def test_per_item_failure_marker(self):
        def run(items):
            return [serving.Failure(ValueError("bad item"))
                    if x < 0 else x * 10 for x in items]

        b = serving.MicroBatcher(run, max_batch=2, max_wait_ms=1.0)
        try:
            assert b.submit(2) == 20
            with pytest.raises(ValueError, match="bad item"):
                b.submit(-1)
        finally:
            b.close()

    def test_close_fails_queued_requests_instead_of_stranding(self):
        gate = threading.Event()

        def run(items):
            gate.wait(5.0)  # hold the dispatcher so requests pile up
            return list(items)

        b = serving.MicroBatcher(run, max_batch=1, max_wait_ms=1.0)
        errors = {}

        def call(i):
            try:
                errors[i] = b.submit(i)
            except BaseException as e:
                errors[i] = e

        threads = [threading.Thread(target=call, args=(i,))
                   for i in range(3)]
        for t in threads:
            t.start()
        # let them enqueue, then close while the dispatcher is held
        import time as _t
        _t.sleep(0.1)
        b._stop.set()
        gate.set()
        b._q.put(None)
        for t in threads:
            t.join(5.0)
        assert not any(t.is_alive() for t in threads)
        # every caller got EITHER a result (served before close landed)
        # or the closed error -- nobody is stranded
        assert len(errors) == 3
        for v in errors.values():
            assert isinstance(v, int) or (
                isinstance(v, RuntimeError) and "closed" in str(v))
        b.close()


# ---------------------------------------------------------------- service
@pytest.fixture(scope="module")
def service_run(tmp_path_factory):
    """Tiny trained run + an EncoderService over its best checkpoint."""
    from forest_tpu.data.cube_v2 import (build_synthetic_v2_cube,
                                         synthetic_bindings)
    from forest_tpu.data.frl_dataset import ForestDatasetV2
    from forest_tpu.training import train_representation as tr
    from forest_tpu.training.representation.training_config import (
        parse_training_config)

    root = tmp_path_factory.mktemp("serve_run")
    build_synthetic_v2_cube(root / "cube.zarr", height=64, width=64,
                            chunk_yx=32)
    bpath = root / "bindings.yaml"
    bpath.write_text(yaml.safe_dump(synthetic_bindings(
        root / "cube.zarr", root / "stats.json")))
    cfg = parse_training_config({
        "run": {"experiment_name": "s", "run_root": str(root / "runs"),
                "checkpoint": {"save_top_k": 1, "save_every_n_epochs": 1}},
        "training": {"epoch": {"num_epochs": 1, "mode": "full",
                               "batch_size": 2}},
        "optimizer": {"lr": 1e-3},
        "scheduler": {"warmup_epochs": 0, "phase_rewarmup": False},
        "spatial_domain": {"patch_size": 32, "split_block_size": [1, 1]},
        "hardware": {"num_workers": 0},
    })
    model_cfg = {"version": "4", "model": {
        "z_type_dim": 6, "z_phase_dim": 3,
        "type_encoder": {"channels": [12, 6]},
        "phase_tcn": {"channels": [8, 8], "dilations": [1, 2]}}}
    tr.train(cfg, str(bpath), model_cfg, max_batches=1)
    ckpt = cfg.run.experiment_dir / cfg.run.ckpt_dir / \
        "encoder_last.msgpack"
    svc = serving.EncoderService(ckpt, bpath, max_batch=3,
                                 max_wait_ms=5.0)
    ds = ForestDatasetV2(svc.bindings, split=None, patch_size=32)
    yield svc, ds, ckpt, bpath
    svc.close()


class TestEncoderService:
    def test_encode_matches_frozen_path(self, service_run):
        svc, ds, ckpt, bpath = service_run
        patch = ds.get_patch(0)
        out = svc.encode(patch)
        assert set(out) == {"z_type"}
        assert out["z_type"].shape == (32, 32, 6)

        # oracle: the eval-tools encode path on the same stacked batch
        from forest_tpu.eval import frozen
        enc_t, _, _ = frozen.make_encode_fns(svc.model, svc.params, svc.fb)
        ref = np.asarray(enc_t(ds.load_batch([0])))[0]
        np.testing.assert_allclose(out["z_type"], ref, atol=1e-5)

    def test_encode_phase(self, service_run):
        svc, ds, _, _ = service_run
        out = svc.encode(ds.get_patch(1), phase=True)
        assert set(out) == {"z_type", "z_phase"}
        assert out["z_phase"].shape[-1] == 3
        assert np.isfinite(out["z_phase"]).all()

    def test_short_batches_pad_without_shape_churn(self, service_run):
        svc, ds, _, _ = service_run
        before = svc.batches_run
        outs = [svc.encode(ds.get_patch(i)) for i in range(3)]
        assert all(o["z_type"].shape == (32, 32, 6) for o in outs)
        assert svc.batches_run > before
        # identical input -> identical output regardless of pad slots
        a = svc.encode(ds.get_patch(0))["z_type"]
        b = svc.encode(ds.get_patch(0))["z_type"]
        np.testing.assert_array_equal(a, b)

    def test_mismatched_groups_rejected(self, service_run):
        svc, ds, _, _ = service_run
        patch = ds.get_patch(0)
        bad = {k: v for k, v in list(patch.items())[:1]}
        with pytest.raises(Exception):
            svc.encode(bad)

    def test_mixed_shapes_bucketed_not_poisoned(self, service_run):
        """One dispatch carrying two patch sizes + a broken payload:
        each bucket runs its own jitted call; only the broken item
        fails."""
        from forest_tpu.data.frl_dataset import ForestDatasetV2
        svc, ds, _, bpath = service_run
        ds16 = ForestDatasetV2(svc.bindings, split=None, patch_size=16)
        p32, p16 = ds.get_patch(0), ds16.get_patch(0)
        bad = {k: v for k, v in list(p32.items())[:1]}
        out = svc._run_batch([(p32, False), (p16, False), (bad, False)])
        assert out[0]["z_type"].shape == (32, 32, 6)
        assert out[1]["z_type"].shape == (16, 16, 6)
        assert isinstance(out[2], serving.Failure)
        # direct single-size oracle agreement survives the bucketing
        solo = svc.encode(ds.get_patch(0))["z_type"]
        np.testing.assert_allclose(out[0]["z_type"], solo, atol=1e-6)


class TestHTTP:
    def test_http_roundtrip_and_health(self, service_run):
        svc, ds, _, _ = service_run
        srv = serving.make_server(svc, "127.0.0.1", 0)  # ephemeral port
        port = srv.server_address[1]
        t = threading.Thread(target=srv.serve_forever, daemon=True)
        t.start()
        try:
            body = serving.pack_npz(ds.get_patch(0))
            req = urllib.request.Request(
                f"http://127.0.0.1:{port}/v1/encode", data=body,
                method="POST")
            with urllib.request.urlopen(req, timeout=30) as resp:
                out = serving.unpack_npz(resp.read())
            assert out["z_type"].shape == (32, 32, 6)
            direct = svc.encode(ds.get_patch(0))["z_type"]
            np.testing.assert_allclose(out["z_type"], direct, atol=1e-6)

            with urllib.request.urlopen(
                    f"http://127.0.0.1:{port}/healthz", timeout=10) as r:
                import json
                health = json.loads(r.read())
            assert health["status"] == "ok"
            assert health["requests_served"] >= 2
            assert health["z_type_dim"] == 6

            # malformed body -> 400, server stays up
            bad = urllib.request.Request(
                f"http://127.0.0.1:{port}/v1/encode", data=b"not-npz",
                method="POST")
            with pytest.raises(urllib.error.HTTPError) as ei:
                urllib.request.urlopen(bad, timeout=10)
            assert ei.value.code == 400
        finally:
            srv.shutdown()
            srv.server_close()
