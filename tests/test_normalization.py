"""Normalizer class family + zarr-attr stats loader."""
import numpy as np
import pytest

from forest_tpu.data import normalization as nm


STATS = {"mean": 5.0, "sd": 2.0, "min": 0.0, "max": 10.0,
         "q02": 0.2, "q25": 3.0, "q50": 5.0, "q75": 7.0, "q98": 9.8}


class TestNormalizers:
    @pytest.mark.parametrize("kind", ["zscore", "robust_iqr", "minmax",
                                      "linear_rescale"])
    def test_forward_inverse_roundtrip(self, kind, rng):
        n = nm.make_normalizer(kind, STATS)
        x = rng.normal(5, 2, size=100)
        np.testing.assert_allclose(n.inverse(n.forward(x)), x, rtol=1e-6)

    def test_zscore_values(self):
        n = nm.make_normalizer("zscore", STATS)
        assert n.forward(5.0) == 0.0
        assert n.forward(7.0) == 1.0

    def test_robust_iqr_values(self):
        n = nm.make_normalizer("robust_iqr", STATS)
        assert n.forward(5.0) == 0.0
        assert n.forward(7.0) == pytest.approx(0.5)

    def test_clamp(self):
        n = nm.make_normalizer("clamp", STATS)
        out = n.forward(np.asarray([-5.0, 5.0, 50.0]))
        np.testing.assert_allclose(out, [0.2, 5.0, 9.8])

    def test_unknown_raises(self):
        with pytest.raises(KeyError):
            nm.make_normalizer("bogus")

    def test_manager(self, rng):
        x = rng.normal(size=(4, 4, 2))
        mgr = nm.NormalizationManager({
            "a": nm.make_normalizer("zscore", STATS),
            "b": nm.make_normalizer("identity")})
        y = mgr.forward(x, ["a", "b"])
        np.testing.assert_allclose(y[..., 1], x[..., 1])
        np.testing.assert_allclose(mgr.inverse(y, ["a", "b"]), x,
                                   rtol=1e-6)


class TestZarrStatsLoader:
    def test_reads_builder_attrs(self, tmp_path, rng):
        import yaml

        from forest_tpu.data import zarr_builder

        h = w = 32
        np.save(tmp_path / "x.npy",
                rng.normal(5, 2, (h, w)).astype(np.float32))
        spec = {"output": "c.zarr",
                "spatial": {"height": h, "width": w, "chunk_y": 32,
                            "chunk_x": 32},
                "groups": [{"name": "g", "kind": "static",
                            "dtype": "float32",
                            "bands": [{"name": "x", "source": "x.npy"}]}]}
        zarr_builder.build_cube(spec, tmp_path)
        loader = nm.ZarrStatsLoader(tmp_path / "c.zarr")
        st = loader.band_stats("static/g/data/x")
        assert st["mean"] == pytest.approx(5.0, abs=0.5)
        n = loader.normalizer_for("static/g/data/x", "zscore")
        assert abs(n.forward(st["mean"])) < 1e-6
