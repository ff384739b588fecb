"""zarr_builder CLI, zarr_info inspector, io utils."""
import json

import numpy as np
import pytest
import yaml

from forest_tpu.data import io, zarr_builder, zarr_info, zarrlite as zl
from forest_tpu.data.bindings import parse_bindings
from forest_tpu.data.cube_v2 import synthetic_bindings
from forest_tpu.data.frl_dataset import ForestDatasetV2


@pytest.fixture
def spec_env(tmp_path, rng):
    h, w, t = 64, 64, 3
    np.save(tmp_path / "elev.npy",
            rng.normal(300, 50, (h, w)).astype(np.float32))
    np.save(tmp_path / "ndvi.npy",
            rng.random((t, h, w)).astype(np.float32))
    np.savez(tmp_path / "masks.npz",
             aoi=np.ones((h, w), np.uint8))
    spec = {
        "output": "cube.zarr",
        "spatial": {"height": h, "width": w, "chunk_y": 32, "chunk_x": 32},
        "time": {"start": 2020, "end": 2022},
        "aoi": "masks.npz:aoi",
        "groups": [
            {"name": "topo", "kind": "static", "dtype": "float32",
             "bands": [{"name": "elevation", "source": "elev.npy"}]},
            {"name": "ccdc", "kind": "annual", "dtype": "float16",
             "bands": [{"name": "ndvi", "source": "ndvi.npy"}]},
        ],
    }
    (tmp_path / "spec.yaml").write_text(yaml.safe_dump(spec))
    return tmp_path, spec


class TestBuilder:
    def test_build_and_layout(self, spec_env):
        base, spec = spec_env
        root = zarr_builder.build_cube(spec, base)
        assert isinstance(root["static/topo/data/elevation"], zl.ZarrArray)
        a = root["annual/ccdc/data/ndvi"]
        assert a.shape == (3, 64, 64)
        assert a.chunks == (1, 32, 32)
        assert root.attrs["time_coords"] == [2020, 2021, 2022]
        st = a.attrs["statistics"]
        assert 0 <= st["mean"] <= 1
        assert (base / "cube.stats.json").exists()
        assert (base / "cube.stats.tsv").exists()

    def test_cli_and_append(self, spec_env, rng):
        base, spec = spec_env
        zarr_builder.main(["--config", str(base / "spec.yaml")])
        # append a new static band
        np.save(base / "slope.npy",
                rng.random((64, 64)).astype(np.float32))
        spec2 = dict(spec, groups=[
            {"name": "topo2", "kind": "static", "dtype": "float32",
             "bands": [{"name": "slope", "source": "slope.npy"}]}])
        (base / "spec2.yaml").write_text(yaml.safe_dump(spec2))
        zarr_builder.main(["--config", str(base / "spec2.yaml"),
                           "--append"])
        root = zl.open_zarr(base / "cube.zarr")
        assert "topo" in root["static"].keys()
        assert "topo2" in root["static"].keys()

    def test_validation_errors(self, spec_env):
        base, spec = spec_env
        bad = dict(spec)
        bad.pop("output")
        assert any("output" in p for p in zarr_builder.validate_spec(bad))
        bad2 = dict(spec, groups=[{"name": "x", "kind": "weird",
                                   "bands": []}])
        assert any("kind" in p for p in zarr_builder.validate_spec(bad2))

    def test_shape_mismatch_raises(self, spec_env, rng):
        base, spec = spec_env
        np.save(base / "wrong.npy", rng.random((10, 10)).astype(np.float32))
        spec2 = dict(spec, groups=[
            {"name": "bad", "kind": "static", "dtype": "float32",
             "bands": [{"name": "x", "source": "wrong.npy"}]}])
        with pytest.raises(ValueError, match="expected"):
            zarr_builder.build_cube(spec2, base)

    def test_scale_offset_roundtrip(self, spec_env, rng):
        base, spec = spec_env
        data = rng.random((64, 64)).astype(np.float32)
        np.save(base / "scaled.npy", data)
        spec2 = dict(spec, output="c2.zarr", groups=[
            {"name": "s", "kind": "static", "dtype": "float16",
             "bands": [{"name": "x", "source": "scaled.npy",
                        "scale_factor": 0.01}]}])
        root = zarr_builder.build_cube(spec2, base)
        a = root["static/s/data/x"]
        stored = np.asarray(a[:], np.float32)
        np.testing.assert_allclose(stored * 0.01, data, atol=0.01)

    def test_built_cube_feeds_dataset(self, spec_env):
        """A builder-produced cube must load through ForestDatasetV2."""
        base, spec = spec_env
        zarr_builder.build_cube(spec, base)
        b = parse_bindings({
            "zarr": {"path": str(base / "cube.zarr")},
            "time_window": {"start": 2020, "end": 2022},
            "dataset": {
                "static": {"dim": ["C", "H", "W"], "channels": [
                    {"name": "elevation",
                     "source": "static/topo/data/elevation"}]},
                "annual": {"dim": ["C", "T", "H", "W"], "channels": [
                    {"name": "ndvi",
                     "source": "annual/ccdc/data/ndvi"}]},
            },
        })
        ds = ForestDatasetV2(b, split=None, patch_size=32)
        p = ds.get_patch(0)
        assert p["static"].shape == (32, 32, 1)
        assert p["annual"].shape == (3, 32, 32, 1)


class TestZarrInfo:
    def test_summary(self, spec_env, capsys):
        base, spec = spec_env
        zarr_builder.build_cube(spec, base)
        s = zarr_info.summarize(base / "cube.zarr")
        assert "annual/" in s and "ndvi" in s
        assert "years: 2020..2022" in s
        assert "stats:" in s
        zarr_info.main([str(base / "cube.zarr")])
        assert "files:" in capsys.readouterr().out


class TestIO:
    def test_atomic_write_and_md5(self, tmp_path):
        p = io.atomic_write(tmp_path / "x.txt", "hello")
        assert p.read_text() == "hello"
        assert len(io.md5_checksum(p)) == 32

    def test_json_tsv(self, tmp_path):
        io.write_json(tmp_path / "a.json", {"x": 1})
        assert io.read_json(tmp_path / "a.json") == {"x": 1}
        io.write_tsv(tmp_path / "b.tsv", [[1, 2], [3, 4]],
                     header=["a", "b"])
        assert (tmp_path / "b.tsv").read_text().startswith("a\tb\n1\t2")
