"""CI gate: the UNMODIFIED reference cube YAMLs build end-to-end.

VERDICT r3 missing #1 / task #3: the reference's own
``zarr_builder/va_vae_dataset_test.yaml`` (full tripartite config: 5
per-year annual groups, 5 per-band annual groups, irregular NAIP,
4 static groups incl. the 116-band ccdc history and the CONUS-extent
categorical EVT) and ``va_vae_dataset_evt_only.yaml`` (--append ladder)
are built verbatim against synthesized sources, exactly like
tests/test_reference_config_e2e.py gates the frl bindings YAMLs.

Reference behaviors pinned here map to
/root/reference/zarr_builder/build_zarr.py: per-kind loaders (659-954),
statistics incl. categorical class counts (1059-1740), validation
(1741-2067), append (1493-1549, 2104).
"""
from __future__ import annotations

import json
import shutil
from pathlib import Path

import numpy as np
import pytest
import yaml

from forest_tpu.data import build_zarr_v2 as bz
from forest_tpu.data import raster as rio
from forest_tpu.data import vrt as vrtmod
from forest_tpu.data import zarrlite as zl

REF = Path("/root/reference/zarr_builder")
TEST_YAML = REF / "va_vae_dataset_test.yaml"
EVT_YAML = REF / "va_vae_dataset_evt_only.yaml"

pytestmark = pytest.mark.skipif(not TEST_YAML.exists(),
                                reason="reference configs not present")


@pytest.fixture(scope="module")
def built_test_cube(tmp_path_factory):
    """Synthesize sources for the verbatim test YAML and build it once
    (scale 64 -> 64x64 grid; the YAML itself is untouched)."""
    root_dir = tmp_path_factory.mktemp("bz2")
    cfg = bz.load_config(TEST_YAML)
    bz.synthesize_sources(cfg, root_dir, scale=64, seed=0)
    bz.build(cfg, path_root=root_dir, scale=64)
    zp = root_dir / "data/VA/zarr/va_vae_dataset_test.zarr"
    return cfg, root_dir, zl.ZarrGroup(zp), zp


def _walk_arrays(group, prefix=""):
    for name in group.keys():
        item = group[name]
        path = f"{prefix}/{name}" if prefix else name
        if isinstance(item, zl.ZarrArray):
            yield path, item
        else:
            yield from _walk_arrays(item, path)


class TestVerbatimTestYaml:
    def test_all_variables_built(self, built_test_cube):
        cfg, _root_dir, root, _zp = built_test_cube
        specs = bz.parse_group_specs(cfg)
        expected = {f"{s.category}/{s.name}/{s.subsection}/{b.id}"
                    for s in specs for b in s.bands}
        built = {p for p, _ in _walk_arrays(root)
                 if p not in ("aoi", "strata")}
        assert built == expected
        assert len(expected) == 117  # the test config's inventory

    def test_root_rasters_and_grid(self, built_test_cube):
        _cfg, _rd, root, _zp = built_test_cube
        aoi = np.asarray(root["aoi"][:])
        strata = np.asarray(root["strata"][:])
        assert aoi.shape == (64, 64) and aoi.dtype == np.uint8
        assert set(np.unique(aoi)) <= {0, 1}
        assert strata.dtype == np.int16
        # grid attrs: affine from the YAML transform, scaled 64x
        gt = root.attrs["geo_transform"]
        assert gt[0] == 1427235 and gt[1] == 30 * 64
        assert root.attrs["time_coords"] == list(range(2010, 2025))

    def test_dtypes_by_semantic_type(self, built_test_cube):
        _cfg, _rd, root, _zp = built_test_cube
        assert root["annual"]["ccdc_annual"]["data"]["ndvi"].dtype \
            == np.float16
        assert root["static"]["evt"]["data"]["evt"].dtype == np.int16
        assert root["static"]["soils_masks"]["mask"]["dem_mask"].dtype \
            == np.uint8

    def test_categorical_histogram_stats(self, built_test_cube):
        _cfg, _rd, root, _zp = built_test_cube
        st = root["static"]["evt"]["data"]["evt"].attrs["statistics"]
        assert st["semantic_type"] == "categorical"
        assert st["num_classes"] >= 5
        assert all(isinstance(c, int) and c > 0
                   for c in st["histogram"].values())
        # class counts are bounded by the AOI-selected pixel count
        aoi = np.asarray(root["aoi"][:])
        assert sum(st["histogram"].values()) <= int((aoi > 0).sum())

    def test_mask_stats(self, built_test_cube):
        _cfg, _rd, root, _zp = built_test_cube
        st = root["static"]["soils_masks"]["mask"]["dem_mask"] \
            .attrs["statistics"]
        assert st["true_count"] > 0 and st["false_count"] > 0
        total = st["true_count"] + st["false_count"]
        assert st["true_fraction"] == pytest.approx(
            st["true_count"] / total)

    def test_continuous_stats_under_aoi_mask(self, built_test_cube):
        _cfg, _rd, root, _zp = built_test_cube
        arr = root["static"]["topo"]["data"]["elevation"]
        st = arr.attrs["statistics"]
        aoi = np.asarray(root["aoi"][:]) > 0
        v = np.asarray(arr[:], np.float32)[aoi]
        v = v[~np.isnan(v)]
        assert st["mean"] == pytest.approx(float(v.mean()), rel=1e-3)
        assert st["q50"] == pytest.approx(
            float(np.percentile(v, 50)), rel=1e-2, abs=1e-3)
        assert st["min"] <= st["q02"] <= st["q25"] <= st["q50"] \
            <= st["q75"] <= st["q98"] <= st["max"]
        assert st["sd"] == st["std"]

    def test_fill_value_sentinel_becomes_nan(self, built_test_cube):
        """ccdc_annual declares fill_value {source: -9999, target: na};
        the synthesizer sprinkles -9999 holes -> NaN in the cube."""
        _cfg, _rd, root, _zp = built_test_cube
        a = np.asarray(root["annual"]["ccdc_annual"]["data"]["ndvi"][:],
                       np.float32)
        assert np.isnan(a).any()
        assert not (a <= -9000).any()

    def test_per_band_annual_temporal_window(self, built_test_cube):
        """lcms VRTs span 1985-2024 (40 bands); the cube stores the
        global 2010-2024 window (build_zarr.py:849-911 + 1026-1052)."""
        _cfg, _rd, root, _zp = built_test_cube
        arr = root["annual"]["lcms_ysfc"]["data"][
            "lcms_ysfc_value_1985_2024"]
        assert arr.shape[0] == 15
        assert arr.attrs["time_coords"] == list(range(2010, 2025))

    def test_irregular_snapshot_years(self, built_test_cube):
        _cfg, _rd, root, _zp = built_test_cube
        arr = root["irregular"]["naip"]["data"]["NDVI"]
        assert arr.shape[0] == 7
        assert arr.attrs["snapshot_year"] == [2011, 2012, 2014, 2016,
                                              2018, 2021, 2023]
        assert arr.attrs["snapshot_coords"] == list(range(7))

    def test_conus_source_clipped(self, built_test_cube):
        """The EVT source is synthesized on a LARGER extent (CONUS in
        path) and the builder clips it to the config bounds -- the
        reference's clip-instead-of-reproject fast path."""
        _cfg, rd, root, _zp = built_test_cube
        src = rio.read_band(
            rd / "data/landfire/LF2024_EVT_CONUS/Tif/LF2024_EVT_CONUS.tif")
        assert src.data.shape[0] > 64  # padded extent
        assert root["static"]["evt"]["data"]["evt"].shape == (64, 64)

    def test_consolidated_metadata(self, built_test_cube):
        """zarr.consolidate_metadata parity (build_zarr.py:2287): one
        .zmetadata document external readers can open in a single read."""
        _cfg, _rd, _root, zp = built_test_cube
        doc = json.loads((zp / ".zmetadata").read_text())
        assert doc["zarr_consolidated_format"] == 1
        m = doc["metadata"]
        assert "static/evt/data/evt/.zarray" in m
        assert "annual/ccdc_annual/data/ndvi/.zattrs" in m
        assert m["annual/ccdc_annual/data/ndvi/.zarray"]["chunks"] \
            == [1, 256, 256]
        # every built variable has its array metadata consolidated
        n_arrays = sum(1 for k in m if k.endswith("/.zarray"))
        assert n_arrays == 117 + 2  # variables + aoi + strata

    def test_sidecars(self, built_test_cube):
        _cfg, _rd, _root, zp = built_test_cube
        sj = json.loads(zp.with_suffix(".stats.json").read_text())
        assert len(sj) == 117
        assert "histogram" in sj["static/evt/data/evt"]
        csv_text = zp.with_suffix(".stats.csv").read_text()
        assert csv_text.count("\n") >= 117
        assert "static/evt/data/evt" in csv_text

    def test_validate_only(self, built_test_cube):
        cfg, rd, _root, _zp = built_test_cube
        assert bz.build(cfg, path_root=rd, scale=64,
                        validate_only=True) is None


class TestFeedsTrainingStack:
    def test_v2_cube_feeds_forest_dataset(self, built_test_cube):
        """A cube built from the VERBATIM reference YAML is consumable by
        the FRL data stack: bindings resolve its hierarchical arrays,
        ForestDatasetV2 patches it, and a whitened feature builds."""
        from forest_tpu.data.bindings import parse_bindings
        from forest_tpu.data.feature_builder import FeatureBuilder
        from forest_tpu.data.frl_dataset import ForestDatasetV2

        _cfg, rd, _root, zp = built_test_cube
        b = parse_bindings({
            "version": "1.0", "name": "va_test",
            "zarr": {"path": str(zp), "structure": "hierarchical"},
            "time_window": {"start": 2010, "end": 2024},
            "stats": {"compute": "if-not-exists",
                      "file": str(rd / "stats.json"),
                      "stats": ["mean", "sd", "q25", "q50", "q75"],
                      "samples": {"n": 4, "reservoir_size": 10_000},
                      "mask": ["static_mask.aoi"]},
            "dataset": {
                "static_mask": {"type": "uint8", "dim": ["C", "H", "W"],
                                "channels": [
                                    {"name": "aoi", "source": "aoi"},
                                    {"name": "dem_mask", "source":
                                     "static/soils_masks/mask/dem_mask"}]},
                "static": {"type": "float32", "dim": ["C", "H", "W"],
                           "channels": [
                               {"name": "elevation", "source":
                                "static/topo/data/elevation"},
                               {"name": "slope", "source":
                                "static/topo/data/slope_deg"}]},
                "static_categorical": {
                    "type": "int16", "dim": ["C", "H", "W"],
                    "channels": [{"name": "evt",
                                  "source": "static/evt/data/evt",
                                  "fill_value": -1}]},
                "annual": {"type": "float32", "dim": ["C", "T", "H", "W"],
                           "channels": [
                               {"name": "ndvi", "source":
                                "annual/ccdc_annual/data/ndvi"},
                               {"name": "nbr", "source":
                                "annual/ccdc_annual/data/nbr"}]},
            },
            "features": {
                "type_encoder_input": {
                    "dim": ["C", "H", "W"],
                    "channels": {
                        "static.elevation": {"norm": "zscore"},
                        "static.slope": {"norm": "zscore"}}},
            },
        })
        ds = ForestDatasetV2(b, split=None, patch_size=32)
        assert len(ds) >= 4  # 64x64 grid -> 2x2 patches minimum
        p = ds.get_patch(0)
        assert p["static"].shape == (32, 32, 2)
        assert p["annual"].shape == (15, 32, 32, 2)
        evt = np.asarray(p["static_categorical"][..., 0])
        assert set(np.unique(evt[evt > 0])) <= set(range(7000, 10000))
        fb = FeatureBuilder(b)
        batch = {k: np.asarray(v)[None] for k, v in p.items()
                 if isinstance(v, np.ndarray)}
        import jax.numpy as jnp
        x, m = fb.build_feature("type_encoder_input",
                                {k: jnp.asarray(v)
                                 for k, v in batch.items()})
        assert x.shape == (1, 32, 32, 2)
        assert bool(jnp.isfinite(jnp.where(m, x, 0.0)).all())


class TestDemoScript:
    def test_reference_cube_demo_smoke(self, tmp_path, monkeypatch):
        """scripts/demo_reference_cube.py end-to-end on CPU: verbatim
        cube YAML -> v2 builder -> bindings -> one FRL training epoch ->
        markdown report."""
        import subprocess
        import sys

        script = Path(__file__).parents[1] / "scripts" \
            / "demo_reference_cube.py"
        env = dict(**__import__("os").environ,
                   FOREST_TPU_BENCH_PLATFORM="cpu")
        p = subprocess.run(
            [sys.executable, str(script), "--root", str(tmp_path),
             "--scale", "64", "--epochs", "1", "--patch", "32",
             "--batch", "2", "--report", str(tmp_path / "report.md")],
            capture_output=True, text=True, timeout=540, env=env)
        assert p.returncode == 0, p.stderr[-2000:]
        report = (tmp_path / "report.md").read_text()
        assert "va_vae_dataset_test.yaml" in report
        assert "| 0 |" in report  # epoch table row
        res = json.loads((tmp_path / "result.json").read_text())
        assert np.isfinite(res["loss_last"])


class TestEvtOnlyAppendLadder:
    def test_fresh_then_append(self, tmp_path):
        cfg = bz.load_config(EVT_YAML)
        bz.synthesize_sources(cfg, tmp_path, scale=128, seed=0)
        bz.build(cfg, path_root=tmp_path, scale=128)
        zp = tmp_path / "data/VA/zarr/va_vae_dataset.zarr"
        root = zl.ZarrGroup(zp)
        evt1 = np.asarray(root["static"]["evt"]["data"]["evt"][:])
        assert evt1.shape == (102, 184)  # full-VA bounds / (30m * 128)
        marker = root.create_array("marker", (4, 4), (4, 4), np.float32,
                                   fill_value=0)
        marker[:] = np.arange(16, dtype=np.float32).reshape(4, 4)
        # new source content, --append: evt updates, marker survives
        bz.synthesize_sources(cfg, tmp_path, scale=128, seed=7)
        bz.build(cfg, path_root=tmp_path, scale=128, append=True)
        root2 = zl.ZarrGroup(zp)
        evt2 = np.asarray(root2["static"]["evt"]["data"]["evt"][:])
        assert (evt1 != evt2).any()
        assert np.array_equal(
            np.asarray(root2["marker"][:]),
            np.arange(16, dtype=np.float32).reshape(4, 4))
        st = root2["static"]["evt"]["data"]["evt"].attrs["statistics"]
        assert st["num_classes"] >= 5


class TestOtherReferenceYamls:
    def test_static_only_yaml_builds(self, tmp_path):
        """va_vae_dataset_static_only.yaml has NO time block at all --
        the has_temporal=False path (67 static bands, full-VA bounds)."""
        cfg = bz.load_config(REF / "va_vae_dataset_static_only.yaml")
        bz.synthesize_sources(cfg, tmp_path, scale=128, seed=0)
        root = bz.build(cfg, path_root=tmp_path, scale=128)
        built = [p for p, _ in _walk_arrays(root)
                 if p not in ("aoi", "strata")]
        specs = bz.parse_group_specs(cfg)
        assert len(built) == sum(len(s.bands) for s in specs) == 67
        assert all(p.startswith("static/") for p in built)
        assert "time_coords" not in root.attrs

    def test_full_yaml_validates(self, tmp_path):
        """The production va_vae_dataset_full.yaml parses + validates
        end-to-end against synthesized sources (the build itself is
        covered by the structurally-identical test-subset YAML)."""
        cfg = bz.load_config(REF / "va_vae_dataset_full.yaml")
        bz.synthesize_sources(cfg, tmp_path, scale=256, seed=0)
        assert bz.build(cfg, path_root=tmp_path, scale=256,
                        validate_only=True) is None


class TestValidation:
    @pytest.fixture()
    def mini_cfg(self, tmp_path):
        cfg = bz.load_config(EVT_YAML)
        bz.synthesize_sources(cfg, tmp_path, scale=128, seed=0)
        return cfg, tmp_path

    def test_missing_file_is_an_error(self, mini_cfg, tmp_path):
        cfg, rd = mini_cfg
        evt_tif = rd / "data/landfire/LF2024_EVT_CONUS/Tif" \
            / "LF2024_EVT_CONUS.tif"
        evt_tif.unlink()
        with pytest.raises(ValueError, match="validation failed"):
            bz.build(cfg, path_root=rd, scale=128, validate_only=True)

    def test_source_band_out_of_range(self, mini_cfg):
        cfg, rd = mini_cfg
        cfg2 = yaml.safe_load(yaml.safe_dump(cfg))
        cfg2["static"][0]["data"]["bands"][0]["source_band"] = 99
        with pytest.raises(ValueError, match="out of range"):
            bz.build(cfg2, path_root=rd, scale=128, validate_only=True)

    def test_crs_mismatch_reports_reprojection(self, mini_cfg):
        """A source in a different projection is a reprojection REPORT,
        not an error (build_zarr.py:1977-1982)."""
        cfg, rd = mini_cfg
        spatial = bz.parse_spatial_config(cfg).scaled(128)
        gx0, gdx, gy0, gdy = spatial.grid_transform
        h, w = spatial.shape
        utm = ('PROJCS["UTM17N",GEOGCS["GCS_WGS_1984",DATUM["WGS_1984",'
               'SPHEROID["WGS_84",6378137,298.257223563]]],'
               'PROJECTION["Transverse_Mercator"],'
               'PARAMETER["Central_Meridian",-81],'
               'AUTHORITY["EPSG","32617"]]')
        p = rd / "data/landfire/LF2024_EVT_CONUS/Tif/LF2024_EVT_CONUS.tif"
        rio.write_geotiff(p, np.zeros((h, w), np.float32),
                          transform=(gx0, gdx, gy0, gdy), crs_wkt=utm)
        specs = bz.parse_group_specs(cfg)
        report = bz.validate_configuration(
            cfg, spatial, specs, None, bz.PathResolver(rd))
        assert any("CRS mismatch" in r
                   for r in report["reprojection_needed"])

    def test_resolution_mismatch_reported(self, mini_cfg):
        cfg, rd = mini_cfg
        spatial = bz.parse_spatial_config(cfg).scaled(128)
        gx0, gdx, gy0, gdy = spatial.grid_transform
        p = rd / "data/VA/main/va_mask.tif"
        rio.write_geotiff(p, np.ones((10, 10), np.float32),
                          transform=(gx0, gdx / 2, gy0, gdy / 2),
                          crs_wkt=spatial.crs_wkt)
        specs = bz.parse_group_specs(cfg)
        report = bz.validate_configuration(
            cfg, spatial, specs, None, bz.PathResolver(rd))
        assert any("resolution mismatch" in r
                   for r in report["reprojection_needed"])


class TestCrsMatch:
    AEA_WGS84 = ('PROJCS["AEA_WGS84",GEOGCS["GCS_WGS_1984",DATUM['
                 '"WGS_1984",SPHEROID["WGS_84",6378137,298.257223563]]],'
                 'PROJECTION["Albers_Conic_Equal_Area"],'
                 'PARAMETER["Central_Meridian",-96],'
                 'PARAMETER["Standard_Parallel_1",29.5],'
                 'PARAMETER["Standard_Parallel_2",45.5],'
                 'PARAMETER["Latitude_Of_Origin",23]]')
    AEA_NAD83 = AEA_WGS84.replace("WGS_1984", "North_American_1983") \
        .replace("GCS_WGS_1984", "GCS_North_American_1983")

    def test_projection_mode_ignores_datum(self):
        assert bz.crs_match(self.AEA_NAD83, None, self.AEA_WGS84, None,
                            mode="projection")
        assert not bz.crs_match(self.AEA_NAD83, None, self.AEA_WGS84,
                                None, mode="exact")

    def test_parameter_mismatch_fails(self):
        other = self.AEA_WGS84.replace('"Central_Meridian",-96',
                                       '"Central_Meridian",-120')
        assert not bz.crs_match(other, None, self.AEA_WGS84, None)

    def test_epsg_codes_win(self):
        assert bz.crs_match(None, 5070, None, 5070)
        assert not bz.crs_match(None, 5070, None, 4326)


class TestMultibandAnnual:
    def test_bands_are_years(self, tmp_path):
        """The multiband-annual pattern (build_zarr.py:801-846): one file,
        band b = band_start + (year - year_start). Not exercised by the
        shipped configs, gated here with a minimal config."""
        wkt = TestCrsMatch.AEA_WGS84
        tf = (0.0, 30.0, 900.0, -30.0)
        data = np.stack([np.full((30, 30), y, np.float32)
                         for y in range(5)])
        rio.write_multiband_geotiff(tmp_path / "mb.tif", data,
                                    transform=tf, crs_wkt=wkt)
        cfg = {
            "dataset": {
                "name": "mini", "out_zarr": {"path": "out.zarr"},
                "spatial": {"crs": {"wkt": wkt}, "resolution": 30,
                            "transform": [30, 0, 0, 0, -30, 900],
                            "bounds": {"xmin": 0, "ymin": 0,
                                       "xmax": 900, "ymax": 900}},
                "dtype": {"continuous": "float32"},
                "time": {"continuous": {"start": 2011, "end": 2013}},
            },
            "annual": [{
                "group": "g",
                "path": str(tmp_path / "mb.tif"),
                "years": {"start": 2010, "end": 2014},
                "data": {"bands": [{"id": "v", "source_band": 1}]},
            }],
        }
        root = bz.build(cfg, out=tmp_path / "out.zarr")
        arr = root["annual"]["g"]["data"]["v"]
        # global window 2011-2013 -> bands 2, 3, 4 (values 1, 2, 3)
        got = np.asarray(arr[:])
        assert got.shape == (3, 30, 30)
        assert [float(got[t, 0, 0]) for t in range(3)] == [1.0, 2.0, 3.0]


class TestRasterAndVrtIO:
    def test_multipage_roundtrip(self, tmp_path):
        b = np.random.default_rng(0).normal(
            size=(6, 12, 17)).astype(np.float32)
        p = tmp_path / "mb.tif"
        rio.write_multiband_geotiff(p, b, transform=(10, 5.0, 90, -5.0),
                                    nodata=-1.0)
        assert rio.num_bands(p) == 6
        r = rio.read_band(p, 4)
        assert np.allclose(r.data, b[3])
        assert r.transform == (10.0, 5.0, 90.0, -5.0)
        assert r.nodata == -1.0

    def test_vrt_mosaic_placement(self, tmp_path):
        a = np.full((8, 8), 1.0, np.float32)
        b = np.full((8, 8), 2.0, np.float32)
        rio.write_geotiff(tmp_path / "a.tif", a,
                          transform=(0, 1.0, 8, -1.0))
        rio.write_geotiff(tmp_path / "b.tif", b,
                          transform=(8, 1.0, 8, -1.0))
        (tmp_path / "m.vrt").write_text(
            '<VRTDataset rasterXSize="16" rasterYSize="8">'
            "<GeoTransform>0, 1, 0, 8, 0, -1</GeoTransform>"
            '<VRTRasterBand dataType="Float32" band="1">'
            "<SimpleSource>"
            '<SourceFilename relativeToVRT="1">a.tif</SourceFilename>'
            "<SourceBand>1</SourceBand>"
            '<DstRect xOff="0" yOff="0" xSize="8" ySize="8"/>'
            "</SimpleSource><SimpleSource>"
            '<SourceFilename relativeToVRT="1">b.tif</SourceFilename>'
            "<SourceBand>1</SourceBand>"
            '<DstRect xOff="8" yOff="0" xSize="8" ySize="8"/>'
            "</SimpleSource></VRTRasterBand></VRTDataset>")
        r = vrtmod.read_vrt_band(tmp_path / "m.vrt")
        assert r.data.shape == (8, 16)
        assert (r.data[:, :8] == 1.0).all() and (r.data[:, 8:] == 2.0).all()

    def test_vrt_srcrect_overhang_pads_nodata(self, tmp_path):
        """A SrcRect extending past the source file's real extent is legal
        in GDAL (boundless read pads with nodata): the overhang must land
        as the band's fill, not abort the mosaic with a broadcast error."""
        a = np.full((4, 4), 3.0, np.float32)
        rio.write_geotiff(tmp_path / "a.tif", a,
                          transform=(0, 1.0, 8, -1.0))
        (tmp_path / "o.vrt").write_text(
            '<VRTDataset rasterXSize="8" rasterYSize="8">'
            "<GeoTransform>0, 1, 0, 8, 0, -1</GeoTransform>"
            '<VRTRasterBand dataType="Float32" band="1">'
            "<NoDataValue>-9</NoDataValue>"
            "<SimpleSource>"
            '<SourceFilename relativeToVRT="1">a.tif</SourceFilename>'
            "<SourceBand>1</SourceBand>"
            '<SrcRect xOff="0" yOff="0" xSize="8" ySize="8"/>'
            '<DstRect xOff="0" yOff="0" xSize="8" ySize="8"/>'
            "</SimpleSource></VRTRasterBand></VRTDataset>")
        r = vrtmod.read_vrt_band(tmp_path / "o.vrt")
        assert (r.data[:4, :4] == 3.0).all()
        assert (r.data[4:, :] == -9).all() and (r.data[:, 4:] == -9).all()

    def test_vrt_scaled_source_rejected(self, tmp_path):
        rio.write_geotiff(tmp_path / "a.tif",
                          np.zeros((8, 8), np.float32))
        (tmp_path / "s.vrt").write_text(
            '<VRTDataset rasterXSize="16" rasterYSize="16">'
            '<VRTRasterBand dataType="Float32" band="1"><SimpleSource>'
            '<SourceFilename relativeToVRT="1">a.tif</SourceFilename>'
            '<SrcRect xOff="0" yOff="0" xSize="8" ySize="8"/>'
            '<DstRect xOff="0" yOff="0" xSize="16" ySize="16"/>'
            "</SimpleSource></VRTRasterBand></VRTDataset>")
        with pytest.raises(ValueError, match="scaled source"):
            vrtmod.read_vrt_band(tmp_path / "s.vrt")

    def test_write_vrt_helper_roundtrip(self, tmp_path):
        b = np.random.default_rng(1).normal(
            size=(3, 9, 11)).astype(np.float32)
        rio.write_multiband_geotiff(tmp_path / "t.tif", b)
        vrtmod.write_vrt(tmp_path / "h.vrt", (9, 11),
                         [[("t.tif", i + 1)] for i in range(3)],
                         transform=(0, 1.0, 9, -1.0), nodata=-9)
        ds = vrtmod.VRTDataset(tmp_path / "h.vrt")
        assert ds.num_bands == 3
        assert np.allclose(ds.read_band(2), b[1])
        assert ds.band_nodata(1) == -9.0
