"""GeoTIFF reader/writer + builder ingestion (data/raster.py).

Covers the reference raster-helper role scoped to aligned grids
(/root/reference/utils/rasterio.py:27-397): decode + georeferencing tags,
windowed reads with shifted transforms, alignment rejection, per-year
stacks, and zarr_builder ingestion stamping the cube geo_transform that
eval/embed_locations --map-coords consumes. PIL serves as the independent
encode oracle.
"""
import numpy as np
import pytest

pytest.importorskip("PIL")

from forest_tpu.data import raster as rio  # noqa: E402

GT = (5000.0, 30.0, 90000.0, -30.0)  # x0, dx, y0, dy


class TestReadWrite:
    def test_float_roundtrip_with_tags(self, tmp_path):
        a = np.arange(20, dtype=np.float32).reshape(4, 5) / 3.0
        a[0, 0] = -9999.0
        p = tmp_path / "t.tif"
        rio.write_geotiff(p, a, transform=GT, nodata=-9999)
        r = rio.read_geotiff(p)
        np.testing.assert_array_equal(r.data, a)
        assert r.transform == pytest.approx(GT)
        assert r.nodata == -9999
        m = r.masked()
        assert np.isnan(m[0, 0]) and m[1, 1] == a[1, 1]

    def test_uint8_and_uint16(self, tmp_path):
        for dtype in (np.uint8, np.uint16):
            a = np.arange(12, dtype=dtype).reshape(3, 4)
            p = tmp_path / f"t_{dtype.__name__}.tif"
            rio.write_geotiff(p, a, transform=GT)
            r = rio.read_geotiff(p)
            np.testing.assert_array_equal(r.data, a)

    def test_pil_written_file_reads(self, tmp_path):
        """Independent-encoder oracle: a PIL-authored file with hand-set
        GeoTIFF tags (the tag layout GDAL emits) parses identically."""
        from PIL import Image, TiffImagePlugin
        a = np.random.default_rng(0).normal(
            size=(6, 7)).astype(np.float32)
        ifd = TiffImagePlugin.ImageFileDirectory_v2()
        ifd[33550] = (30.0, 30.0, 0.0)
        ifd.tagtype[33550] = TiffImagePlugin.TiffTags.DOUBLE
        # tiepoint at pixel (2, 1): x0 must back out to 5000 - 2*30
        ifd[33922] = (2.0, 1.0, 0.0, 5000.0, 90000.0, 0.0)
        ifd.tagtype[33922] = TiffImagePlugin.TiffTags.DOUBLE
        p = tmp_path / "pil.tif"
        Image.fromarray(a, mode="F").save(p, tiffinfo=ifd)
        r = rio.read_geotiff(p)
        np.testing.assert_array_equal(r.data, a)
        assert r.transform == pytest.approx(
            (5000.0 - 2 * 30.0, 30.0, 90000.0 + 1 * 30.0, -30.0))

    def test_window_shifts_transform(self, tmp_path):
        a = np.arange(48, dtype=np.float32).reshape(6, 8)
        p = tmp_path / "t.tif"
        rio.write_geotiff(p, a, transform=GT)
        r = rio.read_geotiff(p, window=(2, 3, 3, 4))
        np.testing.assert_array_equal(r.data, a[2:5, 3:7])
        x0, dx, y0, dy = GT
        assert r.transform == pytest.approx(
            (x0 + 3 * dx, dx, y0 + 2 * dy, dy))
        with pytest.raises(ValueError, match="window"):
            rio.read_geotiff(p, window=(4, 0, 5, 4))

    def test_alignment_rejected(self, tmp_path):
        a = np.zeros((4, 4), np.float32)
        pa, pb = tmp_path / "a.tif", tmp_path / "b.tif"
        rio.write_geotiff(pa, a, transform=GT)
        rio.write_geotiff(pb, a, transform=(0.0, 30.0, 0.0, -30.0))
        with pytest.raises(ValueError, match="pre-aligned"):
            rio.assert_aligned(rio.read_geotiff(pa), rio.read_geotiff(pb))

    def test_year_stack(self, tmp_path):
        for y in (2010, 2011, 2012):
            rio.write_geotiff(tmp_path / f"ndvi_{y}.tif",
                              np.full((3, 4), float(y), np.float32),
                              transform=GT, nodata=-1)
        stack, first = rio.read_year_stack("ndvi_*.tif", tmp_path,
                                           expect_t=3)
        assert stack.shape == (3, 3, 4)
        assert stack[0, 0, 0] == 2010 and stack[2, 0, 0] == 2012
        with pytest.raises(ValueError, match="expected 4"):
            rio.read_year_stack("ndvi_*.tif", tmp_path, expect_t=4)
        with pytest.raises(FileNotFoundError):
            rio.read_year_stack("nope_*.tif", tmp_path)


class TestFineToPatches:
    def test_naip_style_3x3_prebake(self):
        """10m-in-30m alignment: each coarse cell's patch holds exactly its
        nine nested fine pixels (reference _read_naip_block reshape)."""
        h30, w30, k = 4, 5, 3
        fine_vals = np.arange(h30 * k * w30 * k,
                              dtype=np.float32).reshape(h30 * k, w30 * k)
        fine = rio.Raster(
            data=fine_vals,
            transform=(GT[0], GT[1] / k, GT[2], GT[3] / k), nodata=None)
        out = rio.align_fine_to_patches(fine, GT, (1, 3, 2, 5))
        assert out.shape == (2, 3, 3, 3, 1)
        # cell (1, 2) of the coarse grid = fine rows 3:6, cols 6:9
        np.testing.assert_array_equal(out[0, 0, :, :, 0],
                                      fine_vals[3:6, 6:9])
        np.testing.assert_array_equal(out[1, 2, :, :, 0],
                                      fine_vals[6:9, 12:15])

    def test_boundless_fill_and_nodata(self):
        h30, w30, k = 2, 2, 3
        fine_vals = np.ones((h30 * k, w30 * k), np.float32)
        fine_vals[0, 0] = -1.0
        fine = rio.Raster(
            data=fine_vals,
            transform=(GT[0], GT[1] / k, GT[2], GT[3] / k), nodata=-1)
        # window extends one coarse cell past the raster on each side
        out = rio.align_fine_to_patches(fine, GT, (-1, 2, -1, 2))
        assert out.shape == (3, 3, 3, 3, 1)
        assert np.isnan(out[0, :, :, :, 0]).all()   # boundless row
        assert np.isnan(out[:, 0, :, :, 0]).all()   # boundless col
        assert np.isnan(out[1, 1, 0, 0, 0])         # nodata -> NaN
        assert out[1, 1, 1, 1, 0] == 1.0
        assert out[2, 2, 2, 2, 0] == 1.0


class TestBuilderGeotiffIngestion:
    def test_build_cube_from_tifs(self, tmp_path):
        """Static tif + per-year tif glob -> cube; GeoTIFF nodata becomes
        NaN, the cube geo_transform attr comes from the rasters, and
        embed_locations.map_to_pixel round-trips through it."""
        import yaml
        from forest_tpu.data import zarr_builder as zb
        from forest_tpu.data import zarrlite as zl
        from forest_tpu.eval.embed_locations import map_to_pixel

        h, w, years = 8, 10, (2020, 2021)
        elev = np.random.default_rng(0).normal(
            300, 50, (h, w)).astype(np.float32)
        elev[0, 1] = -9999.0
        rio.write_geotiff(tmp_path / "elev.tif", elev, transform=GT,
                          nodata=-9999)
        for y in years:
            rio.write_geotiff(tmp_path / f"ndvi_{y}.tif",
                              np.full((h, w), y / 1e4, np.float32),
                              transform=GT)
        spec = {
            "output": "cube.zarr",
            "spatial": {"height": h, "width": w, "chunk_y": 4,
                        "chunk_x": 4},
            "time": {"start": years[0], "end": years[-1]},
            "groups": [
                {"name": "topo", "kind": "static", "category": "data",
                 "dtype": "float32",
                 "bands": [{"name": "elevation", "source": "elev.tif"}]},
                {"name": "ccdc", "kind": "annual", "category": "data",
                 "dtype": "float32",
                 "bands": [{"name": "ndvi", "source": "ndvi_*.tif"}]},
            ],
        }
        (tmp_path / "spec.yaml").write_text(yaml.safe_dump(spec))
        zb.build_cube(spec, tmp_path)
        root = zl.open_zarr(tmp_path / "cube.zarr")
        got_elev = np.asarray(root["static/topo/data/elevation"][:, :])
        assert np.isnan(got_elev[0, 1])              # nodata -> NaN
        np.testing.assert_allclose(got_elev[2:, :], elev[2:, :])
        ndvi = np.asarray(root["annual/ccdc/data/ndvi"][:, :, :])
        assert ndvi.shape == (2, h, w)
        assert ndvi[1, 0, 0] == pytest.approx(2021 / 1e4)
        # geo_transform stamped from the rasters; map->pixel roundtrips
        gt = root.attrs["geo_transform"]
        assert gt == pytest.approx(list(GT))
        rc = map_to_pixel([GT[0] + 7 * GT[1]], [GT[2] + 3 * GT[3]], gt)
        assert (rc[0] == [3, 7]).all()

    def test_nodata_keyed_on_target_dtype(self, tmp_path):
        """An INTEGER source raster feeding a FLOAT cube band must map its
        GDAL_NODATA sentinel to NaN (regression: the sentinel leaked into
        the stored data + stats); a float glob feeding an INTEGER band maps
        it to the band's fill_value instead of casting NaN to garbage."""
        from forest_tpu.data import zarr_builder as zb
        from forest_tpu.data import zarrlite as zl
        u = np.arange(16, dtype=np.uint16).reshape(4, 4) + 10
        u[0, 0] = 65535
        rio.write_geotiff(tmp_path / "elev.tif", u, transform=GT,
                          nodata=65535)
        for y in (2020, 2021):
            f = np.full((4, 4), 0.5, np.float32)
            f[1, 1] = -9.0
            rio.write_geotiff(tmp_path / f"code_{y}.tif", f,
                              transform=GT, nodata=-9)
        spec = {"output": "cube.zarr",
                "spatial": {"height": 4, "width": 4, "chunk_y": 4,
                            "chunk_x": 4},
                "time": {"start": 2020, "end": 2021},
                "groups": [
                    {"name": "topo", "kind": "static", "dtype": "float32",
                     "bands": [{"name": "elev", "source": "elev.tif"}]},
                    {"name": "codes", "kind": "annual", "dtype": "int16",
                     "fill_value": -1,
                     "bands": [{"name": "code",
                                "source": "code_*.tif"}]}]}
        zb.build_cube(spec, tmp_path)
        root = zl.open_zarr(tmp_path / "cube.zarr")
        elev = np.asarray(root["static/topo/data/elev"][:, :])
        assert np.isnan(elev[0, 0])               # sentinel -> NaN
        assert elev[1, 1] == 15.0                 # real values intact
        st = root["static/topo/data/elev"].attrs["statistics"]
        assert st["max"] < 65535                  # stats sentinel-free
        code = np.asarray(root["annual/codes/data/code"][:, :, :])
        assert code[0, 1, 1] == -1                # sentinel -> fill_value
        assert code[1, 0, 0] == 0                 # 0.5 cast to int16

    def test_misaligned_tif_rejected(self, tmp_path):
        from forest_tpu.data import zarr_builder as zb
        rio.write_geotiff(tmp_path / "a.tif",
                          np.zeros((4, 4), np.float32), transform=GT)
        rio.write_geotiff(tmp_path / "b.tif",
                          np.zeros((4, 4), np.float32),
                          transform=(0.0, 30.0, 0.0, -30.0))
        spec = {"output": "cube.zarr",
                "spatial": {"height": 4, "width": 4, "chunk_y": 4,
                            "chunk_x": 4},
                "groups": [
                    {"name": "g", "kind": "static", "dtype": "float32",
                     "bands": [{"name": "a", "source": "a.tif"},
                               {"name": "b", "source": "b.tif"}]}]}
        with pytest.raises(ValueError, match="pre-aligned"):
            zb.build_cube(spec, tmp_path)
