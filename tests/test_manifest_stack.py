"""Manifest raster stacking (data_stack equivalent).

Reference contract: /root/reference/utils/data_stack.py:45-419 (year
selection, tolerant CSV indexing, cross-year consistency, stacking,
metadata) and /root/reference/utils/raster_ops.py:56-83 (boundless read
into the mask grid).
"""
import numpy as np
import pytest

from forest_tpu.data import manifest_stack as ms
from forest_tpu.data import raster as rio


# ---------------------------------------------------------------- fixtures
GRID = (0.0, 30.0, 3000.0, -30.0)  # x0, dx, y0, dy (north-up, 30 m)


def _write_band(path, arr, transform=GRID, nodata=None):
    rio.write_geotiff(path, np.asarray(arr, np.float32),
                      transform=transform, nodata=nodata)


@pytest.fixture()
def manifest_dir(tmp_path):
    """2 years x (2 int + 1 cat) features on a 16x12 grid + mask."""
    rng = np.random.default_rng(7)
    H, W = 16, 12
    vals = {}
    for y in (2020, 2021):
        for fid, kind in (("ndvi", "int"), ("nbr", "int"),
                          ("landcover", "cat")):
            if kind == "int":
                a = rng.normal(size=(H, W)).astype(np.float32)
            else:
                a = rng.integers(0, 5, (H, W)).astype(np.float32)
            vals[(y, fid)] = a
            _write_band(tmp_path / f"{fid}_{y}.tif", a)
    mask = np.zeros((H, W), np.float32)
    mask[2:14, 1:11] = 1.0
    _write_band(tmp_path / "mask.tif", mask)
    rows = [f"{y},{k},{tmp_path / f'{f}_{y}.tif'},{f}"
            for y in (2020, 2021)
            for f, k in (("ndvi", "int"), ("nbr", "int"),
                         ("landcover", "cat"))]
    (tmp_path / "features.csv").write_text(
        "year,kind,file_path,fid\n" + "\n".join(rows) + "\n")
    return tmp_path, vals, mask.astype(bool), (H, W)


# ---------------------------------------------------------------- units
def test_select_years():
    assert ms.select_years([2021], 3) == [2019, 2020, 2021]
    assert ms.select_years([2019, 2021], 2) == [2018, 2019, 2020, 2021]
    with pytest.raises(ValueError):
        ms.select_years([], 3)


def test_index_inputs_headered_aliases(tmp_path):
    f = tmp_path / "m.csv"
    f.write_text("# comment\nyr,type,filepath,feature\n"
                 "2020,int,a/ndvi.tif,ndvi\n"
                 "2020,cat,a/lc.tif,\n")      # empty fid -> stem
    y2f = ms.index_inputs(f, [2020])
    assert [r["fid"] for r in y2f[2020]] == ["lc", "ndvi"]  # fid-sorted
    assert y2f[2020][0]["kind"] == "cat"
    assert y2f[2020][1]["path"] == "a/ndvi.tif"


def test_index_inputs_headerless_sniffing(tmp_path):
    f = tmp_path / "m.txt"
    # columns shuffled per row style: path kind year [fid]; tabs + spaces
    f.write_text("a/ndvi.tif\tint\t2020\tndvi\n"
                 "2020 cat a/lc.tif\n")
    y2f = ms.index_inputs(f, [2020])
    fids = [r["fid"] for r in y2f[2020]]
    assert fids == ["lc", "ndvi"]


def test_index_inputs_missing_year_raises(tmp_path):
    f = tmp_path / "m.csv"
    f.write_text("year,kind,path\n2020,int,a.tif\n")
    with pytest.raises(ValueError, match="year=2021"):
        ms.index_inputs(f, [2020, 2021])


def test_enforce_consistent_features():
    y2f = {2020: [{"fid": "a", "kind": "int", "path": "x"}],
           2021: [{"fid": "b", "kind": "int", "path": "y"}]}
    with pytest.raises(ValueError, match="Inconsistent"):
        ms.enforce_consistent_features(y2f, [2020, 2021])
    y2f[2021][0]["fid"] = "a"
    fids, kinds = ms.enforce_consistent_features(y2f, [2020, 2021])
    assert fids == ["a"] and kinds == ["int"]


def test_read_into_mask_grid_offsets_and_fill(tmp_path):
    """Source shifted off the mask grid: overlap lands at the right rows,
    outside is NaN (boundless fill), nodata maps to NaN."""
    src = np.arange(20, dtype=np.float32).reshape(4, 5)
    src[0, 0] = -9999.0
    # source origin 2 px east, 1 px south of the mask origin
    t = (GRID[0] + 2 * GRID[1], GRID[1], GRID[2] + 1 * GRID[3], GRID[3])
    _write_band(tmp_path / "s.tif", src, transform=t, nodata=-9999.0)
    out = ms.read_into_mask_grid(tmp_path / "s.tif", (6, 8), GRID)
    assert out.shape == (6, 8)
    assert np.isnan(out[0]).all()              # north of source
    assert np.isnan(out[:, :2]).all()          # west of source
    assert np.isnan(out[1, 2])                 # nodata pixel
    assert out[1, 3] == 1.0 and out[2, 2] == 5.0
    assert np.isnan(out[5]).all()              # south of source


def test_read_into_mask_grid_rejects_mismatched_res(tmp_path):
    _write_band(tmp_path / "s.tif", np.zeros((4, 4), np.float32),
                transform=(0.0, 10.0, 0.0, -10.0))
    with pytest.raises(ValueError, match="pixel size"):
        ms.read_into_mask_grid(tmp_path / "s.tif", (4, 4), GRID)


# ---------------------------------------------------------------- stack
def test_stack_reads_and_shape(manifest_dir):
    base, vals, mask, (H, W) = manifest_dir
    years = [2020, 2021]
    y2f = ms.index_inputs(base / "features.csv", years)
    st = ms.ManifestStack(y2f, years, (H, W), GRID, base_dir=base)
    assert st.shape == (2, H, W, 3)
    assert st.fids == ["landcover", "nbr", "ndvi"]
    assert st.kinds == ["cat", "int", "int"]
    np.testing.assert_allclose(st.read_feature(0, 2),
                               vals[(2020, "ndvi")], atol=1e-6)
    slab = st.read_year(1)
    assert slab.shape == (H, W, 3)
    np.testing.assert_allclose(slab[..., 1], vals[(2021, "nbr")],
                               atol=1e-6)


def test_feature_metadata_matches_numpy(manifest_dir):
    base, vals, mask, (H, W) = manifest_dir
    years = [2020, 2021]
    y2f = ms.index_inputs(base / "features.csv", years)
    st = ms.ManifestStack(y2f, years, (H, W), GRID, base_dir=base)
    meta = ms.compute_feature_metadata(st, mask)
    by_name = {f["name"]: f for f in meta["features"]}

    ref = np.concatenate([vals[(y, "ndvi")][mask] for y in years])
    s = by_name["ndvi"]["stats"]
    assert s["mean"] == pytest.approx(float(ref.mean()), abs=1e-6)
    assert s["std"] == pytest.approx(float(ref.std()), abs=1e-6)
    assert s["q50"] == pytest.approx(float(np.quantile(ref, 0.5)),
                                     abs=1e-6)
    assert s["min"] == pytest.approx(float(ref.min()), abs=1e-6)

    lc = np.concatenate([vals[(y, "landcover")][mask] for y in years])
    counts = {c["code"]: c["count"] for c in by_name["landcover"]["classes"]}
    for code in np.unique(lc.astype(int)):
        assert counts[int(code)] == int((lc == code).sum())
    assert sum(counts.values()) == lc.size


def test_naip_metadata():
    rng = np.random.default_rng(3)
    naip = rng.normal(size=(6, 5, 3, 3, 2)).astype(np.float32)
    mask = np.zeros((6, 5), bool)
    mask[1:5, 1:4] = True
    meta = ms.compute_naip_metadata(naip, mask, include_source="n.tif")
    assert meta["bands"] == 2 and meta["kshape"] == (3, 3)
    assert meta["source"] == "n.tif"
    v = naip[mask][..., 0].ravel()
    assert meta["q50"][0] == pytest.approx(float(np.quantile(v, 0.5)),
                                           abs=1e-6)
    assert meta["q01"][1] is not None and len(meta["q99"]) == 2


# ---------------------------------------------------------------- e2e
def test_build_manifest_cube_end_to_end(manifest_dir, tmp_path):
    base, vals, mask, (H, W) = manifest_dir
    # fine NAIP raster at 10 m (3x per 30 m cell), aligned to the grid
    rng = np.random.default_rng(11)
    fine = rng.normal(size=(H * 3, W * 3)).astype(np.float32)
    rio.write_geotiff(base / "naip.tif", fine,
                      transform=(GRID[0], 10.0, GRID[2], -10.0))

    out = tmp_path / "cube.zarr"
    root = ms.build_manifest_cube(
        "features.csv", "mask.tif", out, end_years=[2021], window_len=2,
        naip_path="naip.tif", base_dir=base, chunk_yx=8, patch_size=8)

    assert root.attrs["cont_names"] == ["nbr", "ndvi"]
    assert root.attrs["cat_names"] == ["landcover"]
    cont = root["continuous"][:]
    np.testing.assert_allclose(cont[0, 1], vals[(2020, "ndvi")],
                               atol=1e-6)
    np.testing.assert_allclose(cont[1, 0], vals[(2021, "nbr")],
                               atol=1e-6)
    cat = root["categorical"][:]
    assert cat.dtype == np.int16
    np.testing.assert_array_equal(
        cat[0, 0], vals[(2020, "landcover")].astype(np.int16))
    np.testing.assert_array_equal(root["aoi_mask"][:].astype(bool), mask)
    naip = root["naip"][:]
    assert naip.shape == (H, W, 3, 3, 1)
    np.testing.assert_allclose(naip[0, 0, :, :, 0], fine[:3, :3],
                               atol=1e-6)

    meta = root.attrs["feature_meta"]
    assert {f["name"] for f in meta["features"]} == {"ndvi", "nbr",
                                                     "landcover"}
    assert root.attrs["cont_stats"]["ndvi"]["sd"] > 0
    assert root.attrs["geo_transform"] == list(GRID)
    assert "naip_meta" in root.attrs
    assert list(root["years"][:]) == [2020, 2021]


def test_build_manifest_cube_loads_with_legacy_reader(manifest_dir,
                                                      tmp_path):
    base, _, _, _ = manifest_dir
    out = tmp_path / "cube2.zarr"
    ms.build_manifest_cube("features.csv", "mask.tif", out,
                           end_years=[2021], window_len=2, base_dir=base,
                           chunk_yx=8, patch_size=8)
    from forest_tpu.data.cube import LegacyCube
    cube = LegacyCube(out)
    assert list(cube.years) == [2020, 2021]
    assert cube.cont_names == ["nbr", "ndvi"]


def test_cli_main(manifest_dir, tmp_path, capsys):
    base, _, _, _ = manifest_dir
    out = tmp_path / "cli.zarr"
    ms.main(["--features-csv", "features.csv", "--mask", "mask.tif",
             "--output", str(out), "--end-years", "2021",
             "--window-len", "2", "--base-dir", str(base),
             "--chunk-yx", "8", "--patch-size", "8"])
    assert "cont=2" in capsys.readouterr().out
    assert (out / ".zgroup").exists()
