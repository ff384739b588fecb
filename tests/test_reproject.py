"""Reprojection/regridding (pure-numpy UTM + align_to_grid).

Reference contract: /root/reference/utils/rasterio.py:158-201
(needs_reprojection + align_to_template via reproject_match). The
projection itself is pinned against independent numerics, not another
library (no pyproj in this image): the Krueger series must agree with a
directly integrated meridian arc, the map must be conformal, and the UTM
invariants (central meridian -> E=500 km at scale k0=0.9996) must hold.
"""
import numpy as np
import pytest

from forest_tpu.data import raster as rio
from forest_tpu.data import reproject as rp


# ------------------------------------------------------------ projection
def test_central_meridian_invariants():
    tm = rp.TransverseMercator(lon0_deg=-123.0)
    e, n = tm.forward(-123.0, 45.0)
    assert e == pytest.approx(500000.0, abs=1e-6)
    e0, n0 = tm.forward(-123.0, 0.0)
    assert n0 == pytest.approx(0.0, abs=1e-6)
    # symmetry about the central meridian
    e_w, n_w = tm.forward(-124.0, 45.0)
    e_e, n_e = tm.forward(-122.0, 45.0)
    assert e_w == pytest.approx(2 * 500000.0 - e_e, abs=1e-6)
    assert n_w == pytest.approx(n_e, abs=1e-6)


def test_meridian_arc_matches_numerical_integration():
    """N on the central meridian must equal k0 * integrated meridian
    distance — an independent check of the A-bar + alpha series."""
    tm = rp.TransverseMercator(lon0_deg=0.0)
    a, e2 = 6378137.0, 0.0066943799901413165
    for lat in (10.0, 33.3, 45.0, 60.0, 80.0):
        t = np.linspace(0.0, np.deg2rad(lat), 2_000_001)
        integrand = a * (1 - e2) / (1 - e2 * np.sin(t) ** 2) ** 1.5
        m = np.trapezoid(integrand, t)
        _, n = tm.forward(0.0, lat)
        assert n == pytest.approx(0.9996 * m, abs=2e-3), lat


def test_scale_at_central_meridian_is_k0():
    tm = rp.TransverseMercator(lon0_deg=0.0)
    lat = 40.0
    d = 1e-6  # degrees
    e1, n1 = tm.forward(0.0, lat - d / 2)
    e2_, n2 = tm.forward(0.0, lat + d / 2)
    # true meridian distance for the small arc
    a, e2 = 6378137.0, 0.0066943799901413165
    s = np.sin(np.deg2rad(lat))
    m_rho = a * (1 - e2) / (1 - e2 * s * s) ** 1.5
    true_len = m_rho * np.deg2rad(d)
    assert np.hypot(e2_ - e1, n2 - n1) / true_len == \
        pytest.approx(0.9996, abs=1e-7)  # finite-difference truncation


def test_conformality_numerical_jacobian():
    """A conformal map's Jacobian, measured in TRUE ground distances
    (east = nu*cos(lat) per radian of lon, north = rho per radian of
    lat), is a scaled rotation: equal singular values."""
    tm = rp.TransverseMercator(lon0_deg=-117.0)
    a, e2 = 6378137.0, 0.0066943799901413165
    for lon, lat in ((-114.2, 37.5), (-119.9, 52.0), (-116.0, 8.0)):
        d = 1e-7
        e_x1, n_x1 = tm.forward(lon + d, lat)
        e_x0, n_x0 = tm.forward(lon - d, lat)
        e_y1, n_y1 = tm.forward(lon, lat + d)
        e_y0, n_y0 = tm.forward(lon, lat - d)
        jac = np.array([[(e_x1 - e_x0), (e_y1 - e_y0)],
                        [(n_x1 - n_x0), (n_y1 - n_y0)]]) / (2 * d)
        s = np.sin(np.deg2rad(lat))
        w = 1.0 - e2 * s * s
        nu = a / np.sqrt(w)                 # prime vertical radius
        rho = a * (1.0 - e2) / w ** 1.5     # meridian radius
        jac[:, 0] /= nu * np.cos(np.deg2rad(lat))
        jac[:, 1] /= rho
        sv = np.linalg.svd(jac, compute_uv=False)
        assert sv[0] / sv[1] == pytest.approx(1.0, rel=1e-6), (lon, lat)


def test_roundtrip_in_zone():
    tm = rp.TransverseMercator(lon0_deg=-123.0)
    rng = np.random.default_rng(0)
    lon = -123.0 + rng.uniform(-2.8, 2.8, 256)
    lat = rng.uniform(-80.0, 80.0, 256)
    e, n = tm.forward(lon, lat)
    lon2, lat2 = tm.inverse(e, n)
    np.testing.assert_allclose(lon2, lon, atol=1e-11)
    np.testing.assert_allclose(lat2, lat, atol=1e-11)


def test_transform_coords_utm_roundtrip_and_epsg():
    assert rp.utm_zone_epsg(10, True) == 32610
    assert rp.utm_zone_epsg(19, False) == 32719
    with pytest.raises(ValueError):
        rp.utm_zone_epsg(61, True)
    x, y = rp.transform_coords(4326, 32610, -123.0, 45.0)
    assert x == pytest.approx(500000.0, abs=1e-6)  # zone 10 CM = -123
    lon, lat = rp.transform_coords(32610, 4326, x, y)
    assert (lon, lat) == (pytest.approx(-123.0, abs=1e-11),
                          pytest.approx(45.0, abs=1e-11))
    # southern hemisphere false northing
    _, n_s = rp.transform_coords(4326, 32710, -123.0, -1.0)
    assert n_s > 9_800_000
    # UTM -> UTM through geographic (zone 10 point seen from zone 11)
    x11, y11 = rp.transform_coords(32610, 32611, 500000.0, 4500000.0)
    lon11, lat11 = rp.transform_coords(32611, 4326, x11, y11)
    assert lon11 == pytest.approx(-123.0, abs=1e-9)
    with pytest.raises(ValueError, match="not WGS84/UTM"):
        rp.transform_coords(3857, 4326, 0.0, 0.0)


# ------------------------------------------------------------ regrid
def test_needs_reprojection():
    t = (0.0, 30.0, 300.0, -30.0)
    assert not rp.needs_reprojection(t, t)
    assert rp.needs_reprojection(t, (0.0, 30.0, 301.0, -30.0))
    assert rp.needs_reprojection(t, t, 32610, 4326)
    assert not rp.needs_reprojection(t, t, 32610, 32610)


def test_align_to_grid_identity_and_shift():
    src = np.arange(30, dtype=np.float64).reshape(5, 6)
    t = (0.0, 10.0, 100.0, -10.0)
    out = rp.align_to_grid(src, t, t, (5, 6), resampling="nearest")
    np.testing.assert_array_equal(out, src)
    # shifted just over half a pixel east -> nearest snaps one col east
    t2 = (5.1, 10.0, 100.0, -10.0)
    out = rp.align_to_grid(src, t, t2, (5, 6), resampling="nearest")
    np.testing.assert_array_equal(out[:, :5], src[:, 1:])
    assert np.isnan(out[:, 5]).all()


def test_align_to_grid_bilinear_downsample():
    """2x downsample of a linear ramp is exact under bilinear."""
    H, W = 8, 10
    rr, cc = np.meshgrid(np.arange(H), np.arange(W), indexing="ij")
    src = (2.0 * rr + 3.0 * cc).astype(np.float64)
    t_src = (0.0, 10.0, 0.0, -10.0)
    t_dst = (0.0, 20.0, 0.0, -20.0)
    out = rp.align_to_grid(src, t_src, t_dst, (4, 5),
                           resampling="bilinear")
    rr2, cc2 = np.meshgrid(np.arange(4), np.arange(5), indexing="ij")
    # dst pixel centers land at src pixel coords (2r+0.5, 2c+0.5)
    expect = 2.0 * (2 * rr2 + 0.5) + 3.0 * (2 * cc2 + 0.5)
    valid = np.isfinite(out)
    assert valid[:3, :4].all()
    np.testing.assert_allclose(out[valid],
                               expect[valid], atol=1e-12)


def test_align_to_grid_nodata_and_bounds():
    src = np.ones((4, 4))
    src[1, 1] = -9.0
    t = (0.0, 10.0, 0.0, -10.0)
    big = rp.align_to_grid(src, t, (-10.0, 10.0, 10.0, -10.0), (6, 6),
                           resampling="nearest", nodata=-9.0)
    assert np.isnan(big[0]).all() and np.isnan(big[:, 0]).all()
    assert np.isnan(big[2, 2])          # the nodata pixel
    assert big[1, 1] == 1.0


def test_align_to_grid_cross_crs():
    """A UTM source sampled from a geographic grid: constant field stays
    constant, and a UTM-easting ramp maps to monotone longitude."""
    H, W = 40, 40
    src = np.tile(np.arange(W, dtype=np.float64), (H, 1))  # ramp in x
    # zone 10 source at 30 m around (500 km, 4.5 Mm) ~ (-123, 40.65)
    t_src = (500000.0 - 20 * 30.0, 30.0, 4500000.0 + 20 * 30.0, -30.0)
    # a 20x20 geographic window centered on the source (well inside it)
    lon_c, lat_c = rp.transform_coords(32610, 4326, 500000.0, 4500000.0)
    ddx, ddy = 0.0002, -0.00015
    t_dst = (lon_c - 10 * ddx, ddx, lat_c - 10 * ddy, ddy)
    out = rp.align_to_grid(src, t_src, t_dst, (20, 20),
                           src_epsg=32610, dst_epsg=4326,
                           resampling="bilinear")
    assert np.isfinite(out).all()
    assert (np.diff(out, axis=1) > 0).all()     # monotone with lon
    # rows at constant lat vary little in easting-gradient direction
    assert out.min() >= 0 and out.max() <= W - 1


def test_align_raster_to_passthrough_and_epsg_roundtrip(tmp_path):
    data = np.random.default_rng(1).normal(size=(6, 6)).astype(np.float32)
    t = (0.0, 30.0, 300.0, -30.0)
    rio.write_geotiff(tmp_path / "a.tif", data, transform=t, epsg=32610)
    r = rio.read_geotiff(tmp_path / "a.tif")
    assert r.epsg == 32610
    out = rp.align_raster_to(r, t, (6, 6), dst_epsg=32610)
    np.testing.assert_allclose(out, data, atol=1e-7)   # passthrough
    # geographic epsg tag roundtrip
    rio.write_geotiff(tmp_path / "b.tif", data,
                      transform=(-123.0, 1e-4, 45.0, -1e-4), epsg=4326)
    assert rio.read_geotiff(tmp_path / "b.tif").epsg == 4326


def test_builder_resample_band(tmp_path):
    """A misaligned GeoTIFF band with `resample:` regrids onto the cube
    grid instead of being rejected; without it the builder still rejects."""
    from forest_tpu.data.zarr_builder import build_cube

    h = w = 8
    t_grid = (0.0, 30.0, 240.0, -30.0)
    anchor = np.arange(h * w, dtype=np.float32).reshape(h, w)
    rio.write_geotiff(tmp_path / "anchor.tif", anchor, transform=t_grid)
    # 15 m source covering the same extent (2x finer, 16x16)
    fine = np.repeat(np.repeat(anchor, 2, 0), 2, 1)
    rio.write_geotiff(tmp_path / "fine.tif", fine,
                      transform=(0.0, 15.0, 240.0, -15.0))
    spec = {
        "output": "cube.zarr",
        "spatial": {"height": h, "width": w, "chunk_y": 8, "chunk_x": 8},
        "groups": [{
            "name": "g", "kind": "static", "dtype": "float32",
            "bands": [
                {"name": "anchor", "source": "anchor.tif"},
                {"name": "fine", "source": "fine.tif",
                 "resample": "nearest"},
            ]}],
    }
    root = build_cube(spec, tmp_path)
    out = root["static/g/data/fine"][:]
    np.testing.assert_allclose(out, anchor, atol=1e-6)
    assert root.attrs["geo_transform"] == list(t_grid)

    # same spec without resample -> alignment rejection
    spec2 = {**spec, "output": "cube2.zarr"}
    spec2["groups"] = [{**spec["groups"][0], "bands": [
        {"name": "anchor", "source": "anchor.tif"},
        {"name": "fine", "source": "fine.tif"},
    ]}]
    with pytest.raises(ValueError, match="pre-aligned|grid"):
        build_cube(spec2, tmp_path)

    # bad resample mode is a validation error
    spec3 = {**spec, "output": "cube3.zarr"}
    spec3["groups"] = [{**spec["groups"][0], "bands": [
        {"name": "fine", "source": "fine.tif", "resample": "cubic"}]}]
    with pytest.raises(ValueError, match="resample"):
        build_cube(spec3, tmp_path)


def test_bilinear_exact_edge_landing():
    """Identity regrid under bilinear keeps the last row/col (exact
    landings on the data-support boundary must not NaN out)."""
    src = np.arange(20, dtype=np.float64).reshape(4, 5)
    t = (0.0, 10.0, 100.0, -10.0)
    out = rp.align_to_grid(src, t, t, (4, 5), resampling="bilinear")
    assert np.isfinite(out).all()
    np.testing.assert_allclose(out, src, atol=1e-12)


def test_degree_meter_mixup_guard():
    """Same-CRS fallback with a >1000x pixel-size ratio (a degrees grid
    sampled onto a meters grid with missing EPSG tags) raises instead of
    silently writing a NaN band."""
    src = np.ones((4, 4))
    t_deg = (-123.0, 1e-4, 45.0, -1e-4)
    t_m = (500000.0, 30.0, 4500000.0, -30.0)
    with pytest.raises(ValueError, match="degrees/meters"):
        rp.align_to_grid(src, t_deg, t_m, (4, 4), src_epsg=4326,
                         resampling="nearest")
    # both tagged -> transforms apply, no guard
    out = rp.align_to_grid(src, t_deg, t_m, (4, 4), src_epsg=4326,
                           dst_epsg=32610, resampling="nearest")
    assert out.shape == (4, 4)


def test_builder_resample_band_order_independent(tmp_path):
    """A resample band listed BEFORE the aligned anchor still regrids
    onto the anchor grid (the target grid is prescanned, never the
    misaligned source's own grid)."""
    from forest_tpu.data.zarr_builder import build_cube

    h = w = 8
    t_grid = (0.0, 30.0, 240.0, -30.0)
    anchor = np.arange(h * w, dtype=np.float32).reshape(h, w)
    rio.write_geotiff(tmp_path / "anchor.tif", anchor, transform=t_grid)
    fine = np.repeat(np.repeat(anchor, 2, 0), 2, 1)
    rio.write_geotiff(tmp_path / "fine.tif", fine,
                      transform=(0.0, 15.0, 240.0, -15.0))
    spec = {
        "output": "cube_rev.zarr",
        "spatial": {"height": h, "width": w, "chunk_y": 8, "chunk_x": 8},
        "groups": [{
            "name": "g", "kind": "static", "dtype": "float32",
            "bands": [
                {"name": "fine", "source": "fine.tif",
                 "resample": "nearest"},          # before the anchor
                {"name": "anchor", "source": "anchor.tif"},
            ]}],
    }
    root = build_cube(spec, tmp_path)
    np.testing.assert_allclose(root["static/g/data/fine"][:], anchor,
                               atol=1e-6)

    # no anchor at all and no spec geo_transform -> explicit error
    spec2 = {"output": "cube_noanchor.zarr",
             "spatial": {"height": h, "width": w,
                         "chunk_y": 8, "chunk_x": 8},
             "groups": [{"name": "g", "kind": "static",
                         "dtype": "float32",
                         "bands": [{"name": "fine", "source": "fine.tif",
                                    "resample": "nearest"}]}]}
    with pytest.raises(ValueError, match="no target grid"):
        build_cube(spec2, tmp_path)


def test_malformed_geokey_directory_ignored(tmp_path):
    """A truncated GeoKeyDirectory tag reads as epsg=None, not a crash."""
    from PIL import Image, TiffImagePlugin

    data = np.zeros((4, 4), np.float32)
    im = Image.fromarray(data, mode="F")
    ifd = TiffImagePlugin.ImageFileDirectory_v2()
    ifd[34735] = (1, 1)  # fewer than the 4-short header
    ifd.tagtype[34735] = TiffImagePlugin.TiffTags.SHORT
    im.save(tmp_path / "bad.tif", tiffinfo=ifd)
    r = rio.read_geotiff(tmp_path / "bad.tif")
    assert r.epsg is None

    ifd2 = TiffImagePlugin.ImageFileDirectory_v2()
    ifd2[34735] = (1, 1, 0, 2, 1024, 0, 1)  # cut mid-entry
    ifd2.tagtype[34735] = TiffImagePlugin.TiffTags.SHORT
    im.save(tmp_path / "bad2.tif", tiffinfo=ifd2)
    assert rio.read_geotiff(tmp_path / "bad2.tif").epsg is None
