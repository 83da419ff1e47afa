"""netCDF export -> re-import round trip (reference test strategy #4,
auromat/test/export_netcdf_test.py)."""

import os

import numpy as np
import pytest

from auromat_tpu.export import netcdf as export_netcdf
from auromat_tpu.mapping.netcdf import NetCDFMappingProvider, read_mapping
from auromat_tpu.resample import resample

from test_mapping import synthetic_mapping


@pytest.fixture(scope="module")
def curvilinear(tmp_path_factory):
    m = synthetic_mapping(n=24)
    path = tmp_path_factory.mktemp("nc") / "synthetic.nc"
    export_netcdf.write(str(path), m, metadata={"Project": "auromat-tpu-test"})
    return m, str(path)


@pytest.fixture(scope="module")
def plate_carree(tmp_path_factory):
    m = resample(synthetic_mapping(n=24, hole=True), px_per_deg=2, method="mean")
    path = tmp_path_factory.mktemp("ncpc") / "resampled.nc"
    export_netcdf.write(str(path), m)
    return m, str(path)


class TestRoundTrip:
    def test_curvilinear_roundtrip(self, curvilinear):
        m, path = curvilinear
        m2 = read_mapping(path)
        assert m2.photoTime == m.photoTime
        assert m2.altitude == pytest.approx(m.altitude, abs=1e-3)
        np.testing.assert_allclose(m2.cameraPosGCRS, m.cameraPosGCRS)
        # masks and data
        assert np.array_equal(m2.center_mask, m.center_mask)
        a, b = m2.latsCenter.filled(np.nan), m.latsCenter.filled(np.nan)
        np.testing.assert_allclose(a[~m.center_mask], b[~m.center_mask])
        img_a, img_b = m2.img, m.img
        assert img_a.dtype == img_b.dtype
        assert np.array_equal(
            np.asarray(img_a.filled(0)), np.asarray(img_b.filled(0))
        )
        # zenith angle -> elevation
        e_a = m2.elevation.filled(np.nan)
        e_b = m.elevation.filled(np.nan)
        np.testing.assert_allclose(
            e_a[~m.center_mask], e_b[~m.center_mask], atol=1e-5
        )
        assert m2.metadata.get("Project") == "auromat-tpu-test"
        m2.checkGuarantees()

    def test_curvilinear_mlat_preserved(self, curvilinear):
        m, path = curvilinear
        m2 = read_mapping(path)
        mlat2, mlt2 = m2.mLatMltCenter
        mlat, mlt = m.mLatMltCenter
        ok = ~m.center_mask
        np.testing.assert_allclose(
            np.asarray(mlat2.filled(np.nan))[ok], np.asarray(mlat.filled(np.nan))[ok],
            atol=1e-9,
        )

    def test_plate_carree_1d_coords(self, plate_carree):
        m, path = plate_carree
        from auromat_tpu.mapping.netcdf import _open_nc

        with _open_nc(path) as f:
            assert f.variables["lat"][:].ndim == 1
            assert "lat_bounds" in f.variables
            assert f.variables["lat_bounds"][:].shape[1] == 2
        m2 = read_mapping(path)
        m2.checkPlateCarree()
        assert np.array_equal(m2.center_mask, m.center_mask)
        np.testing.assert_allclose(
            np.asarray(m2.lats.data), np.asarray(m.lats.data), atol=1e-12
        )

    def test_netcdf4_container_and_compression(self, plate_carree, tmp_path):
        """Default output is NetCDF-4/HDF5 with zlib; on realistically sized
        mappings it is much smaller than classic (HDF5 metadata overhead
        dominates only for tiny test grids)."""
        from auromat_tpu.io.nc4 import is_hdf5

        m, path = plate_carree
        assert is_hdf5(path)
        p3 = tmp_path / "classic.nc"
        export_netcdf.write(str(p3), m, format="NETCDF3")
        assert not is_hdf5(str(p3))
        # classic round-trips through the same reader
        m3 = read_mapping(str(p3))
        assert np.array_equal(m3.center_mask, m.center_mask)

        big = synthetic_mapping(n=96)
        p4 = tmp_path / "big4.nc"
        pc = tmp_path / "bigc.nc"
        export_netcdf.write(str(p4), big)
        export_netcdf.write(str(pc), big, format="NETCDF3")
        assert os.path.getsize(p4) < 0.5 * os.path.getsize(pc), (
            os.path.getsize(p4), os.path.getsize(pc))

    def test_compress_false_writes_no_filter(self, curvilinear, tmp_path):
        import h5py

        m, _ = curvilinear
        p = tmp_path / "nofilter.nc"
        export_netcdf.write(str(p), m, compress=False)
        with h5py.File(p, "r") as f:
            assert f["lat"].compression is None
            assert not f["lat"].shuffle

    def test_netcdf4_dimension_scales(self, curvilinear):
        """Dims are written as netCDF-4 dimension scales (h5 interop)."""
        import h5py

        _, path = curvilinear
        with h5py.File(path, "r") as f:
            assert f["img_red"].dims[0][0] is not None  # scale attached
            assert f["y"].attrs["NAME"].startswith(
                b"This is a netCDF dimension")
            # small int16 images fall below the compress threshold; f64 grids compress
            assert f["lat"].compression == "gzip"

    def test_provider(self, plate_carree, tmp_path):
        m, path = plate_carree
        import shutil

        shutil.copy(path, tmp_path / "a.nc")
        prov = NetCDFMappingProvider(str(tmp_path))
        t0, t1 = prov.range
        assert t0 == m.photoTime
        assert prov.contains(m.photoTime)
        m2 = prov.get(m.photoTime)
        assert m2.identifier == "a"
        assert len(list(prov.getSequence())) == 1

    def test_plate_carree_cf_coordinate_variables(self, plate_carree):
        """Plate-carree output uses CF coordinate variables: the dims share
        the 1-D coordinate variables' names so tooling auto-associates
        img(lat, lon) with the coordinates."""
        import h5py

        _, path = plate_carree
        with h5py.File(path, "r") as f:
            assert f["img_red"].dims[0][0].name == "/lat"
            assert f["img_red"].dims[1][0].name == "/lon"
            # the coordinate variable IS the dimension scale (no phony name)
            assert f["lat"].attrs["NAME"] == b"lat" or \
                f["lat"].attrs["NAME"] == "lat"


def test_almost_fully_masked_image_exports(tmp_path):
    """Aggressively masked frames (single valid pixel) must still export
    and round-trip. (A FULLY masked mapping is unconstructible through
    the supported flows — maskedByElevation refuses it and the outline of
    an empty footprint is undefined — but the exporters still guard the
    actual_range attributes against ma.masked extrema as defense.)"""
    m = synthetic_mapping(n=12)
    keep = (0, 8)  # a center whose 4 corners are valid in the synthetic frame
    m._center_mask_arr[:] = True
    m._center_mask_arr[keep] = False
    m._img[keep] = 200  # nonzero: the fill value must not masquerade as data
    path = tmp_path / "onemask.nc"
    export_netcdf.write(str(path), m)
    m2 = read_mapping(str(path))
    got = np.ma.getmaskarray(m2.img)
    assert not got[keep].any()
    assert (~got.any(axis=-1)).sum() == 1
