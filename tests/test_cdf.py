"""Pure-python CDF v3 writer/reader roundtrip tests."""

from datetime import datetime

import numpy as np
import pytest

from auromat_tpu.io.cdflib import (
    CDF_CHAR,
    CDF_TIME_TT2000,
    CDFReader,
    CDFWriter,
    datetime_to_epoch,
    datetime_to_tt2000,
    epoch_to_datetime,
    tt2000_to_datetime,
)


class TestTimeConversions:
    def test_epoch_roundtrip(self):
        t = datetime(2012, 1, 25, 9, 27, 8, 60000)
        assert abs((epoch_to_datetime(datetime_to_epoch(t)) - t).total_seconds()) < 1e-5

    def test_epoch_known_value(self):
        # CDF_EPOCH of 2000-01-01T00:00:00 is 63113904000000.0 ms
        assert datetime_to_epoch(datetime(2000, 1, 1)) == 63113904000000.0

    def test_tt2000_roundtrip(self):
        for t in (datetime(2012, 1, 25, 9, 27, 8, 60000), datetime(2016, 6, 1)):
            back = tt2000_to_datetime(datetime_to_tt2000(t))
            assert abs((back - t).total_seconds()) < 1e-5

    def test_tt2000_known_value(self):
        # J2000 epoch itself: 2000-01-01T12:00:00 UTC ->
        # TT-UTC = 32 leap + 32.184 = 64.184 s
        ns = datetime_to_tt2000(datetime(2000, 1, 1, 12))
        assert ns == int(64.184 * 1e9)


@pytest.fixture(params=[False, True], ids=["raw", "gzip"])
def roundtrip_file(request, tmp_path):
    path = str(tmp_path / "test.cdf")
    rng = np.random.default_rng(0)
    lat = rng.random((1, 12, 17)) * 90
    img = (rng.random((1, 12, 17)) * 255).astype(np.int16)
    u8 = (rng.random((12, 17)) * 255).astype(np.uint8)
    with CDFWriter(path, compress=request.param) as cdf:
        cdf.attrs["Project"] = "auromat-tpu"
        cdf.attrs["geospatial_lat_min"] = 47.25
        cdf.attrs["count"] = 42
        cdf.new("Epoch", [datetime(2012, 1, 25, 9, 27, 8, 60000)])
        cdf.new("lat", lat)
        cdf.new("img_red", img)
        cdf.new("altitude", np.float64(110000.0), rec_vary=False)
        cdf.new("camera_pos", np.array([[1.5, -2.5, 3.5]]))
        cdf.new("u8grid", u8[None, ...])
        cdf.new("station", np.array(["GILL"]))
        cdf.var_attrs("lat", UNITS="degrees", VALIDMIN=-90.0, VALIDMAX=90.0,
                      FIELDNAM="Latitude of pixel center")
        cdf.var_attrs("img_red", FILLVAL=-32768, VAR_TYPE="data")
    return path, lat, img, u8


class TestRoundTrip:
    def test_variables(self, roundtrip_file):
        path, lat, img, u8 = roundtrip_file
        cdf = CDFReader(path)
        assert set(cdf.variables) == {
            "Epoch", "lat", "img_red", "altitude", "camera_pos", "u8grid", "station"
        }
        np.testing.assert_allclose(cdf["lat"][:], lat)
        assert cdf["lat"].data.dtype == np.float64
        np.testing.assert_array_equal(cdf["img_red"][:], img)
        assert cdf["img_red"].data.dtype == np.int16
        np.testing.assert_array_equal(cdf["u8grid"][0], u8)
        assert cdf["u8grid"].data.dtype == np.uint8
        assert float(cdf["altitude"].data) == 110000.0
        assert not cdf["altitude"].rec_vary
        np.testing.assert_allclose(cdf["camera_pos"][0], [1.5, -2.5, 3.5])
        assert cdf["station"][0] == b"GILL"

    def test_epoch(self, roundtrip_file):
        path, *_ = roundtrip_file
        cdf = CDFReader(path)
        t = epoch_to_datetime(float(cdf["Epoch"][0]))
        assert abs((t - datetime(2012, 1, 25, 9, 27, 8, 60000)).total_seconds()) < 1e-5

    def test_global_attrs(self, roundtrip_file):
        path, *_ = roundtrip_file
        cdf = CDFReader(path)
        assert cdf.attrs["Project"] == "auromat-tpu"
        assert cdf.attrs["geospatial_lat_min"] == 47.25
        assert cdf.attrs["count"] == 42

    def test_var_attrs(self, roundtrip_file):
        path, *_ = roundtrip_file
        cdf = CDFReader(path)
        assert cdf["lat"].attrs["UNITS"] == "degrees"
        assert cdf["lat"].attrs["VALIDMIN"] == -90.0
        assert cdf["lat"].attrs["FIELDNAM"] == "Latitude of pixel center"
        assert cdf["img_red"].attrs["FILLVAL"] == -32768
        assert cdf["img_red"].attrs["VAR_TYPE"] == "data"
        assert "UNITS" not in cdf["img_red"].attrs


class TestTT2000Variable:
    def test_tt2000(self, tmp_path):
        path = str(tmp_path / "t.cdf")
        t = datetime(2012, 1, 25, 9, 27, 8)
        with CDFWriter(path) as cdf:
            cdf.new("Epoch", [t], cdf_type=CDF_TIME_TT2000)
        cdf = CDFReader(path)
        back = tt2000_to_datetime(int(cdf["Epoch"][0]))
        assert abs((back - t).total_seconds()) < 1e-6


class TestMultiRecord:
    def test_multiple_records(self, tmp_path):
        path = str(tmp_path / "m.cdf")
        data = np.arange(5 * 4 * 3, dtype=np.float32).reshape(5, 4, 3)
        with CDFWriter(path) as cdf:
            cdf.new("v", data)
        cdf = CDFReader(path)
        np.testing.assert_array_equal(cdf["v"][:], data)
        assert cdf["v"].shape == (5, 4, 3)


class TestColumnMajor:
    def test_column_major_roundtrip(self, tmp_path):
        """IDL-written CDFs (the real THEMIS archive) are COLUMN major:
        record elements are Fortran-ordered and the CDR flags bit 0 is
        clear. The reader must un-transpose them."""
        rng = np.random.default_rng(5)
        arr = rng.random((3, 4, 5, 2)).astype(np.float32)
        p = str(tmp_path / "colmajor.cdf")
        with CDFWriter(p, majority="column") as cdf:
            cdf.new("grid", arr)
        r = CDFReader(p)
        assert not r.row_major
        np.testing.assert_array_equal(np.asarray(r["grid"].data), arr)
        # and the row-major default still round-trips
        p2 = str(tmp_path / "rowmajor.cdf")
        with CDFWriter(p2) as cdf:
            cdf.new("grid", arr)
        r2 = CDFReader(p2)
        assert r2.row_major
        np.testing.assert_array_equal(np.asarray(r2["grid"].data), arr)
