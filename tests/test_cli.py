"""CLI end-to-end test: convert a spacecraft folder to CDF and netCDF."""

import os
import shutil

import pytest

from auromat_tpu.cli import convert, download


@pytest.fixture()
def spacecraft_folder(tmp_path):
    res = os.path.join(os.path.dirname(__file__), "resources")
    d = tmp_path / "data"
    d.mkdir()
    shutil.copy(os.path.join(res, "ISS030-E-102170_dc.jpg"), d)
    shutil.copy(os.path.join(res, "ISS030-E-102170_dc.wcs"), d)
    return str(d)


class TestConvert:
    def test_detect_source_type(self, spacecraft_folder, tmp_path):
        assert convert.detect_source_type(spacecraft_folder) == "spacecraft"
        (tmp_path / "api.json").write_text("{}")
        assert convert.detect_source_type(str(tmp_path)) == "iss"

    def test_convert_spacecraft_to_cdf(self, spacecraft_folder, tmp_path):
        out = tmp_path / "out"
        rc = convert.main([
            spacecraft_folder, "--grid", "geo", "--arcsecperpx", "600",
            "--min-elevation", "10", "--format", "cdf", "--out", str(out),
        ])
        assert rc == 0
        files = os.listdir(out)
        assert "ISS030-E-102170_dc.cdf" in files
        # re-import what the CLI wrote
        from auromat_tpu.mapping.cdf import read_mapping

        m = read_mapping(str(out / "ISS030-E-102170_dc.cdf"))
        m.checkPlateCarree()

        # skip-if-exists
        rc = convert.main([
            spacecraft_folder, "--grid", "geo", "--arcsecperpx", "600",
            "--min-elevation", "10", "--format", "cdf", "--out", str(out),
        ])
        assert rc == 0

    def test_convert_to_netcdf(self, spacecraft_folder, tmp_path):
        out = tmp_path / "out"
        rc = convert.main([
            spacecraft_folder, "--grid", "mag", "--arcsecperpx", "600",
            "--min-elevation", "10", "--format", "netcdf", "--out", str(out),
        ])
        assert rc == 0
        from auromat_tpu.mapping.netcdf import read_mapping

        m = read_mapping(str(out / "ISS030-E-102170_dc.nc"))
        assert m.img.shape[2] == 3


class TestDownloadParser:
    def test_parser(self):
        p = download.build_parser()
        args = p.parse_args(["esa-iss", "/tmp/x", "--id", "77"])
        assert args.provider == "esa-iss" and args.id == 77
        args = p.parse_args(["themis", "/tmp/x", "--start", "2012-02-04",
                             "--end", "2012-02-05"])
        assert args.provider == "themis"
