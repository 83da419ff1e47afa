"""CDF export -> re-import round trip (reference: auromat/test/export_cdf_test.py)."""

import numpy as np
import pytest

from auromat_tpu.export import cdf as export_cdf
from auromat_tpu.mapping.cdf import CDFMappingProvider, read_mapping

from test_mapping import synthetic_mapping


@pytest.fixture(scope="module", params=[True, False], ids=["tt2000", "epoch"])
def exported(request, tmp_path_factory):
    m = synthetic_mapping(n=20)
    path = tmp_path_factory.mktemp("cdf") / "synthetic.cdf"
    export_cdf.write(
        str(path), m, metadata={"Project": "auromat-tpu-test"},
        useTT2000=request.param,
    )
    return m, str(path)


class TestRoundTrip:
    def test_roundtrip(self, exported):
        m, path = exported
        m2 = read_mapping(path)
        assert abs((m2.photoTime - m.photoTime).total_seconds()) < 1e-3
        assert m2.altitude == pytest.approx(m.altitude)
        np.testing.assert_allclose(m2.cameraPosGCRS, m.cameraPosGCRS)
        assert np.array_equal(m2.center_mask, m.center_mask)
        assert np.array_equal(m2.corner_mask, m.corner_mask)
        ok = ~m.center_mask
        np.testing.assert_allclose(
            np.asarray(m2.latsCenter.filled(np.nan))[ok],
            np.asarray(m.latsCenter.filled(np.nan))[ok],
        )
        okc = ~m.corner_mask
        np.testing.assert_allclose(
            np.asarray(m2.lats.filled(np.nan))[okc],
            np.asarray(m.lats.filled(np.nan))[okc],
        )
        assert m2.img.dtype == m.img.dtype
        assert np.array_equal(m2.img.filled(0), m.img.filled(0))
        np.testing.assert_allclose(
            np.asarray(m2.elevation.filled(np.nan))[ok],
            np.asarray(m.elevation.filled(np.nan))[ok],
            atol=1e-5,
        )
        assert m2.metadata.get("Project") == "auromat-tpu-test"
        m2.checkGuarantees()

    def test_magnetic_coords_roundtrip(self, exported):
        m, path = exported
        m2 = read_mapping(path)
        mlat2, _ = m2.mLatMltCenter
        mlat, _ = m.mLatMltCenter
        ok = ~m.center_mask
        np.testing.assert_allclose(
            np.asarray(mlat2.filled(np.nan))[ok],
            np.asarray(mlat.filled(np.nan))[ok],
            atol=1e-9,
        )

    def test_provider(self, exported, tmp_path):
        import shutil

        m, path = exported
        shutil.copy(path, tmp_path / "frame1.cdf")
        prov = CDFMappingProvider(str(tmp_path))
        assert prov.contains(m.photoTime)
        m2 = prov.get(m.photoTime)
        assert m2.identifier == "frame1"
        assert prov.getById("frame1").altitude == pytest.approx(m.altitude)
        assert len(list(prov.getSequence())) == 1
        t0, t1 = prov.range
        assert abs((t0 - m.photoTime).total_seconds()) < 1e-3


class TestCompression:
    def test_gzip_cvvr_default_smaller_and_roundtrips(self, tmp_path):
        """Compressed CVVR is the write default (reference export/cdf.py
        uses GZIP; one uncompressed sequence is 172 GB, userguide:66-78)."""
        import os

        m = synthetic_mapping(n=96)
        pc = tmp_path / "c.cdf"
        pu = tmp_path / "u.cdf"
        export_cdf.write(str(pc), m)  # compress defaults to True
        export_cdf.write(str(pu), m, compress=False)
        assert os.path.getsize(pc) < 0.6 * os.path.getsize(pu), (
            os.path.getsize(pc), os.path.getsize(pu))
        m2 = read_mapping(str(pc))
        assert np.array_equal(m2.center_mask, m.center_mask)
        np.testing.assert_allclose(
            np.asarray(m2.latsCenter.filled(np.nan))[~m.center_mask],
            np.asarray(m.latsCenter.filled(np.nan))[~m.center_mask])


class TestNasaCompatibleCompression:
    def test_cpr_flags_and_gzip_stream(self, tmp_path):
        """Compressed variables must follow the NASA CDF convention so
        external readers work: VDR compression flag (bit 2) set,
        CPRorSPRoffset pointing at a GZIP CPR, and an RFC1952 gzip CVVR
        payload (an earlier version wrote raw zlib with no CPR — readable
        only by this module)."""
        import gzip
        import struct

        from auromat_tpu.io.cdflib import CDFWriter

        path = tmp_path / "c.cdf"
        data = (np.arange(4800).reshape(1, 60, 80) % 251).astype(np.uint8)
        with CDFWriter(str(path), compress=True) as w:
            w.new("img", data)
        raw = path.read_bytes()
        off, recs = 8, []
        while off < len(raw):
            size, rtype = struct.unpack(">qi", raw[off:off + 12])
            recs.append((off, size, rtype))
            off += size
        vdr = next(r for r in recs if r[2] == 8)  # zVDR
        p = vdr[0] + 12
        flags = struct.unpack(">i", raw[p + 32:p + 36])[0]
        assert flags & 4, "VDR compression bit not set"
        cpr_off = struct.unpack(">q", raw[p + 60:p + 68])[0]
        cpr = next(r for r in recs if r[0] == cpr_off)
        assert cpr[2] == 11  # CPR
        ctype, _, pcount, _ = struct.unpack(">iiii", raw[cpr[0] + 12:cpr[0] + 28])
        assert (ctype, pcount) == (5, 1)  # GZIP, one parameter
        cvvr = next(r for r in recs if r[2] == 13)
        _, csize = struct.unpack(">iq", raw[cvvr[0] + 12:cvvr[0] + 24])
        stream = raw[cvvr[0] + 24:cvvr[0] + 24 + csize]
        assert stream[:2] == b"\x1f\x8b"  # RFC1952 magic
        assert gzip.decompress(stream) == data.tobytes()

    def test_masked_integer_data_raises(self, tmp_path):
        from auromat_tpu.io.cdflib import CDFWriter

        arr = np.ma.masked_array(np.arange(6, dtype=np.uint8).reshape(1, 2, 3),
                                 mask=[[[0, 1, 0], [0, 0, 0]]])
        with CDFWriter(str(tmp_path / "m.cdf")) as w:
            with pytest.raises(ValueError, match="FILLVAL"):
                w.new("img", arr)
            w.new("ok", arr.filled(255))  # explicit fill is fine


def test_export_without_elevation(tmp_path):
    """Mappings with elevation=None (re-imported from files without
    zenith_angle) must export to CDF and NetCDF without crashing; the
    zenith_angle variable is simply skipped."""
    from auromat_tpu.export import netcdf as export_netcdf
    from auromat_tpu.io.cdflib import CDFReader

    m = synthetic_mapping(n=20)
    m._elevation = None  # as produced by mapping/cdf.py:62
    pc = tmp_path / "noelev.cdf"
    export_cdf.write(str(pc), m)
    r = CDFReader(str(pc))
    assert "zenith_angle" not in r
    assert "lat" in r
    pn = tmp_path / "noelev.nc"
    export_netcdf.write(str(pn), m)
    from auromat_tpu.io.nc4 import Nc4Reader

    with Nc4Reader(str(pn)) as nc:
        assert "zenith_angle" not in nc.variables
        assert "lat" in nc.variables
