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
