"""ISS archive provider tests with a synthetic offline cache built around
the real checked-in frame (the reference's network tests are disabled for
the same reason, auromat/test/iss_provider_test.py:27)."""

import datetime
import json
import os
import shutil

import numpy as np
import pytest

from auromat_tpu.mapping.iss import ISSMappingProvider

RES = os.path.join(os.path.dirname(__file__), "resources")
KEY = "ISS030-E-102170"
DATE = datetime.datetime(2012, 1, 25, 9, 27, 8, 60000)


@pytest.fixture()
def cache(tmp_path):
    shutil.copy(os.path.join(RES, "ISS030-E-102170_dc.jpg"),
                tmp_path / f"{KEY}.jpg")
    shutil.copy(os.path.join(RES, "ISS030-E-102170_dc.wcs"),
                tmp_path / f"{KEY}.wcs")
    api = {
        "id": 77,
        "date_start": "2012-01-25T09:27:08.060000",
        "date_end": "2012-01-25T09:27:08.060000",
        "image_extension": ".jpg",
        "metadata_uri": "unused",
        "images": {KEY: {"date": "2012-01-25T09:27:08.060000",
                         "image_uri": "unused", "wcs_uri": "unused"}},
    }
    (tmp_path / "api.json").write_text(json.dumps(api))
    meta = {"sequence_metadata": {"Project": "THOR"},
            "image_metadata": {KEY: {"exposure": 1.0}}}
    (tmp_path / "metadata.json").write_text(json.dumps(meta))
    return str(tmp_path)


class TestISSProvider:
    @pytest.mark.slow
    def test_offline_get(self, cache):
        prov = ISSMappingProvider(cache, offline=True, fastCenterCalculation=True)
        t0, t1 = prov.range
        assert t0 == DATE
        assert prov.contains(DATE + datetime.timedelta(seconds=2))
        m = prov.get(DATE)
        assert m.identifier == KEY
        assert m.metadata["Project"] == "THOR"
        assert m.metadata["exposure"] == 1.0
        bb = m.boundingBox
        assert 47 < bb.latSouth < 49

    def test_get_by_id_and_sequence(self, cache):
        prov = ISSMappingProvider(cache, offline=True, fastCenterCalculation=True)
        m = prov.getById(KEY)
        assert m.identifier == KEY
        seq = list(prov.getSequence())
        assert len(seq) == 1

    def test_offline_without_cache_raises(self, tmp_path):
        with pytest.raises(RuntimeError, match="api.json"):
            ISSMappingProvider(str(tmp_path / "empty"), offline=True)

    def test_out_of_range_date(self, cache):
        prov = ISSMappingProvider(cache, offline=True)
        with pytest.raises(ValueError):
            prov.get(DATE + datetime.timedelta(hours=2))
