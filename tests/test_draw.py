"""Drawing smoke tests: every figure function renders and saves a PNG
(reference test strategy #4, auromat/test/draw_test.py:33-60)."""

import os

import numpy as np
import pytest

from auromat_tpu import draw
from auromat_tpu.draw_helpers import (
    create_polygons_and_colors,
    mlt_formatter,
    save_fig,
)
from auromat_tpu.mapping.mapping import MappingCollection
from auromat_tpu.mapping.spacecraft import get_mapping
from auromat_tpu.resample import resample

RES = os.path.join(os.path.dirname(__file__), "resources")


@pytest.fixture(scope="module")
def mapping():
    m = get_mapping(
        os.path.join(RES, "ISS030-E-102170_dc.jpg"),
        os.path.join(RES, "ISS030-E-102170_dc.wcs"),
        fast_center=True,
    )
    return m.maskedByElevation(10)


@pytest.fixture(scope="module")
def resampled(mapping):
    return resample(mapping, arcsec_per_px=300, method="mean")


class TestHelpers:
    def test_polygons(self, resampled):
        verts, colors, elev = create_polygons_and_colors(
            resampled.lats, resampled.lons, resampled.rgb, resampled.elevation
        )
        assert verts.shape[1:] == (4, 2)
        assert len(verts) == len(colors) == len(elev)
        assert not np.isnan(verts).any()
        assert colors.max() <= 1.0

    def test_mlt_formatter(self):
        assert mlt_formatter(13.5) == "13:30"
        assert mlt_formatter(0.25) == "00:15"


class TestFigures:
    def test_draw_plot(self, resampled, tmp_path):
        fig = draw.draw_plot(resampled)
        out = save_fig(str(tmp_path / "plot.png"), fig)
        assert os.path.getsize(out) > 5000

    def test_draw_stereographic(self, resampled, tmp_path):
        fig = draw.draw_stereographic(resampled)
        out = save_fig(str(tmp_path / "stereo.png"), fig)
        assert os.path.getsize(out) > 5000

    def test_draw_stereographic_collection(self, resampled, tmp_path):
        coll = MappingCollection([resampled], "test", mayOverlap=True)
        fig = draw.draw_stereographic(coll)
        save_fig(str(tmp_path / "stereo_coll.png"), fig)

    def test_draw_stereographic_mlatmlt(self, resampled, tmp_path):
        fig = draw.draw_stereographic_mlat_mlt(resampled)
        save_fig(str(tmp_path / "stereo_mag.png"), fig)

    def test_draw_mlat_mlt_polar(self, resampled, tmp_path):
        fig = draw.draw_mlat_mlt_polar(resampled)
        save_fig(str(tmp_path / "polar.png"), fig)

    def test_draw_kml(self, resampled, tmp_path):
        kml, png = draw.draw_kml_image(str(tmp_path / "overlay.kml"), resampled)
        assert os.path.exists(kml) and os.path.exists(png)
        text = open(kml).read()
        assert "GroundOverlay" in text
        assert "<north>" in text

    def test_draw_parallels_meridians(self, mapping, tmp_path):
        fig = draw.draw_parallels_meridians(mapping)
        save_fig(str(tmp_path / "grid.png"), fig)

    def test_draw_horizon(self, mapping, tmp_path):
        fig = draw.draw_horizon(mapping)
        save_fig(str(tmp_path / "horizon.png"), fig)

    def test_draw_ra_dec(self, mapping, tmp_path):
        fig = draw.draw_ra_dec(mapping)
        save_fig(str(tmp_path / "radec.png"), fig)

    def test_draw_pixel_scales(self, mapping, tmp_path):
        fig = draw.draw_astrometry_pixel_scales(mapping)
        save_fig(str(tmp_path / "scales.png"), fig)

    def test_draw_histogram(self, tmp_path):
        hist = np.exp(-((np.arange(256) - 40) / 30.0) ** 2)
        fig = draw.draw_histogram(hist, vlines=[(40, "red")], xlabel="Intensity")
        save_fig(str(tmp_path / "hist.png"), fig)

    def test_scanlines_coroutine(self, resampled, tmp_path):
        result = {}
        co = draw.draw_scanlines_co(result)
        for _ in range(5):
            co.send(resampled)
        co.close()
        assert "figure" in result
        save_fig(str(tmp_path / "keogram.png"), result["figure"])
        assert len(result["times"]) == 5
