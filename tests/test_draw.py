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


class TestAstrometryDiagnostics:
    def test_draw_reference_stars(self, tmp_path):
        rng = np.random.default_rng(0)
        img = rng.integers(0, 255, (100, 150), dtype=np.uint8)
        xy1 = (rng.uniform(0, 150, 20), rng.uniform(0, 100, 20))
        xy2 = (rng.uniform(0, 150, 10), rng.uniform(0, 100, 10))
        fig = draw.draw_reference_stars(img, [xy1, xy2])
        save_fig(str(tmp_path / "refstars.png"), fig)
        assert (tmp_path / "refstars.png").stat().st_size > 0

    def test_draw_indx_plot(self, tmp_path):
        quad = np.array([[10.0, 10.0], [100.0, 20.0], [90.0, 80.0], [20.0, 70.0]])
        fig = draw.draw_indx_plot(np.zeros((100, 120)), quad)
        save_fig(str(tmp_path / "indx.png"), fig)
        assert (tmp_path / "indx.png").stat().st_size > 0

    def test_draw_corr_plot(self, tmp_path):
        rng = np.random.default_rng(1)
        fx = rng.uniform(1, 150, 15); fy = rng.uniform(1, 100, 15)
        corr = (fx, fy, fx + rng.normal(0, 1, 15), fy + rng.normal(0, 1, 15))
        fig = draw.draw_corr_plot(corr)
        save_fig(str(tmp_path / "corr.png"), fig)
        assert (tmp_path / "corr.png").stat().st_size > 0

    def test_draw_constellations(self, mapping, tmp_path):
        # one synthetic "constellation" near the frame's pointing center
        from auromat_tpu.coordinates.wcs import TanWcs, tan_pix2world
        from auromat_tpu.io import fits
        wcs = TanWcs(fits.read_header(
            os.path.join(RES, "ISS030-E-102170_dc.wcs")))
        ra0, dec0 = (float(np.asarray(v)) for v in
                     tan_pix2world(wcs, np.array(2128.0), np.array(1416.0)))
        data = {"Test": [((ra0 - 2, dec0 - 2), (ra0 + 2, dec0 + 2)),
                         ((ra0 + 2, dec0 + 2), (ra0 + 2, dec0 - 2))]}
        fig = draw.draw_constellations(wcs, data)
        save_fig(str(tmp_path / "constellations.png"), fig)
        assert (tmp_path / "constellations.png").stat().st_size > 0

    def test_draw_heatmap(self, tmp_path):
        rng = np.random.default_rng(2)
        lats = rng.uniform(50, 60, 5000); lons = rng.uniform(-110, -90, 5000)
        lats[::7] = np.nan
        fig = draw.draw_heatmap(lats, lons, bins=30)
        save_fig(str(tmp_path / "heat.png"), fig)
        assert (tmp_path / "heat.png").stat().st_size > 0

    def test_draw_distortion_displacement(self, tmp_path):
        fig = draw.draw_distortion_displacement(
            (200, 300), "ptlens", (0.05, -0.02, 0.01))
        save_fig(str(tmp_path / "dist.png"), fig)
        assert (tmp_path / "dist.png").stat().st_size > 0
