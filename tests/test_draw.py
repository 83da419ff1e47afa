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

    def test_draw_stereographic_fixed_bounding_box(self, resampled):
        """bounding_box fixes the map extent independent of the data — the
        movie recipe (reference drawStereographic's boundingBox kwarg)."""
        from auromat_tpu.mapping.mapping import BoundingBox

        bb = resampled.boundingBox
        wide = BoundingBox(latSouth=bb.latSouth - 10, lonWest=bb.lonWest - 10,
                           latNorth=bb.latNorth + 10, lonEast=bb.lonEast + 10)
        fig_own = draw.draw_stereographic(resampled)
        fig_fix = draw.draw_stereographic(resampled, bounding_box=wide)
        xl_own = np.diff(fig_own.axes[0].get_xlim())[0]
        xl_fix = np.diff(fig_fix.axes[0].get_xlim())[0]
        assert xl_fix > xl_own * 1.2  # wider box -> wider map
        # and the SAME box gives the SAME extent regardless of the data
        fig_fix2 = draw.draw_stereographic(
            MappingCollection([resampled], "t", mayOverlap=True),
            bounding_box=wide)
        assert fig_fix2.axes[0].get_xlim() == fig_fix.axes[0].get_xlim()

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


class TestSequenceDiagnostics:
    """The reference's sequence-overview plots (draw.py:589-1935)."""

    def _fake_props(self, n=5):
        from datetime import datetime, timedelta

        from auromat_tpu.mapping.mapping import (BoundingBox,
                                                 MappingProperties)
        from auromat_tpu.coordinates.geodesic import Location

        t0 = datetime(2012, 1, 25, 9, 27, 0)
        props = []
        for i in range(n):
            lat, lon = 50.0 + 0.5 * i, -100.0 + 0.8 * i
            bb = BoundingBox(latSouth=lat - 2, lonWest=lon - 3,
                             latNorth=lat + 2, lonEast=lon + 3)
            props.append(MappingProperties(
                altitude=110.0, cameraPosGCRS=np.zeros(3), boundingBox=bb,
                photoTime=t0 + timedelta(seconds=6 * i),
                centroid=Location(lat, lon),
                cameraFootpoint=Location(lat - 3.0, lon - 1.0),
                identifier=f"f{i}",
            ))
        return props

    def test_line_plot_datetime_axis(self, tmp_path):
        from datetime import datetime, timedelta

        t0 = datetime(2012, 1, 25, 9, 27, 0)
        xs = [t0 + timedelta(seconds=6 * i) for i in range(10)]
        fig, ax = draw.draw_line_plot(xs, np.arange(10.0), "Time", "v")
        save_fig(str(tmp_path / "line.png"), fig)
        assert (tmp_path / "line.png").stat().st_size > 0

    def test_corr_seq_plot(self, tmp_path):
        from auromat_tpu.io.fits import write_bintable

        rng = np.random.default_rng(2)
        paths = []
        for i in range(4):
            n = 12
            fx = rng.uniform(0, 4000, n)
            fy = rng.uniform(0, 2800, n)
            cols = {"field_x": fx, "field_y": fy,
                    "index_x": fx + rng.normal(0, 0.5, n),
                    "index_y": fy + rng.normal(0, 0.5, n)}
            p = str(tmp_path / f"{i}.corr")
            write_bintable(p, cols)
            paths.append(p)
        fig, ax = draw.draw_corr_seq_plot(paths)
        save_fig(str(tmp_path / "corrseq.png"), fig)
        assert (tmp_path / "corrseq.png").stat().st_size > 0

    def test_wcs_sequence_plots(self, tmp_path):
        from datetime import datetime, timedelta

        from auromat_tpu.io import fits

        h = fits.read_header(os.path.join(RES, "ISS030-E-102170_dc.wcs"))
        headers = [h] * 4
        x = [datetime(2012, 1, 25) + timedelta(seconds=6 * i)
             for i in range(4)]
        for name, fn in [
            ("rot", lambda: draw.draw_astrometry_rotation_angles(headers, x)),
            ("cd", lambda: draw.draw_cd11_cd21(headers)),
            ("radec", lambda: draw.draw_ra_dec_seq(headers)),
            ("ra", lambda: draw.draw_right_ascension(headers, x)),
            ("dec", lambda: draw.draw_declination(headers, x)),
        ]:
            fig, ax = fn()
            save_fig(str(tmp_path / f"{name}.png"), fig)
            assert (tmp_path / f"{name}.png").stat().st_size > 0

    def test_rotation_angle_wrap(self):
        # headers straddling the +-180 rotation discontinuity get wrapped
        from auromat_tpu.io.fits import FitsHeader

        def mk(angle_deg, scale=0.01):
            a = np.deg2rad(angle_deg)
            h = FitsHeader()
            h["CD1_1"] = scale * np.cos(a)
            h["CD2_1"] = scale * np.sin(a)
            h["CD1_2"] = -scale * np.sin(a)
            h["CD2_2"] = scale * np.cos(a)
            h["DATE-OBS"] = "2012-01-25T09:27:00"
            return h

        fig, ax = draw.draw_astrometry_rotation_angles(
            [mk(178.0), mk(179.5), mk(-179.0)], x=[0, 1, 2])
        ys = ax.lines[0].get_ydata()
        assert np.max(ys) - np.min(ys) < 10  # wrapped, not a 358-deg jump

    def test_camera_footpoints(self, tmp_path):
        fig, ax = draw.draw_camera_footpoints(self._fake_props())
        save_fig(str(tmp_path / "foot.png"), fig)
        assert (tmp_path / "foot.png").stat().st_size > 0

    def test_draw_date(self, resampled, tmp_path):
        fig = draw.draw_plot(resampled)
        draw.draw_date((fig, fig.axes[0]), resampled, color="black")
        save_fig(str(tmp_path / "dated.png"), fig)
        assert (tmp_path / "dated.png").stat().st_size > 0

    def test_heatmaps(self, resampled, tmp_path):
        written = draw.draw_heatmaps(resampled,
                                     path_prefix=str(tmp_path / "heat_"))
        assert len(written) == 3
        for p in written:
            assert os.path.getsize(p) > 0

    def test_lens_distortion_derivative(self, tmp_path):
        for model, terms in [("ptlens", (0.01, -0.03, 0.0)),
                             ("poly3", (-0.02,)),
                             ("poly5", (-0.02, 0.004))]:
            fig, ax = draw.draw_lens_distortion_derivative(
                model, terms, crop_factor=1.5)
            save_fig(str(tmp_path / f"lens_{model}.png"), fig)
            assert (tmp_path / f"lens_{model}.png").stat().st_size > 0

    def test_azimuth_plots_coroutine(self, tmp_path):
        out = {}
        co = draw.draw_azimuth_plots_co(out)
        for p in self._fake_props(6):
            co.send(p)
        co.close()
        assert set(out) == {"az_centroid", "az_centroid_from_cam",
                            "latlon_centroid", "latlon_centroid_from_az",
                            "latlon_cam_foot"}
        for name, fig in out.items():
            save_fig(str(tmp_path / f"az_{name}.png"), fig)
            assert (tmp_path / f"az_{name}.png").stat().st_size > 0

    @pytest.mark.slow
    def test_scanlines_map_coroutine(self, resampled, tmp_path):
        from datetime import timedelta

        out = {}
        co = draw.draw_scanlines_map_co(out)
        base_props = resampled.properties
        c = base_props.centroid
        for i in range(4):
            props = base_props._replace(
                photoTime=base_props.photoTime + timedelta(seconds=6 * i),
                centroid=type(c)(c.lat + 0.3 * i, c.lon + 0.5 * i),
                cameraFootpoint=type(c)(c.lat - 3 + 0.3 * i,
                                        c.lon - 1 + 0.5 * i),
            )
            co.send({"props": props, "mapping": resampled})
        co.close()
        assert "figure" in out and len(out["times"]) == 4
        save_fig(str(tmp_path / "scanmap.png"), out["figure"])
        assert (tmp_path / "scanmap.png").stat().st_size > 5000


class TestBundledConstellations:
    def test_dataset_loads(self):
        from auromat_tpu.coordinates.constellations import figure_segments, load

        data = load()
        assert len(data) == 89
        assert "Orion" in data and "Ursa_Major" in data
        segs = figure_segments("Orion")["Orion"]
        assert len(segs) > 5
        for (ra1, dec1), (ra2, dec2) in segs:
            assert 0 <= ra1 <= 360 and -90 <= dec1 <= 90
        # Betelgeuse (alpha Ori) is a figure vertex: ra ~88.8, dec ~7.4
        pts = np.array([p for seg in segs for p in seg])
        d = np.hypot(pts[:, 0] - 88.79, pts[:, 1] - 7.41)
        assert d.min() < 0.5, d.min()

    def test_draw_with_bundled_data(self, mapping, tmp_path):
        fig = draw.draw_constellations(mapping)
        save_fig(str(tmp_path / "const_bundled.png"), fig)
        assert (tmp_path / "const_bundled.png").stat().st_size > 0

    def test_fixed_constellation_colors(self):
        """Greedy Delaunay coloring: full coverage, neighbors differ
        (reference draw.py getFixedConstellationColors)."""
        from scipy.spatial import Delaunay

        from auromat_tpu.coordinates.constellations import load

        colors = draw.get_fixed_constellation_colors()
        data = load()
        assert set(colors) == set(data)
        assert all(isinstance(c, str) for c in colors.values())
        # recompute the neighbor graph and assert adjacent constellations
        # got different colors (the palette of 9 is large enough that the
        # greedy pass never has to reuse within a neighborhood here)
        names = list(data)
        pts = np.array([[r[len(r) // 2][1], r[len(r) // 2][2]]
                        for r in data.values()])
        tri = Delaunay(pts)
        for simplex in tri.simplices:
            cs = [colors[names[i]] for i in simplex]
            assert len(set(cs)) == len(cs), cs

    def test_draw_with_color_dict_and_cycle(self, mapping, tmp_path):
        fig = draw.draw_constellations(
            mapping, color=draw.get_fixed_constellation_colors())
        save_fig(str(tmp_path / "const_dict.png"), fig)
        fig = draw.draw_constellations(mapping, color=["red", "lime"])
        save_fig(str(tmp_path / "const_cycle.png"), fig)
        assert (tmp_path / "const_dict.png").stat().st_size > 0
        assert (tmp_path / "const_cycle.png").stat().st_size > 0


class TestSetColors:
    def test_black_scheme(self, resampled):
        """set_colors flips background + text colors in place (reference
        draw.setColors)."""
        fig = draw.draw_plot(resampled)
        draw.set_colors(fig, bgcolor="black")
        assert fig.patch.get_facecolor()[:3] == (0.0, 0.0, 0.0)
        ax = fig.axes[0]
        assert ax.xaxis.label.get_color() == "white"
        assert all(s.get_edgecolor()[:3] == (1.0, 1.0, 1.0)
                   for s in ax.spines.values())
        # figax tuple form + transparent
        draw.set_colors((fig, ax), bgcolor="white", transparent=True)
        assert fig.patch.get_facecolor()[3] == 0.0
        import matplotlib.pyplot as plt

        plt.close(fig)


class TestCatalogStars:
    def test_offline_bright_catalog(self, mapping, tmp_path):
        """Zero-input reference-star overlay: the bundled bright-star set
        projected through the frame's WCS (reference fits.py:218-316 needs
        a live Vizier query; the offline set covers drawing)."""
        from auromat_tpu.io import fits

        header = fits.read_header(os.path.join(RES, "ISS030-E-102170_dc.wcs"))
        x, y, vmag = fits.get_catalog_stars(header, ret_vmag=True)
        assert len(x) > 3  # a 40-deg FOV frame sees many naked-eye stars
        # no ghost stars: every returned star must be on the NEAR
        # hemisphere (tan_world2pix masks theta <= 0; regression for the
        # gnomonic far-hemisphere mirror)
        from auromat_tpu.coordinates.wcs import TanWcs, tan_pix2world

        wcs = TanWcs(header)
        ra, dec = (np.asarray(a) for a in tan_pix2world(wcs, x, y))
        ra0, dec0 = header["CRVAL1"], header["CRVAL2"]
        cosd = (np.sin(np.deg2rad(dec)) * np.sin(np.deg2rad(dec0))
                + np.cos(np.deg2rad(dec)) * np.cos(np.deg2rad(dec0))
                * np.cos(np.deg2rad(ra - ra0)))
        assert (cosd > 0).all()
        assert np.isnan(vmag).all()
        assert (x >= -50).all() and (x <= header["IMAGEW"] + 50).all()
        fig = draw.draw_reference_stars(
            np.zeros((int(header["IMAGEH"]) // 8,
                      int(header["IMAGEW"]) // 8)),
            [(x / 8, y / 8)])
        save_fig(str(tmp_path / "cat_stars.png"), fig)
        assert (tmp_path / "cat_stars.png").stat().st_size > 0


@pytest.mark.slow
def test_scanlines_map_mlatmlt(resampled, tmp_path):
    from datetime import timedelta

    from auromat_tpu.mapping.mapping import convert_mapping_to_sm

    sm = convert_mapping_to_sm(resampled)
    out = {}
    co = draw.draw_scanlines_map_co(out, mlatmlt=True)
    base_props = sm.properties
    c = base_props.centroid
    for i in range(3):
        # dict sends are caller-prepared SM data (reference props_sm path)
        props = base_props._replace(
            photoTime=base_props.photoTime + timedelta(seconds=6 * i),
            centroid=type(c)(c.lat + 0.3 * i, c.lon + 0.5 * i),
            cameraFootpoint=type(c)(c.lat - 3 + 0.3 * i, c.lon - 1 + 0.5 * i),
        )
        co.send({"props": props, "mapping": sm})
    co.close()
    assert "figure" in out
    save_fig(str(tmp_path / "scanmap_sm.png"), out["figure"])
    assert (tmp_path / "scanmap_sm.png").stat().st_size > 5000


class TestMapBackgrounds:
    """Bundled coastline + city datasets (out-of-box map context; the
    reference gets these from Basemap/bundled Natural Earth shapefiles,
    reference draw.py:319-362, 403-420)."""

    def test_coastline_resource_loads(self):
        from auromat_tpu.coastlines import coastline_latlon

        c = coastline_latlon()
        assert c.ndim == 2 and c.shape[1] == 2
        fin = np.isfinite(c).all(axis=1)
        assert fin.sum() > 800  # ~919 vertices
        assert np.nanmax(np.abs(c[:, 0])) <= 90
        assert np.nanmax(np.abs(c[:, 1])) <= 180
        # recognisable auroral-zone content: vertices over northern Canada
        canada = fin & (c[:, 0] > 55) & (c[:, 1] > -140) & (c[:, 1] < -60)
        assert canada.sum() > 20

    def test_stereographic_shows_coastlines_by_default(self, resampled,
                                                       tmp_path):
        fig = draw.draw_stereographic(resampled)
        # the coastline polyline must actually be drawn with in-view points
        lines = [l for l in fig.axes[0].lines
                 if l.get_color() == "#888888"]
        assert lines, "no coastline line drawn by default"
        x = np.asarray(lines[-1].get_xdata(), dtype=float)
        assert np.isfinite(x).sum() > 50  # near-hemisphere vertices kept
        out = save_fig(str(tmp_path / "stereo_coast.png"), fig)
        assert os.path.getsize(out) > 5000
        # and it can be disabled
        fig2 = draw.draw_stereographic(resampled, coastlines=None)
        assert not [l for l in fig2.axes[0].lines
                    if l.get_color() == "#888888"]

    def test_stereographic_cities_overlay(self, resampled, tmp_path):
        fig = draw.draw_stereographic(resampled, cities=True)
        colls = [c for c in fig.axes[0].collections if c.get_gid() == "cities"]
        assert len(colls) == 1
        assert colls[0].get_offsets().shape[0] > 5  # cities in view
        out = save_fig(str(tmp_path / "stereo_cities.png"), fig)
        assert os.path.getsize(out) > 5000

    def test_land_rings_closed(self):
        from auromat_tpu.coastlines import land_rings

        rings = land_rings()
        assert len(rings) >= 20
        for r in rings:
            assert r.ndim == 2 and r.shape[1] == 2 and len(r) >= 4
            assert np.array_equal(r[0], r[-1]), "ring not closed"
            assert np.abs(r[:, 0]).max() <= 90
            assert np.abs(r[:, 1]).max() <= 180
        # the stitched Eurasia ring exists: one ring spanning Iberia to
        # the Russian Pacific coast (the open coast polylines closed)
        spans = [(r[:, 1].min(), r[:, 1].max()) for r in rings]
        assert any(w < -5 and e > 150 for w, e in spans), spans

    def test_stereographic_lsmask(self, resampled, tmp_path):
        """Filled land/sea background (reference draw.py:345 drawlsmask):
        lsmask=True adds the ocean disk + land fills under the data."""
        import matplotlib.patches as mpatches

        fig = draw.draw_stereographic(resampled, lsmask=True)
        ax = fig.axes[0]
        oceans = [p for p in ax.patches if isinstance(p, mpatches.Circle)]
        assert len(oceans) == 1
        lands = [p for p in ax.patches
                 if isinstance(p, mpatches.Polygon)]
        assert len(lands) >= 3  # N America + arctic islands in view
        # land fills sit below the graticule (zorder 1) and data
        assert all(p.get_zorder() < 1 for p in lands + oceans)
        # the frame is over Canada: a big land polygon crosses the view
        half_w = ax.get_xlim()[1]
        assert any(np.abs(np.asarray(p.get_xy())).max() > half_w / 4
                   for p in lands)
        out = save_fig(str(tmp_path / "stereo_lsmask.png"), fig)
        assert os.path.getsize(out) > 5000
        # default: off (black-background aurora plots)
        fig2 = draw.draw_stereographic(resampled)
        assert not fig2.axes[0].patches

    def test_lsmask_rings_clamped_to_cap_no_chords(self):
        """Far-side ring vertices are clamped RADIALLY onto the cap circle
        — every filled vertex stays inside the cap, and a
        horizon-crossing ring keeps its FULL vertex count (closed along
        the horizon) instead of dropping hidden arcs, whose straight
        rejoin chord could paint ocean as land across the visible map."""
        import matplotlib.patches as mpatches
        import matplotlib.pyplot as plt

        from auromat_tpu.coastlines import land_rings, near_hemisphere
        from auromat_tpu.draw import _draw_lsmask

        lat0, lon0, min_cos = 60.0, -100.0, 0.05
        fig, ax = plt.subplots()
        try:
            _draw_lsmask(ax, lat0, lon0, min_cos=min_cos)
            r_cap = 2.0 * 6371.0 * np.sqrt(1.0 - min_cos**2) \
                / (1.0 + min_cos)
            lands = [p for p in ax.patches
                     if isinstance(p, mpatches.Polygon)]
            assert lands
            for p in lands:
                xy = np.asarray(p.get_xy())
                assert np.hypot(xy[:, 0], xy[:, 1]).max() <= r_cap * 1.0001
            # a partially visible ring exists from this viewpoint and is
            # drawn with its full (finite) vertex count
            crossing = [r for r in land_rings()
                        if 0 < near_hemisphere(r[:, 0], r[:, 1], lat0,
                                               lon0,
                                               min_cos=min_cos).sum()
                        < len(r)]
            assert crossing
            sizes = sorted(len(np.asarray(p.get_xy())) for p in lands)
            for ring in crossing:
                # antipodal vertices (dropped as non-finite) don't occur
                # here, so the polygon carries every ring vertex
                assert len(ring) in sizes
        finally:
            plt.close(fig)

    def test_city_resource_content(self):
        path = os.path.join(os.path.dirname(draw.__file__), "resources",
                            "cities_ne50m.npz")
        with np.load(path) as d:
            assert len(d["lons"]) > 1000
            assert "Tokyo" in list(d["names"])
