"""TAN projection tests.

Validation strategy (the reference validates against astropy,
auromat/test/wcs_test.py:14-36; astropy is unavailable here):

1. anchor: the reference pixel maps exactly to (CRVAL1, CRVAL2);
2. an independent *forward* TAN projection (world->pix) written directly from
   the FITS Paper II equations must invert our pix->world to <1e-8 px;
3. direction vectors are unit and consistent with (ra, dec).
"""

import os

import numpy as np
import pytest
from numpy.testing import assert_allclose

from auromat_tpu.coordinates.wcs import (
    TanWcs,
    pixel_directions,
    pixel_grid,
    tan_pix2world,
    tan_pix2world_cartesian,
)
from auromat_tpu.io import fits

RES = os.path.join(os.path.dirname(__file__), "resources")


def load_wcs():
    header = fits.read_header(os.path.join(RES, "ISS030-E-102170_dc.wcs"))
    return TanWcs(header)


def independent_world2pix(wcs, ra_deg, dec_deg):
    """Celestial -> pixel, written independently from the inverse equations."""
    ra = np.deg2rad(np.asarray(ra_deg, dtype=np.float64))
    dec = np.deg2rad(np.asarray(dec_deg, dtype=np.float64))
    v = np.stack(
        [np.cos(dec) * np.cos(ra), np.cos(dec) * np.sin(ra), np.sin(dec)], axis=-1
    )
    # celestial -> native spherical
    n = v @ wcs.rotmat  # R^T @ v
    phi = np.arctan2(n[..., 1], n[..., 0])
    theta = np.arctan2(n[..., 2], np.hypot(n[..., 0], n[..., 1]))
    # native spherical -> projection plane (TAN): R_theta = (180/pi) cot(theta)
    r = (180.0 / np.pi) / np.tan(theta)
    x = r * np.sin(phi)
    y = -r * np.cos(phi)
    # projection plane -> pixel offsets via CD^-1
    inv = np.linalg.inv(wcs.cd)
    dx = inv[0, 0] * x + inv[0, 1] * y
    dy = inv[1, 0] * x + inv[1, 1] * y
    # 0-based pixels
    return dx + wcs.px_ref - 1, dy + wcs.py_ref - 1


class TestTanPix2World:
    def test_reference_pixel_anchor(self):
        wcs = load_wcs()
        ra, dec = tan_pix2world(
            wcs, np.array([wcs.px_ref - 1.0]), np.array([wcs.py_ref - 1.0])
        )
        assert_allclose(float(np.asarray(ra)[0]), wcs.ra_ref, atol=1e-10)
        assert_allclose(float(np.asarray(dec)[0]), wcs.dec_ref, atol=1e-10)

    def test_roundtrip_against_independent_forward(self):
        wcs = load_wcs()
        rng = np.random.default_rng(42)
        px = rng.uniform(0, wcs.width - 1, 2000)
        py = rng.uniform(0, wcs.height - 1, 2000)
        ra, dec = tan_pix2world(wcs, px, py)
        rpx, rpy = independent_world2pix(wcs, np.asarray(ra), np.asarray(dec))
        assert_allclose(rpx, px, atol=1e-8)
        assert_allclose(rpy, py, atol=1e-8)

    def test_grid_roundtrip_corner(self):
        wcs = load_wcs()
        px, py = pixel_grid(64, 48, corner=True)
        assert px.shape == (49, 65)
        ra, dec = tan_pix2world(wcs, px, py)
        rpx, rpy = independent_world2pix(wcs, np.asarray(ra), np.asarray(dec))
        assert_allclose(rpx, np.asarray(px), atol=1e-8)
        assert_allclose(rpy, np.asarray(py), atol=1e-8)

    def test_cartesian_consistency(self):
        wcs = load_wcs()
        px = np.array([0.0, 100.0, 2000.0])
        py = np.array([0.0, 50.0, 1500.0])
        v = np.asarray(tan_pix2world_cartesian(wcs, px, py))
        assert_allclose(np.linalg.norm(v, axis=-1), 1.0, atol=1e-12)
        ra, dec = tan_pix2world(wcs, px, py)
        expected = np.stack(
            [
                np.cos(np.deg2rad(dec)) * np.cos(np.deg2rad(ra)),
                np.cos(np.deg2rad(dec)) * np.sin(np.deg2rad(ra)),
                np.sin(np.deg2rad(dec)),
            ],
            axis=-1,
        )
        assert_allclose(v, np.asarray(expected), atol=1e-12)

    def test_ra_in_0_360(self):
        wcs = load_wcs()
        px, py = pixel_grid(200, 150, corner=False)
        ra, _ = tan_pix2world(wcs, px, py)
        ra = np.asarray(ra)
        assert np.all(ra >= 0) and np.all(ra < 360)

    def test_pixel_directions_shapes(self):
        wcs = load_wcs()
        assert wcs.width == 4256 and wcs.height == 2832
        # small synthetic wcs for shape checks: reuse header but shrink
        wcs.width, wcs.height = 32, 16
        corners = pixel_directions(wcs, corner=True)
        centers = pixel_directions(wcs, corner=False)
        assert corners.shape == (17, 33, 3)
        assert centers.shape == (16, 32, 3)
        # centres lie between the 4 surrounding corners (direction-wise)
        c = np.asarray(corners)
        mean4 = (c[:-1, :-1] + c[:-1, 1:] + c[1:, :-1] + c[1:, 1:]) / 4
        mean4 /= np.linalg.norm(mean4, axis=-1, keepdims=True)
        assert_allclose(np.asarray(centers), mean4, atol=1e-7)

    def test_pixel_directions_missing_dims(self):
        import pytest

        wcs = load_wcs()
        wcs.width = None  # header without IMAGEW/IMAGEH
        with pytest.raises(ValueError, match="IMAGEW"):
            pixel_directions(wcs)


class TestHeaderIO:
    def test_read_wcs_header(self):
        header = fits.read_header(os.path.join(RES, "ISS030-E-102170_dc.wcs"))
        assert header["CTYPE1"] == "RA---TAN"
        assert header["IMAGEW"] == 4256
        assert header["NORADID"] == "25544"
        assert header["POSX"] == -4784.05705129671
        shifted = fits.get_shifted_spacecraft_position(header)
        assert shifted is not None
        assert shifted[3] == -13.0
        t = fits.get_photo_time(header)
        assert t.year == 2012 and t.microsecond == 60000

    def test_write_read_roundtrip(self, tmp_path):
        header = fits.read_header(os.path.join(RES, "ISS030-E-102170_dc.wcs"))
        out = tmp_path / "roundtrip.wcs"
        fits.write_header(header, out)
        header2 = fits.read_header(out)
        for key in ("CTYPE1", "CRVAL1", "CRVAL2", "CD1_1", "CD2_2", "IMAGEW",
                    "POSX", "POSXSHIF", "DATESHIF", "DATE-OBS", "NORADID"):
            assert header2[key] == header[key], key
        assert (len(out.read_bytes()) % 2880) == 0

    def test_set_position_cards(self, tmp_path):
        h = fits.FitsHeader()
        from datetime import datetime

        fits.set_spacecraft_position(h, (1.0, 2.0, 3.0), datetime(2012, 1, 25, 9, 27, 8))
        fits.set_shifted_spacecraft_position(h, (4.0, 5.0, 6.0), -13.0)
        fits.set_norad_id(h, 25544)
        out = tmp_path / "pos.wcs"
        fits.write_header(h, out)
        h2 = fits.read_header(out)
        assert fits.get_spacecraft_position(h2) == (1.0, 2.0, 3.0)
        assert fits.get_shifted_spacecraft_position(h2) == (4.0, 5.0, 6.0, -13.0)
        assert fits.get_norad_id(h2) == 25544
        assert fits.get_photo_time(h2) == datetime(2012, 1, 25, 9, 27, 8)


class TestBinTable:
    def test_xyls_roundtrip(self, tmp_path):
        import numpy as np

        x = np.array([10.5, 200.25, 4000.0])
        y = np.array([20.5, 100.75, 2000.0])
        flux = np.array([9.0, 5.0, 30.0])
        p = str(tmp_path / "stars.xyls")
        fits.write_xyls(p, x, y, flux)
        rx, ry = fits.read_xy(p)
        np.testing.assert_allclose(rx, x)
        np.testing.assert_allclose(ry, y)
        # flux-sorted descending
        sx, sy = fits.read_xy(p, sort=True)
        np.testing.assert_allclose(sx, [4000.0, 10.5, 200.25])

    def test_bintable_generic(self, tmp_path):
        import numpy as np

        p = str(tmp_path / "t.fits")
        fits.write_bintable(p, {"A": np.arange(5, dtype=np.int32),
                                "B": np.linspace(0, 1, 5)})
        t = fits.read_bintable(p)
        np.testing.assert_array_equal(t["A"], np.arange(5))
        np.testing.assert_allclose(t["B"], np.linspace(0, 1, 5))


class TestChecksums:
    def test_self_consistent(self, tmp_path):
        header = fits.read_header(os.path.join(RES, "ISS030-E-102170_dc.wcs"))
        fits.set_checksums(header)
        out = tmp_path / "ck.wcs"
        fits.write_header(header, out)
        blob = out.read_bytes()
        # defining property: ones-complement sum of the full HDU == 0xFFFFFFFF
        assert fits.compute_datasum(blob) == 0xFFFFFFFF
        assert len(header["CHECKSUM"]) == 16


class TestWorld2Pix:
    def test_inverse_of_pix2world(self):
        import numpy as np

        from auromat_tpu.coordinates.wcs import tan_world2pix

        wcs = load_wcs()
        rng = np.random.default_rng(1)
        px = rng.uniform(0, wcs.width - 1, 500)
        py = rng.uniform(0, wcs.height - 1, 500)
        ra, dec = tan_pix2world(wcs, px, py)
        bx, by = tan_world2pix(wcs, np.asarray(ra), np.asarray(dec))
        np.testing.assert_allclose(np.asarray(bx), px, atol=1e-8)
        np.testing.assert_allclose(np.asarray(by), py, atol=1e-8)


def test_world2pix_masks_far_hemisphere():
    """The gnomonic inverse MIRRORS the far hemisphere into the frame
    unless theta <= 0 is masked: the antipode of the frame centre would
    project exactly onto the frame centre (ghost stars)."""
    import os

    import numpy as np

    from auromat_tpu.coordinates.wcs import TanWcs, tan_world2pix
    from auromat_tpu.io import fits

    res = os.path.join(os.path.dirname(__file__), "resources")
    header = fits.read_header(os.path.join(res, "ISS030-E-102170_dc.wcs"))
    wcs = TanWcs(header)
    ra0, dec0 = header["CRVAL1"], header["CRVAL2"]
    # frame centre projects near CRPIX; its antipode must be NaN
    x, y = tan_world2pix(wcs, ra0, dec0)
    assert np.isfinite(float(np.asarray(x)))
    xa, ya = tan_world2pix(wcs, (ra0 + 180.0) % 360.0, -dec0)
    assert np.isnan(float(np.asarray(xa))) and np.isnan(float(np.asarray(ya)))


class TestZenithalProjections:
    """Generic zenithal (SIN/ZEA/ARC/STG + TAN) unprojection — the
    first-party replacement for the reference's astropy fallback on
    non-TAN headers (reference wcs.py:18-64)."""

    @staticmethod
    def _header(code, scale=0.01):
        return {
            "CTYPE1": f"RA---{code}", "CTYPE2": f"DEC--{code}",
            "CRVAL1": 30.0, "CRVAL2": 45.0,
            "CRPIX1": 100.5, "CRPIX2": 80.25,
            "CD1_1": scale * 0.9, "CD1_2": scale * 0.3,
            "CD2_1": -scale * 0.2, "CD2_2": scale * 1.1,
            "IMAGEW": 200, "IMAGEH": 160,
        }

    @pytest.mark.parametrize("code", ["TAN", "SIN", "ZEA", "ARC", "STG"])
    def test_roundtrip(self, code):
        from auromat_tpu.coordinates.wcs import (ZenithalWcs, pix2world,
                                                 world2pix)

        wcs = ZenithalWcs(self._header(code))
        px, py = np.meshgrid(np.arange(0, 200, 13, dtype=np.float64),
                             np.arange(0, 160, 11, dtype=np.float64))
        ra, dec = pix2world(wcs, px, py)
        bx, by = world2pix(wcs, ra, dec)
        assert not np.isnan(np.asarray(bx)).any()
        assert_allclose(np.asarray(bx), px, atol=1e-8)
        assert_allclose(np.asarray(by), py, atol=1e-8)

    @pytest.mark.parametrize("code", ["SIN", "ZEA", "ARC", "STG"])
    def test_dirs_from_plane_matches_spherical_route(self, code):
        """The trig-free algebraic direction fast path (dirs_from_plane,
        used by pix2world_cartesian) equals the native_from_plane +
        cos/sin spherical route to f64 roundoff, INCLUDING the NaN
        domains (SIN beyond the disc, ZEA beyond the antipode circle,
        ARC beyond r=180) — probed with a wide-scale header so the
        out-of-domain regions are actually exercised."""
        import jax.numpy as jnp

        from auromat_tpu.coordinates.wcs import ZenithalWcs

        wcs = ZenithalWcs(self._header(code, scale=0.8))
        px, py = np.meshgrid(np.arange(-40, 240, 7, dtype=np.float64),
                             np.arange(-40, 200, 9, dtype=np.float64))
        x = 0.8 * 0.9 * (px - 99.5) + 0.8 * 0.3 * (py - 79.25)
        y = -0.8 * 0.2 * (px - 99.5) + 0.8 * 1.1 * (py - 79.25)
        x, y = jnp.asarray(x), jnp.asarray(y)
        fast = wcs.dirs_from_plane(x, y)
        assert fast is not None
        phi, theta = wcs.native_from_plane(x, y)
        ct = jnp.cos(theta)
        ref = (ct * jnp.cos(phi), ct * jnp.sin(phi), jnp.sin(theta))
        for a, b in zip(fast, ref):
            a, b = np.asarray(a), np.asarray(b)
            assert np.array_equal(np.isnan(a), np.isnan(b))
            ok = ~np.isnan(a)
            assert_allclose(a[ok], b[ok], rtol=0, atol=5e-14)
        if code in ("SIN", "ZEA"):  # probe grid reaches out-of-domain
            assert np.isnan(np.asarray(fast[2])).any()
        if code == "ARC":  # r > 180 not reachable with this header; probe
            f = wcs.dirs_from_plane(jnp.asarray([181.0]), jnp.asarray([0.0]))
            assert all(np.isnan(np.asarray(c)).all() for c in f)

    def test_dirs_from_plane_declines_non_radial(self):
        """AZP (tilted — not radially symmetric) must return None and
        route through the spherical path."""
        import jax.numpy as jnp

        from auromat_tpu.coordinates.wcs import make_wcs

        h = self._header("AZP")
        h["PV2_1"], h["PV2_2"] = 2.0, 15.0
        wcs = make_wcs(h)
        assert wcs.dirs_from_plane(jnp.zeros(3), jnp.zeros(3)) is None

    @pytest.mark.parametrize("code", ["SIN", "ZEA", "ARC", "STG"])
    def test_radial_inverse_analytic(self, code):
        """Independent oracle: the angular distance between a pixel's
        direction and the reference direction must equal 90 deg - theta(R)
        with theta computed from the projection's R_theta formula by plain
        numpy trig (FITS Paper II section 5.1)."""
        from auromat_tpu.coordinates.wcs import (ZenithalWcs,
                                                 pix2world_cartesian)

        h = self._header(code)
        wcs = ZenithalWcs(h)
        # pixels on a range of radii incl. large angles where the
        # projections differ strongly
        px = np.array([100.5 - 1.0 + 40.0, 100.5 - 1.0, 100.5 - 1.0 - 70.0])
        py = np.array([80.25 - 1.0, 80.25 - 1.0 + 55.0, 80.25 - 1.0 - 30.0])
        dx, dy = px - (wcs.px_ref - 1), py - (wcs.py_ref - 1)
        x = wcs.cd[0, 0] * dx + wcs.cd[0, 1] * dy
        y = wcs.cd[1, 0] * dx + wcs.cd[1, 1] * dy
        r = np.hypot(x, y)
        if code == "SIN":
            theta = np.arccos(np.deg2rad(r))
        elif code == "ZEA":
            theta = np.pi / 2 - 2 * np.arcsin(np.deg2rad(r) / 2)
        elif code == "ARC":
            theta = np.deg2rad(90.0 - r)
        else:  # STG
            theta = np.pi / 2 - 2 * np.arctan(np.deg2rad(r) / 2)
        v = np.asarray(pix2world_cartesian(wcs, px, py))
        ra0, dec0 = np.deg2rad(30.0), np.deg2rad(45.0)
        v0 = np.array([np.cos(dec0) * np.cos(ra0),
                       np.cos(dec0) * np.sin(ra0), np.sin(dec0)])
        ang = np.arccos(np.clip(v @ v0, -1, 1))
        assert_allclose(ang, np.pi / 2 - theta, atol=1e-12)

    def test_tan_generic_matches_fast_path(self):
        from auromat_tpu.coordinates.wcs import (TanWcs, ZenithalWcs,
                                                 pix2world, tan_pix2world)

        h = self._header("TAN")
        px, py = np.meshgrid(np.arange(0, 200, 7, dtype=np.float64),
                             np.arange(0, 160, 9, dtype=np.float64))
        ra_g, dec_g = pix2world(ZenithalWcs(h), px, py)
        ra_t, dec_t = tan_pix2world(TanWcs(h), px, py)
        assert np.array_equal(np.asarray(ra_g), np.asarray(ra_t))
        assert np.array_equal(np.asarray(dec_g), np.asarray(dec_t))

    def test_sin_outside_disc_is_nan(self):
        from auromat_tpu.coordinates.wcs import ZenithalWcs, pix2world

        # R > 180/pi deg is outside the orthographic disc
        wcs = ZenithalWcs(self._header("SIN", scale=1.0))
        ra, dec = pix2world(wcs, np.array([199.0]), np.array([0.0]))
        assert np.isnan(np.asarray(ra)).all()
        assert np.isnan(np.asarray(dec)).all()

    def test_tanwcs_rejects_non_tan_but_zenithal_accepts(self):
        from auromat_tpu.coordinates.wcs import TanWcs, ZenithalWcs

        h = self._header("SIN")
        with pytest.raises(ValueError, match="RA---TAN"):
            TanWcs(h)
        assert ZenithalWcs(h).projection == "SIN"
        bad = self._header("AIT")  # non-zenithal
        with pytest.raises(ValueError, match="zenithal"):
            ZenithalWcs(bad)

    def test_latpole_crval2_spelling_accepted(self):
        """wcslib writes the computed native-pole latitude (= CRVAL2 for
        zenithal projections) into LATPOLE; astrometry.net writes 0. Both
        carry no information for this family and must parse identically;
        a genuinely inconsistent value is refused."""
        from auromat_tpu.coordinates.wcs import ZenithalWcs, pix2world

        h0 = self._header("ZEA")
        h0["LATPOLE"] = 0.0
        hw = self._header("ZEA")
        hw["LATPOLE"] = hw["CRVAL2"]  # the wcslib spelling
        px = np.array([10.0, 150.0])
        py = np.array([20.0, 100.0])
        ra0, dec0 = pix2world(ZenithalWcs(h0), px, py)
        raw, decw = pix2world(ZenithalWcs(hw), px, py)
        assert np.array_equal(np.asarray(ra0), np.asarray(raw))
        assert np.array_equal(np.asarray(dec0), np.asarray(decw))
        hbad = self._header("ZEA")
        hbad["LATPOLE"] = 17.0
        with pytest.raises(ValueError, match="LATPOLE"):
            ZenithalWcs(hbad)


class TestCylindricalProjections:
    """First-party cylindrical family (CAR/CEA/MER) — closes the last WCS
    gap vs the reference's astropy fallback (reference wcs.py:18-64).
    astropy is unavailable here, so the oracles are analytic: exact
    fiducial anchoring, the trivial CAR lon/lat grid, native-graticule
    great-circle distances, the closed-form y(theta) laws, round-trips,
    and small-offset agreement with the validated TAN path."""

    @staticmethod
    def _header(code, scale=0.01, crval=(30.0, 45.0), **extra):
        h = {
            "CTYPE1": f"RA---{code}", "CTYPE2": f"DEC--{code}",
            "CRVAL1": crval[0], "CRVAL2": crval[1],
            "CRPIX1": 100.5, "CRPIX2": 80.25,
            "CD1_1": scale * 0.9, "CD1_2": scale * 0.3,
            "CD2_1": -scale * 0.2, "CD2_2": scale * 1.1,
            "IMAGEW": 200, "IMAGEH": 160,
        }
        h.update(extra)
        return h

    @pytest.mark.parametrize("code", ["CAR", "CEA", "MER"])
    @pytest.mark.parametrize("crval", [(30.0, 45.0), (210.0, -37.5),
                                       (0.0, 0.0)])
    def test_roundtrip(self, code, crval):
        from auromat_tpu.coordinates.wcs import (CylindricalWcs, pix2world,
                                                 world2pix)

        wcs = CylindricalWcs(self._header(code, crval=crval))
        px, py = np.meshgrid(np.arange(0, 200, 13, dtype=np.float64),
                             np.arange(0, 160, 11, dtype=np.float64))
        ra, dec = pix2world(wcs, px, py)
        bx, by = world2pix(wcs, ra, dec)
        assert not np.isnan(np.asarray(bx)).any()
        assert_allclose(np.asarray(bx), px, atol=1e-7)
        assert_allclose(np.asarray(by), py, atol=1e-7)

    @pytest.mark.parametrize("code", ["CAR", "CEA", "MER"])
    @pytest.mark.parametrize("lonpole", [None, 30.0])
    def test_fiducial_maps_to_crval(self, code, lonpole):
        """CRPIX must land exactly on CRVAL — this pins the native-pole
        (alpha_p, delta_p) solution, including non-default LONPOLE."""
        from auromat_tpu.coordinates.wcs import CylindricalWcs, pix2world

        extra = {} if lonpole is None else {"LONPOLE": lonpole}
        wcs = CylindricalWcs(self._header(code, **extra))
        ra, dec = pix2world(wcs, np.array([wcs.px_ref]),
                            np.array([wcs.py_ref]), origin=1)
        assert_allclose(float(ra[0]), wcs.ra_ref, atol=1e-9)
        assert_allclose(float(dec[0]), wcs.dec_ref, atol=1e-9)

    def test_car_trivial_grid(self):
        """CAR at CRVAL=(0,0), CD=I, CRPIX=(1,1): world == pixel offsets —
        the plate-carree identity every cylindrical stack must hit."""
        from auromat_tpu.coordinates.wcs import CylindricalWcs, pix2world

        h = {
            "CTYPE1": "RA---CAR", "CTYPE2": "DEC--CAR",
            "CRVAL1": 0.0, "CRVAL2": 0.0, "CRPIX1": 1.0, "CRPIX2": 1.0,
            "CD1_1": 1.0, "CD1_2": 0.0, "CD2_1": 0.0, "CD2_2": 1.0,
        }
        wcs = CylindricalWcs(h)
        px = np.array([0.0, 10.0, -20.0, 45.0])
        py = np.array([0.0, 5.0, -30.0, 80.0])
        ra, dec = pix2world(wcs, px, py, origin=0)
        assert_allclose(np.asarray(ra), px % 360.0, atol=1e-9)
        assert_allclose(np.asarray(dec), py, atol=1e-9)

    @pytest.mark.parametrize("code", ["CEA", "MER"])
    def test_y_law_analytic(self, code):
        """The meridional y(theta) closed forms, computed independently
        with plain numpy (FITS Paper II section 5.2): CEA
        theta = asin(lambda y), MER theta = 2 atan(e^y) - pi/2."""
        from auromat_tpu.coordinates.wcs import CylindricalWcs, pix2world

        lam = 0.5 if code == "CEA" else 1.0
        h = {
            "CTYPE1": f"RA---{code}", "CTYPE2": f"DEC--{code}",
            "CRVAL1": 0.0, "CRVAL2": 0.0, "CRPIX1": 1.0, "CRPIX2": 1.0,
            "CD1_1": 1.0, "CD1_2": 0.0, "CD2_1": 0.0, "CD2_2": 1.0,
            "PV2_1": lam,
        }
        wcs = CylindricalWcs(h)
        y = np.array([0.0, 10.0, -25.0, 60.0])
        ra, dec = pix2world(wcs, np.zeros_like(y), y, origin=0)
        yr = np.deg2rad(y)
        if code == "CEA":
            expect = np.rad2deg(np.arcsin(lam * yr))
        else:
            expect = np.rad2deg(2.0 * np.arctan(np.exp(yr)) - np.pi / 2)
        assert_allclose(np.asarray(dec), expect, atol=1e-9)
        assert_allclose(np.asarray(ra) % 360.0, 0.0, atol=1e-9)

    def test_native_graticule_distances(self):
        """Independent spherical oracle at a rotated CRVAL: pixels on one
        native meridian are separated by exactly their Delta-theta, pixels
        on the native equator by exactly Delta-phi (CAR is equidistant on
        both) — gates that rotmat is a true rotation AND the scaling."""
        from auromat_tpu.coordinates.wcs import (CylindricalWcs,
                                                 pix2world_cartesian)

        s = 0.05
        h = {
            "CTYPE1": "RA---CAR", "CTYPE2": "DEC--CAR",
            "CRVAL1": 137.0, "CRVAL2": -52.0, "CRPIX1": 50.0,
            "CRPIX2": 40.0, "CD1_1": s, "CD1_2": 0.0, "CD2_1": 0.0,
            "CD2_2": s,
        }
        wcs = CylindricalWcs(h)
        # same column -> same native phi; rows differ by dy
        px = np.array([10.0, 10.0, 10.0, 80.0])
        py = np.array([5.0, 25.0, 65.0, 5.0])
        v = np.array(pix2world_cartesian(wcs, px, py))
        v /= np.linalg.norm(v, axis=-1, keepdims=True)
        ang01 = np.rad2deg(np.arccos(np.clip(v[0] @ v[1], -1, 1)))
        ang02 = np.rad2deg(np.arccos(np.clip(v[0] @ v[2], -1, 1)))
        assert_allclose(ang01, 20.0 * s, atol=1e-9)
        assert_allclose(ang02, 60.0 * s, atol=1e-9)
        # same row at theta=0 (py where y=0: py such that CD2_2*(py-CRPIX2)
        # = 0 -> py = CRPIX2 - 0... use origin-0 px grid at py giving y=0)
        py0 = wcs.py_ref - 1.0  # origin=0 pixel row mapping to y = 0
        pe = np.array([10.0, 80.0])
        ve = np.array(pix2world_cartesian(
            wcs, pe, np.full_like(pe, py0)))
        ve /= np.linalg.norm(ve, axis=-1, keepdims=True)
        ang = np.rad2deg(np.arccos(np.clip(ve[0] @ ve[1], -1, 1)))
        assert_allclose(ang, 70.0 * s, atol=1e-9)

    @pytest.mark.parametrize("code", ["CAR", "CEA", "MER"])
    def test_small_offset_matches_tan(self, code):
        """Near the fiducial every projection agrees with the tangent
        plane to O(r^3): at r <= 0.05 deg the validated TAN path and the
        cylindrical path must agree to ~4e-8 deg (gate 1e-6)."""
        from auromat_tpu.coordinates.wcs import (CylindricalWcs, TanWcs,
                                                 pix2world,
                                                 tan_pix2world)

        hc = self._header(code, scale=0.001)
        ht = self._header("TAN", scale=0.001)
        wc, wt = CylindricalWcs(hc), TanWcs(ht)
        px, py = np.meshgrid(
            np.linspace(80.0, 120.0, 9), np.linspace(60.0, 100.0, 9))
        ra_c, dec_c = pix2world(wc, px, py)
        ra_t, dec_t = tan_pix2world(wt, px, py)
        dra = (np.asarray(ra_c) - np.asarray(ra_t) + 180.0) % 360.0 - 180.0
        assert np.abs(dra * np.cos(np.deg2rad(np.asarray(dec_t)))).max() < 1e-6
        assert np.abs(np.asarray(dec_c) - np.asarray(dec_t)).max() < 1e-6

    def test_make_wcs_dispatch_and_actionable_error(self):
        from auromat_tpu.coordinates.wcs import (CylindricalWcs,
                                                 ZenithalWcs, make_wcs)

        assert isinstance(make_wcs(
            TestZenithalProjections._header("TAN")), ZenithalWcs)
        assert isinstance(make_wcs(self._header("MER")), CylindricalWcs)
        with pytest.raises(NotImplementedError) as ei:
            make_wcs(TestZenithalProjections._header("CSC"))
        msg = str(ei.value)
        assert "TAN" in msg and "CAR" in msg and "QSC" in msg

    def test_cea_lambda_validation(self):
        from auromat_tpu.coordinates.wcs import CylindricalWcs

        with pytest.raises(ValueError, match="PV2_1"):
            CylindricalWcs(self._header("CEA", PV2_1=1.5))


class TestConicProjections:
    """First-party conic family (COP/COE/COD/COO — FITS Paper II section
    5.3), the last projection family the reference reaches only via its
    astropy fallback (reference wcs.py:18-64). astropy is unavailable, so
    the oracles are analytic and mutually independent: the zenithal-limit
    equivalences (theta_a = 90, eta = 0 collapses each cone onto a
    validated azimuthal projection), true scale on BOTH standard
    parallels, equidistant meridians for COD as great-circle distances,
    local conformality for COO, constant area ratio for COE, exact
    fiducial anchoring (pins the general native-pole eqs. 8-10), and
    round-trips."""

    CODES = ["COP", "COE", "COD", "COO"]
    #: theta_a = 90, eta = 0 collapses each cone onto this azimuthal code
    ZENITHAL_LIMIT = {"COP": "TAN", "COE": "ZEA", "COD": "ARC",
                      "COO": "STG"}

    @staticmethod
    def _header(code, scale=0.01, crval=(30.0, 45.0), theta_a=45.0,
                eta=0.0, **extra):
        h = {
            "CTYPE1": f"RA---{code}", "CTYPE2": f"DEC--{code}",
            "CRVAL1": crval[0], "CRVAL2": crval[1],
            "CRPIX1": 100.5, "CRPIX2": 80.25,
            "CD1_1": scale * 0.9, "CD1_2": scale * 0.3,
            "CD2_1": -scale * 0.2, "CD2_2": scale * 1.1,
            "IMAGEW": 200, "IMAGEH": 160,
            "PV2_1": theta_a, "PV2_2": eta,
        }
        h.update(extra)
        return h

    @pytest.mark.parametrize("code", CODES)
    @pytest.mark.parametrize("theta_a,eta,crval", [
        (45.0, 0.0, (30.0, 45.0)),
        (45.0, 15.0, (210.0, 30.0)),
        (-52.0, 10.0, (100.0, -40.0)),  # southern cone
    ])
    def test_roundtrip(self, code, theta_a, eta, crval):
        from auromat_tpu.coordinates.wcs import (ConicWcs, pix2world,
                                                 world2pix)

        wcs = ConicWcs(self._header(code, crval=crval, theta_a=theta_a,
                                    eta=eta))
        px, py = np.meshgrid(np.arange(0, 200, 13, dtype=np.float64),
                             np.arange(0, 160, 11, dtype=np.float64))
        ra, dec = pix2world(wcs, px, py)
        bx, by = world2pix(wcs, ra, dec)
        assert not np.isnan(np.asarray(bx)).any()
        assert_allclose(np.asarray(bx), px, atol=1e-7)
        assert_allclose(np.asarray(by), py, atol=1e-7)

    @pytest.mark.parametrize("code", CODES)
    @pytest.mark.parametrize("lonpole", [None, 30.0])
    def test_fiducial_maps_to_crval(self, code, lonpole):
        """CRPIX must land exactly on CRVAL — for conics theta0 = theta_a
        != 0, 90, so this pins the GENERAL native-pole solution
        (_native_pole, Paper II eqs. 8-10) including non-default
        LONPOLE."""
        from auromat_tpu.coordinates.wcs import ConicWcs, pix2world

        extra = {} if lonpole is None else {"LONPOLE": lonpole}
        wcs = ConicWcs(self._header(code, eta=10.0, **extra))
        ra, dec = pix2world(wcs, np.array([wcs.px_ref]),
                            np.array([wcs.py_ref]), origin=1)
        assert_allclose(float(ra[0]), wcs.ra_ref, atol=1e-9)
        assert_allclose(float(dec[0]), wcs.dec_ref, atol=1e-9)

    @pytest.mark.parametrize("code", CODES)
    def test_zenithal_limit(self, code):
        """theta_a = 90, eta = 0 degenerates the cone onto an azimuthal
        projection: COP=TAN, COE=ZEA, COD=ARC, COO=STG. Full pix2world
        comparison against the independently validated ZenithalWcs gates
        all four R(theta) laws and the native-pole solve at once."""
        from auromat_tpu.coordinates.wcs import (ConicWcs, ZenithalWcs,
                                                 pix2world)

        zcode = self.ZENITHAL_LIMIT[code]
        hc = self._header(code, theta_a=90.0, eta=0.0, crval=(30.0, 45.0),
                          LONPOLE=180.0)
        hz = TestZenithalProjections._header(zcode)
        hz.update({k: hc[k] for k in
                   ("CRVAL1", "CRVAL2", "CRPIX1", "CRPIX2", "CD1_1",
                    "CD1_2", "CD2_1", "CD2_2")})
        wc, wz = ConicWcs(hc), ZenithalWcs(hz)
        px, py = np.meshgrid(np.linspace(0, 200, 9),
                             np.linspace(0, 160, 9))
        ra_c, dec_c = map(np.asarray, pix2world(wc, px, py))
        ra_z, dec_z = map(np.asarray, pix2world(wz, px, py))
        dra = (ra_c - ra_z + 180.0) % 360.0 - 180.0
        assert np.abs(dra * np.cos(np.deg2rad(dec_z))).max() < 1e-9
        assert np.abs(dec_c - dec_z).max() < 1e-9

    @pytest.mark.parametrize("code", CODES)
    @pytest.mark.parametrize("theta_a,eta", [(45.0, 15.0), (-60.0, 8.0)])
    def test_standard_parallels_true_scale(self, code, theta_a, eta):
        """By construction every conic is true along BOTH standard
        parallels: the plane arc length R(theta_i) * C * dphi must equal
        the small-circle length cos(theta_i) * dphi. Uses only
        plane_from_native — independent of the pixel/inverse path."""
        from auromat_tpu.coordinates.wcs import ConicWcs

        wcs = ConicWcs(self._header(code, theta_a=theta_a, eta=eta))
        for th in (theta_a - eta, theta_a + eta):
            r = np.abs(float(wcs._r_from_theta(np.deg2rad(th))))
            assert_allclose(abs(wcs.C) * r * np.pi / 180.0,
                            np.cos(np.deg2rad(th)), rtol=1e-12)

    def test_cod_equidistant_meridians(self):
        """COD: great-circle distance between two pixels on the central
        native meridian equals their Delta-y exactly (independent
        spherical oracle via pix2world_cartesian, same class as the
        cylindrical graticule test)."""
        from auromat_tpu.coordinates.wcs import (ConicWcs,
                                                 pix2world_cartesian)

        s = 0.05
        h = {
            "CTYPE1": "RA---COD", "CTYPE2": "DEC--COD",
            "CRVAL1": 137.0, "CRVAL2": -52.0, "CRPIX1": 50.0,
            "CRPIX2": 40.0, "CD1_1": s, "CD1_2": 0.0, "CD2_1": 0.0,
            "CD2_2": s, "PV2_1": -52.0, "PV2_2": 12.0,
        }
        wcs = ConicWcs(h)
        px = np.full(3, wcs.px_ref - 1.0)  # x = 0: the native meridian
        py = np.array([5.0, 25.0, 65.0])
        v = np.array(pix2world_cartesian(wcs, px, py))
        v /= np.linalg.norm(v, axis=-1, keepdims=True)
        ang01 = np.rad2deg(np.arccos(np.clip(v[0] @ v[1], -1, 1)))
        ang02 = np.rad2deg(np.arccos(np.clip(v[0] @ v[2], -1, 1)))
        assert_allclose(ang01, 20.0 * s, atol=1e-9)
        assert_allclose(ang02, 60.0 * s, atol=1e-9)

    def test_coe_equal_area(self):
        """COE: the plane-to-sphere area ratio is the same at every
        latitude (finite-difference Jacobian of plane_from_native vs the
        spherical area element cos(theta))."""
        from auromat_tpu.coordinates.wcs import ConicWcs

        wcs = ConicWcs(self._header("COE", theta_a=45.0, eta=20.0))
        d = 1e-5
        ratios = []
        for th_deg in (-40.0, 0.0, 30.0, 60.0, 80.0):
            th = np.deg2rad(th_deg)
            x0, y0 = map(float, wcs.plane_from_native(0.1, th))
            x1, y1 = map(float, wcs.plane_from_native(0.1 + d, th))
            x2, y2 = map(float, wcs.plane_from_native(0.1, th + d))
            jac = abs((x1 - x0) * (y2 - y0) - (x2 - x0) * (y1 - y0))
            ratios.append(jac / (np.cos(th) * d * d))
        assert_allclose(ratios, ratios[0], rtol=1e-4)

    def test_coo_conformal(self):
        """COO (Lambert conformal): an orthonormal native frame maps to
        equal-length perpendicular plane vectors at every latitude."""
        from auromat_tpu.coordinates.wcs import ConicWcs

        wcs = ConicWcs(self._header("COO", theta_a=45.0, eta=20.0))
        d = 1e-6
        for th_deg in (-30.0, 10.0, 45.0, 75.0):
            th = np.deg2rad(th_deg)
            x0, y0 = map(float, wcs.plane_from_native(0.2, th))
            # native orthonormal step: (d/cos th) in phi ~ d in theta
            x1, y1 = map(float, wcs.plane_from_native(0.2 + d / np.cos(th),
                                                      th))
            x2, y2 = map(float, wcs.plane_from_native(0.2, th + d))
            u = np.array([x1 - x0, y1 - y0])
            w = np.array([x2 - x0, y2 - y0])
            assert_allclose(np.linalg.norm(u), np.linalg.norm(w),
                            rtol=1e-4)
            assert abs(u @ w) < 1e-4 * (u @ u)

    @pytest.mark.parametrize("code", CODES)
    def test_small_offset_matches_tan(self, code):
        """Near the fiducial of a TANGENT cone (eta = 0, scale true at
        theta_a) every conic agrees with the tangent plane to O(r^2);
        at r <= 0.005 deg the validated TAN path and the conic path must
        agree to ~1e-8 deg (gate 1e-6)."""
        from auromat_tpu.coordinates.wcs import (ConicWcs, TanWcs,
                                                 pix2world, tan_pix2world)

        hc = self._header(code, scale=0.0001, crval=(30.0, 45.0),
                          theta_a=45.0, eta=0.0)
        ht = TestCylindricalProjections._header("TAN", scale=0.0001)
        wc, wt = ConicWcs(hc), TanWcs(ht)
        px, py = np.meshgrid(
            np.linspace(80.0, 120.0, 9), np.linspace(60.0, 100.0, 9))
        ra_c, dec_c = pix2world(wc, px, py)
        ra_t, dec_t = tan_pix2world(wt, px, py)
        dra = (np.asarray(ra_c) - np.asarray(ra_t) + 180.0) % 360.0 - 180.0
        assert np.abs(dra * np.cos(np.deg2rad(np.asarray(dec_t)))).max() < 1e-6
        assert np.abs(np.asarray(dec_c) - np.asarray(dec_t)).max() < 1e-6

    def test_make_wcs_dispatch_and_validation(self):
        from auromat_tpu.coordinates.wcs import ConicWcs, make_wcs

        assert isinstance(make_wcs(self._header("COO", eta=5.0)), ConicWcs)
        msg = None
        with pytest.raises(ValueError, match="PV2_1") as ei:
            h = self._header("COP")
            del h["PV2_1"], h["PV2_2"]
            ConicWcs(h)
        msg = str(ei.value)
        assert "theta_a" in msg
        with pytest.raises(ValueError, match="cylinder"):
            ConicWcs(self._header("COD", theta_a=0.0))
        with pytest.raises(ValueError, match="standard parallels"):
            ConicWcs(self._header("COE", theta_a=80.0, eta=20.0))


class TestPseudoCylindricalProjections:
    """First-party pseudo-cylindrical family (SFL/PAR/MOL/AIT) — the
    all-sky projections the reference reaches via its astropy fallback
    (reference wcs.py:18-64). astropy is unavailable here; oracles are
    analytic: exact fiducial anchoring, closed-form meridional laws
    computed independently in plain numpy, the equal-area property (the
    defining invariant of all four), round-trips over the full map, and
    small-offset agreement with the validated TAN path."""

    CODES = ["SFL", "PAR", "MOL", "AIT"]

    @staticmethod
    def _header(code, scale=0.01, crval=(30.0, 45.0), **extra):
        h = {
            "CTYPE1": f"RA---{code}", "CTYPE2": f"DEC--{code}",
            "CRVAL1": crval[0], "CRVAL2": crval[1],
            "CRPIX1": 100.5, "CRPIX2": 80.25,
            "CD1_1": scale * 0.9, "CD1_2": scale * 0.3,
            "CD2_1": -scale * 0.2, "CD2_2": scale * 1.1,
            "IMAGEW": 200, "IMAGEH": 160,
        }
        h.update(extra)
        return h

    @pytest.mark.parametrize("code", CODES)
    @pytest.mark.parametrize("crval", [(30.0, 45.0), (210.0, -37.5),
                                       (0.0, 0.0)])
    def test_roundtrip(self, code, crval):
        from auromat_tpu.coordinates.wcs import (PseudoCylindricalWcs,
                                                 pix2world, world2pix)

        wcs = PseudoCylindricalWcs(self._header(code, crval=crval))
        px, py = np.meshgrid(np.arange(0, 200, 13, dtype=np.float64),
                             np.arange(0, 160, 11, dtype=np.float64))
        ra, dec = pix2world(wcs, px, py)
        bx, by = world2pix(wcs, ra, dec)
        assert not np.isnan(np.asarray(bx)).any()
        assert_allclose(np.asarray(bx), px, atol=1e-7)
        assert_allclose(np.asarray(by), py, atol=1e-7)

    @pytest.mark.parametrize("code", CODES)
    @pytest.mark.parametrize("lonpole", [None, 30.0])
    def test_fiducial_maps_to_crval(self, code, lonpole):
        from auromat_tpu.coordinates.wcs import (PseudoCylindricalWcs,
                                                 pix2world)

        extra = {} if lonpole is None else {"LONPOLE": lonpole}
        wcs = PseudoCylindricalWcs(self._header(code, **extra))
        ra, dec = pix2world(wcs, np.array([wcs.px_ref]),
                            np.array([wcs.py_ref]), origin=1)
        assert_allclose(float(ra[0]), wcs.ra_ref, atol=1e-9)
        assert_allclose(float(dec[0]), wcs.dec_ref, atol=1e-9)

    @pytest.mark.parametrize("code", CODES)
    def test_meridional_law_analytic(self, code):
        """theta(y) along the central meridian (x = 0), computed
        independently with plain numpy (FITS Paper II section 5.4):
        SFL theta = y; PAR theta = 3 asin(y/180); MOL y = sqrt(2) (180/pi)
        sin(gamma) with 2 gamma + sin 2 gamma = pi sin theta (verified in
        the forward direction through the transcendental residual);
        AIT theta = asin(Y Z) at X = 0."""
        from auromat_tpu.coordinates.wcs import (PseudoCylindricalWcs,
                                                 pix2world)

        h = {
            "CTYPE1": f"RA---{code}", "CTYPE2": f"DEC--{code}",
            "CRVAL1": 0.0, "CRVAL2": 0.0, "CRPIX1": 1.0, "CRPIX2": 1.0,
            "CD1_1": 1.0, "CD1_2": 0.0, "CD2_1": 0.0, "CD2_2": 1.0,
        }
        wcs = PseudoCylindricalWcs(h)
        y = np.array([0.0, 10.0, -25.0, 60.0])
        ra, dec = pix2world(wcs, np.zeros_like(y), y, origin=0)
        dec = np.asarray(dec)
        yr = np.deg2rad(y)
        if code == "SFL":
            assert_allclose(dec, y, atol=1e-9)
        elif code == "PAR":
            assert_allclose(dec, np.rad2deg(3 * np.arcsin(y / 180.0)),
                            atol=1e-9)
        elif code == "MOL":
            g = np.arcsin(y * np.pi / (180.0 * np.sqrt(2.0)))
            assert_allclose(np.pi * np.sin(np.deg2rad(dec)),
                            2 * g + np.sin(2 * g), atol=1e-12)
        else:  # AIT
            z = np.sqrt(1.0 - (yr / 2.0) ** 2)
            assert_allclose(dec, np.rad2deg(np.arcsin(yr * z)), atol=1e-9)
        assert_allclose(np.asarray(ra) % 360.0, 0.0, atol=1e-9)

    @pytest.mark.parametrize("code", CODES)
    def test_equal_area(self, code):
        """All four are equal-area (SFL/PAR/MOL exactly; AIT is Hammer,
        also exact): the plane-area/sphere-area Jacobian ratio
        |J| / cos(theta) must be the SAME constant (180/pi)^2 everywhere
        on the map — a non-circular oracle computed by finite differences
        on the forward map."""
        from auromat_tpu.coordinates.wcs import PseudoCylindricalWcs

        wcs = PseudoCylindricalWcs(self._header(code))
        rng = np.random.default_rng(42)
        phi = rng.uniform(-0.9 * np.pi, 0.9 * np.pi, 300)
        th = rng.uniform(-1.45, 1.45, 300)
        e = 1e-6
        x0, y0 = (np.asarray(a) for a in wcs.plane_from_native(phi, th))
        x1, y1 = (np.asarray(a) for a in wcs.plane_from_native(phi + e, th))
        x2, y2 = (np.asarray(a) for a in wcs.plane_from_native(phi, th + e))
        jac = np.abs((x1 - x0) * (y2 - y0) - (x2 - x0) * (y1 - y0)) / e**2
        ratio = jac / np.cos(th)
        # SFL/MOL/AIT have unit area scale, (180/pi)^2 per steradian; the
        # FITS PAR definition (y = 180 sin(theta/3)) carries an extra
        # meridional pi/3 (its fiducial y-scale is 60 deg/rad, not 180/pi)
        expect = (180.0 / np.pi) ** 2 if code != "PAR" else (180.0 / np.pi) * 60.0
        assert_allclose(ratio, expect, rtol=5e-4)

    @pytest.mark.parametrize("code", ["SFL", "AIT"])
    def test_small_offset_matches_tan(self, code):
        """SFL and AIT have a unit, isotropic scale at the fiducial, so
        near it they agree with the tangent plane to O(r^3) (gate 1e-6
        deg at r <= 0.05 deg). PAR/MOL are equal-area with ANISOTROPIC
        fiducial scales (PAR y: pi/3; MOL x: 2 sqrt(2)/pi, y: pi
        sqrt(2)/4) and are pinned by test_fiducial_scale instead."""
        from auromat_tpu.coordinates.wcs import (PseudoCylindricalWcs,
                                                 TanWcs, pix2world,
                                                 tan_pix2world)

        hp = self._header(code, scale=0.001)
        ht = self._header("TAN", scale=0.001)
        wp, wt = PseudoCylindricalWcs(hp), TanWcs(ht)
        px, py = np.meshgrid(
            np.linspace(80.0, 120.0, 9), np.linspace(60.0, 100.0, 9))
        ra_p, dec_p = pix2world(wp, px, py)
        ra_t, dec_t = tan_pix2world(wt, px, py)
        dra = (np.asarray(ra_p) - np.asarray(ra_t) + 180.0) % 360.0 - 180.0
        assert np.abs(dra * np.cos(np.deg2rad(np.asarray(dec_t)))).max() < 1e-6
        assert np.abs(np.asarray(dec_p) - np.asarray(dec_t)).max() < 1e-6

    @pytest.mark.parametrize("code,sx,sy", [
        ("SFL", 1.0, 1.0),
        ("PAR", 1.0, np.pi / 3.0),
        ("MOL", 2.0 * np.sqrt(2.0) / np.pi, np.pi * np.sqrt(2.0) / 4.0),
        ("AIT", 1.0, 1.0),
    ])
    def test_fiducial_scale(self, code, sx, sy):
        """The local linearization at the fiducial is diag(sx, sy) in
        (phi, theta) — the documented Paper II scales (sx*sy = 1 for the
        equal-area members; PAR's meridional pi/3 comes straight from
        y = 180 sin(theta/3))."""
        from auromat_tpu.coordinates.wcs import PseudoCylindricalWcs

        h = {
            "CTYPE1": f"RA---{code}", "CTYPE2": f"DEC--{code}",
            "CRVAL1": 0.0, "CRVAL2": 0.0, "CRPIX1": 1.0, "CRPIX2": 1.0,
            "CD1_1": 1.0, "CD1_2": 0.0, "CD2_1": 0.0, "CD2_2": 1.0,
        }
        wcs = PseudoCylindricalWcs(h)
        e = 1e-7
        x0, y0 = (float(np.asarray(a))
                  for a in wcs.plane_from_native(0.0, 0.0))
        x1, y1 = (float(np.asarray(a))
                  for a in wcs.plane_from_native(e, 0.0))
        x2, y2 = (float(np.asarray(a))
                  for a in wcs.plane_from_native(0.0, e))
        deg = 180.0 / np.pi
        assert_allclose((x1 - x0) / e / deg, sx, atol=1e-6)
        assert_allclose((y2 - y0) / e / deg, sy, atol=1e-6)
        assert abs(x2 - x0) < 1e-12 and abs(y1 - y0) < 1e-12

    def test_out_of_map_is_nan(self):
        """Points outside the map boundary must come back NaN, not
        mirrored: MOL beyond the rim ellipse, AIT outside the principal
        ellipse, SFL/PAR beyond |theta| = 90."""
        from auromat_tpu.coordinates.wcs import PseudoCylindricalWcs

        h = {
            "CTYPE1": "RA---MOL", "CTYPE2": "DEC--MOL",
            "CRVAL1": 0.0, "CRVAL2": 0.0, "CRPIX1": 1.0, "CRPIX2": 1.0,
            "CD1_1": 1.0, "CD1_2": 0.0, "CD2_1": 0.0, "CD2_2": 1.0,
        }
        for code, x, y in [("MOL", 0.0, 115.0), ("AIT", 250.0, 0.0),
                           ("SFL", 0.0, 95.0), ("PAR", 0.0, 95.0)]:
            h2 = {**h, "CTYPE1": f"RA---{code}", "CTYPE2": f"DEC--{code}"}
            wcs = PseudoCylindricalWcs(h2)
            phi, theta = wcs.native_from_plane(np.array([x]), np.array([y]))
            assert np.isnan(np.asarray(theta)).all(), (code, theta)

    def test_make_wcs_dispatch(self):
        from auromat_tpu.coordinates.wcs import (PseudoCylindricalWcs,
                                                 make_wcs)

        assert isinstance(make_wcs(self._header("AIT")),
                          PseudoCylindricalWcs)
        with pytest.raises(NotImplementedError, match="SFL"):
            make_wcs(self._header("CSC"))


class TestFullProjectionCoverage:
    """The remaining FITS Paper II projections — zenithal completion
    (AZP/SZP/ZPN/AIR), cylindrical perspective (CYP), pseudo-conic
    (BON/PCO), quad-cube (TSC/QSC) and HEALPix (HPX) — which the
    reference reaches only through its astropy fallback (reference
    wcs.py:18-64). Gates: round-trips, cross-family limit oracles
    (AZP(0)=TAN, AZP(1)=STG, AZP(inf)->SIN, SZP(mu,0,90)=AZP(mu),
    ZPN(P1=1)=ARC, CYP(mu->inf)->CEA, BON(theta1->0)->SFL), independent
    formula oracles (AIR radial law, CYP y-law, PCO parallel arcs, TSC
    per-face gnomonic law), exact equal-area Jacobians for the two
    equal-area members (QSC = 48600/4pi, BON = (180/pi)^2 per steradian)
    and HPX zone continuity."""

    @staticmethod
    def _header(code, scale=0.01, **pv):
        h = {
            "CTYPE1": f"RA---{code}", "CTYPE2": f"DEC--{code}",
            "CRVAL1": 30.0, "CRVAL2": 45.0,
            "CRPIX1": 100.5, "CRPIX2": 80.25,
            "CD1_1": scale * 0.9, "CD1_2": scale * 0.3,
            "CD2_1": -scale * 0.2, "CD2_2": scale * 1.1,
            "IMAGEW": 200, "IMAGEH": 160,
        }
        h.update(pv)
        return h

    @staticmethod
    def _grid():
        return np.meshgrid(np.arange(0, 200, 13, dtype=np.float64),
                           np.arange(0, 160, 11, dtype=np.float64))

    @pytest.mark.parametrize("code,pv", [
        ("AZP", {"PV2_1": 2.0, "PV2_2": 30.0}),
        ("AZP", {"PV2_1": 0.5, "PV2_2": -20.0}),
        ("SZP", {"PV2_1": 2.0, "PV2_2": 30.0, "PV2_3": 60.0}),
        ("ZPN", {"PV2_1": 1.0, "PV2_3": 0.1}),
        ("AIR", {"PV2_1": 45.0}),
        ("CYP", {"PV2_1": 1.0, "PV2_2": 0.7}),
        ("BON", {"PV2_1": 45.0}),
        ("BON", {"PV2_1": -30.0}),
        ("BON", {"PV2_1": 90.0}),  # Werner
        ("PCO", {}),
        ("TSC", {}),
        ("QSC", {}),
        ("HPX", {}),
        ("XPH", {}),
    ])
    def test_roundtrip(self, code, pv):
        from auromat_tpu.coordinates.wcs import (make_wcs, pix2world,
                                                 world2pix)

        wcs = make_wcs(self._header(code, **pv))
        px, py = self._grid()
        ra, dec = pix2world(wcs, px, py)
        bx, by = world2pix(wcs, np.asarray(ra), np.asarray(dec))
        assert not np.isnan(np.asarray(bx)).any()
        assert_allclose(np.asarray(bx), px, atol=2e-7)
        assert_allclose(np.asarray(by), py, atol=2e-7)

    @pytest.mark.parametrize("code", ["TSC", "QSC", "HPX", "XPH"])
    def test_allsky_sky_fixpoint(self, code):
        """At a 1.7 deg/px scale the grid spans multiple cube faces /
        HEALPix zones; world2pix may land on a different (equivalent)
        copy of the plane, so the gate is the sky-level fixpoint
        pix2world(world2pix(sky)) == sky."""
        from auromat_tpu.coordinates.wcs import (make_wcs, pix2world,
                                                 world2pix)

        wcs = make_wcs(self._header(code, scale=1.7))
        px, py = self._grid()
        ra, dec = pix2world(wcs, px, py)
        m = ~np.isnan(np.asarray(ra))
        assert m.sum() > 80  # a healthy share of the grid is on-map
        bx, by = world2pix(wcs, np.asarray(ra), np.asarray(dec))
        ra2, dec2 = pix2world(wcs, np.asarray(bx), np.asarray(by))
        dra = (np.asarray(ra2) - np.asarray(ra) + 180.0) % 360.0 - 180.0
        ddec = np.asarray(dec2) - np.asarray(dec)
        assert np.abs(dra[m]).max() < 1e-9
        assert np.abs(ddec[m]).max() < 1e-9

    @pytest.mark.parametrize("pva,codeb,pvb,tol", [
        ({"PV2_1": 0.0, "PV2_2": 0.0}, "TAN", {}, 1e-12),
        ({"PV2_1": 1.0, "PV2_2": 0.0}, "STG", {}, 1e-12),
        ({"PV2_1": 1e8, "PV2_2": 0.0}, "SIN", {}, 1e-5),
    ])
    def test_azp_limits(self, pva, codeb, pvb, tol):
        """AZP's mu parameter sweeps through the classic zenithal
        projections: mu=0 is gnomonic (projection from the centre), mu=1
        stereographic (from the antipode), mu->inf orthographic."""
        from auromat_tpu.coordinates.wcs import make_wcs, pix2world

        px, py = self._grid()
        ra_a, de_a = pix2world(make_wcs(self._header("AZP", **pva)), px, py)
        ra_b, de_b = pix2world(make_wcs(self._header(codeb, **pvb)), px, py)
        dra = (np.asarray(ra_a) - np.asarray(ra_b) + 180.0) % 360.0 - 180.0
        assert np.abs(dra).max() < tol
        assert np.abs(np.asarray(de_a) - np.asarray(de_b)).max() < tol

    def test_szp_reduces_to_azp(self):
        """theta_c = 90 puts the SZP projection point on the axis — the
        untilted AZP geometry exactly."""
        from auromat_tpu.coordinates.wcs import make_wcs, pix2world

        px, py = self._grid()
        ra_s, de_s = pix2world(make_wcs(self._header(
            "SZP", PV2_1=2.0, PV2_2=0.0, PV2_3=90.0)), px, py)
        ra_a, de_a = pix2world(make_wcs(self._header(
            "AZP", PV2_1=2.0, PV2_2=0.0)), px, py)
        assert_allclose(np.asarray(ra_s), np.asarray(ra_a), atol=1e-9)
        assert_allclose(np.asarray(de_s), np.asarray(de_a), atol=1e-9)

    def test_zpn_linear_is_arc(self):
        """ZPN with P1 = 1 and no other terms IS the equidistant ARC."""
        from auromat_tpu.coordinates.wcs import make_wcs, pix2world

        px, py = self._grid()
        ra_z, de_z = pix2world(make_wcs(self._header("ZPN", PV2_1=1.0)),
                               px, py)
        ra_a, de_a = pix2world(make_wcs(self._header("ARC")), px, py)
        assert_allclose(np.asarray(ra_z), np.asarray(ra_a), atol=1e-12)
        assert_allclose(np.asarray(de_z), np.asarray(de_a), atol=1e-12)

    def test_air_radial_law_independent(self):
        """AIR's R(theta) evaluated by plain numpy from the Paper II
        formula must match the angular distance from the reference
        direction (same oracle pattern as the ZEA/ARC/STG gate)."""
        from auromat_tpu.coordinates.wcs import (make_wcs,
                                                 pix2world_cartesian)

        wcs = make_wcs(self._header("AIR", PV2_1=60.0))
        px = np.array([139.5, 99.5, 29.5])
        py = np.array([79.25, 134.25, 49.25])
        dx, dy = px - (wcs.px_ref - 1), py - (wcs.py_ref - 1)
        x = wcs.cd[0, 0] * dx + wcs.cd[0, 1] * dy
        y = wcs.cd[1, 0] * dx + wcs.cd[1, 1] * dy
        r = np.hypot(x, y)
        v = np.asarray(pix2world_cartesian(wcs, px, py))
        ra0, dec0 = np.deg2rad(30.0), np.deg2rad(45.0)
        v0 = np.array([np.cos(dec0) * np.cos(ra0),
                       np.cos(dec0) * np.sin(ra0), np.sin(dec0)])
        xi = np.arccos(np.clip(v @ v0, -1, 1)) / 2.0  # = (90 - theta)/2
        xib = np.deg2rad(90.0 - 60.0) / 2.0
        c = np.log(np.cos(xib)) / np.tan(xib) ** 2
        r_expect = -2.0 * (180.0 / np.pi) * (
            np.log(np.cos(xi)) / np.tan(xi) + c * np.tan(xi))
        assert_allclose(r, r_expect, atol=1e-7)

    def test_cyp_y_law_and_cea_limit(self):
        """CYP's meridional law y = (180/pi)(mu+lam) sin th/(mu+cos th)
        against plain numpy, and the mu -> inf limit = Lambert CEA."""
        from auromat_tpu.coordinates.wcs import make_wcs, pix2world

        wcs = make_wcs(self._header("CYP", PV2_1=2.0, PV2_2=0.7))
        th = np.deg2rad(np.array([-60.0, -15.0, 30.0, 75.0]))
        x, y = (np.asarray(a) for a in
                wcs.plane_from_native(np.zeros_like(th), th))
        y_expect = (180.0 / np.pi) * 2.7 * np.sin(th) / (2.0 + np.cos(th))
        assert_allclose(y, y_expect, atol=1e-12)
        phi2, th2 = (np.asarray(a) for a in wcs.native_from_plane(x, y))
        assert_allclose(th2, th, atol=1e-12)

        px, py = self._grid()
        ra_c, de_c = pix2world(make_wcs(self._header(
            "CYP", PV2_1=1e9, PV2_2=1.0)), px, py)
        ra_e, de_e = pix2world(make_wcs(self._header("CEA", PV2_1=1.0)),
                               px, py)
        dra = (np.asarray(ra_c) - np.asarray(ra_e) + 180.0) % 360.0 - 180.0
        assert np.abs(dra).max() < 1e-6
        assert np.abs(np.asarray(de_c) - np.asarray(de_e)).max() < 1e-6

    def test_bon_small_parallel_approaches_sfl(self):
        """theta_1 -> 0 degenerates Bonne into the sinusoidal (Paper II
        section 5.5.1); at theta_1 = 0.05 deg they agree to ~1e-5."""
        from auromat_tpu.coordinates.wcs import make_wcs, pix2world

        px, py = self._grid()
        ra_b, de_b = pix2world(make_wcs(self._header("BON", PV2_1=0.05)),
                               px, py)
        ra_s, de_s = pix2world(make_wcs(self._header("SFL")), px, py)
        dra = (np.asarray(ra_b) - np.asarray(ra_s) + 180.0) % 360.0 - 180.0
        assert np.abs(dra).max() < 1e-4
        assert np.abs(np.asarray(de_b) - np.asarray(de_s)).max() < 1e-4

    def test_pco_parallel_arcs(self):
        """Each PCO parallel is a circular arc of radius (180/pi) cot th
        centred on (0, theta + (180/pi) cot th), true-scale along the
        central meridian (x=0 -> y = theta) — checked by plain numpy."""
        from auromat_tpu.coordinates.wcs import make_wcs

        wcs = make_wcs(self._header("PCO"))
        deg = 180.0 / np.pi
        for th_deg in (-55.0, 20.0, 70.0):
            th = np.deg2rad(th_deg)
            phi = np.deg2rad(np.array([-120.0, -30.0, 0.0, 45.0, 150.0]))
            x, y = (np.asarray(a) for a in
                    wcs.plane_from_native(phi, np.full_like(phi, th)))
            cot = deg / np.tan(th)
            assert_allclose(np.hypot(x, th_deg + cot - y), abs(cot),
                            rtol=1e-12)
            assert abs(x[2]) < 1e-12 and abs(y[2] - th_deg) < 1e-12

    def test_tsc_gnomonic_per_face(self):
        """On the equatorial face 1, TSC is x = 45 tan(phi) — the
        gnomonic law; face centres land exactly on the plane face
        centres (0,0), (90,0), (180,0), (270,0), (0,+-90)."""
        from auromat_tpu.coordinates.wcs import make_wcs

        wcs = make_wcs(self._header("TSC"))
        phi = np.deg2rad(np.array([-30.0, 10.0, 44.0]))
        x, y = (np.asarray(a) for a in
                wcs.plane_from_native(phi, np.zeros_like(phi)))
        assert_allclose(x, 45.0 * np.tan(phi) / np.tan(np.pi / 4),
                        atol=1e-12)
        assert_allclose(y, 0.0, atol=1e-12)
        cphi = np.deg2rad(np.array([0.0, 90.0, 180.0, 270.0, 0.0, 0.0]))
        cth = np.deg2rad(np.array([0.0, 0.0, 0.0, 0.0, 90.0, -90.0]))
        x, y = (np.asarray(a) for a in wcs.plane_from_native(cphi, cth))
        assert_allclose(x, [0.0, 90.0, 180.0, 270.0, 0.0, 0.0],
                        atol=1e-12)
        assert_allclose(y, [0.0, 0.0, 0.0, 0.0, 90.0, -90.0], atol=1e-12)

    @pytest.mark.parametrize("code,pv,const", [
        ("QSC", {}, 48600.0 / (4.0 * np.pi)),
        ("BON", {"PV2_1": 45.0}, (180.0 / np.pi) ** 2),
    ])
    def test_equal_area_exact_constant(self, code, pv, const):
        """QSC and BON are exactly equal-area with known constants: the
        whole sphere's 4 pi sr fill the cube's 6x90x90 deg^2 (QSC), and
        Bonne preserves the unit sphere's area element (180/pi)^2
        deg^2/sr. The numeric Jacobian d(x,y)/d(phi, sin theta) must hit
        the constant everywhere."""
        from auromat_tpu.coordinates.wcs import make_wcs

        wcs = make_wcs(self._header(code, **pv))
        rng = np.random.default_rng(7)
        phi = rng.uniform(-0.7, 0.7, 400)
        th = rng.uniform(-0.6, 0.6, 400)
        eps = 1e-6

        def plane(p, t):
            return [np.asarray(v) for v in wcs.plane_from_native(p, t)]

        x0, y0 = plane(phi, th)
        x1, y1 = plane(phi + eps, th)
        x2, y2 = plane(phi, th + eps)
        jac = ((x1 - x0) * (y2 - y0) - (y1 - y0) * (x2 - x0)) \
            / (eps * eps) / np.cos(th)
        assert_allclose(jac, const, rtol=1e-4)

    def test_hpx_zone_continuity_and_equatorial_law(self):
        """The equatorial law y = (90 K/H) sin(theta) (plain numpy) and
        continuity of (x, y) across the |sin theta| = (K-1)/K zone
        boundary."""
        from auromat_tpu.coordinates.wcs import make_wcs

        wcs = make_wcs(self._header("HPX"))
        th = np.deg2rad(np.array([-40.0, -10.0, 25.0, 41.0]))
        x, y = (np.asarray(a) for a in
                wcs.plane_from_native(np.full_like(th, 0.3), th))
        assert_allclose(y, 67.5 * np.sin(th), atol=1e-12)
        assert_allclose(x, np.rad2deg(0.3), atol=1e-12)
        thb = np.arcsin(2.0 / 3.0)
        lo = [np.asarray(v) for v in
              wcs.plane_from_native(np.array([0.3]), np.array([thb - 1e-9]))]
        hi = [np.asarray(v) for v in
              wcs.plane_from_native(np.array([0.3]), np.array([thb + 1e-9]))]
        assert abs(float(lo[0][0]) - float(hi[0][0])) < 1e-6
        assert abs(float(lo[1][0]) - float(hi[1][0])) < 1e-6

    def test_xph_butterfly_geometry_and_hpx_congruence(self):
        """XPH is the HPX (H=4, K=3) map rearranged per wing by a rigid
        motion: translate the north-pole apex of the facet column to the
        origin, rotate by the wing's central meridian phi_c = 90 m - 135
        (the zenithal azimuth rule with phi quantized to phi_c). Gates:
        (a) exact congruence with the independently validated
        :class:`HealpixWcs` under that motion, (b) the pole at the
        origin, the equator at radius 90 on wing centres, the south
        poles at (+-180/sqrt2, +-180/sqrt2), (c) the equal-area Jacobian
        67.5 deg^2 per (phi_deg, sin theta) everywhere off the zone
        boundary."""
        from auromat_tpu.coordinates.wcs import make_wcs

        w = make_wcs(self._header("XPH"))
        hh = self._header("HPX")
        hh["CRVAL2"] = 0.0  # HPX fiducial is (0, 0)
        hp = make_wcs(hh)

        rng = np.random.default_rng(7)
        phi = np.deg2rad(rng.uniform(-179.9, 179.9, 4000))
        th = np.deg2rad(rng.uniform(-89.9, 89.9, 4000))
        x, y = (np.asarray(a) for a in w.plane_from_native(phi, th))
        X, Y = (np.asarray(a) for a in hp.plane_from_native(phi, th))
        pd = (np.rad2deg(phi) + 180.0) % 360.0 - 180.0
        phic = 90.0 * np.clip(np.floor((pd + 180.0) / 90.0), 0, 3) - 135.0
        u, v = X - phic, Y - 90.0
        c, s = np.cos(np.deg2rad(phic)), np.sin(np.deg2rad(phic))
        assert_allclose(u * c - v * s, x, atol=1e-11)
        assert_allclose(u * s + v * c, y, atol=1e-11)

        # (b) checkpoints
        p0 = [np.asarray(a) for a in
              w.plane_from_native(np.array([0.0]), np.array([np.pi / 2]))]
        assert_allclose(np.hypot(p0[0], p0[1]), 0.0, atol=1e-12)
        t = 180.0 / np.sqrt(2.0)
        for pc, sx, sy in [(-135.0, -1, 1), (-45.0, -1, -1),
                           (45.0, 1, -1), (135.0, 1, 1)]:
            xe, ye = (np.asarray(a) for a in w.plane_from_native(
                np.deg2rad(np.array([pc])), np.array([0.0])))
            assert_allclose(np.hypot(xe, ye), 90.0, atol=1e-12)
            xs, ys = (np.asarray(a) for a in w.plane_from_native(
                np.deg2rad(np.array([pc])), np.array([-np.pi / 2])))
            assert_allclose([xs[0], ys[0]], [sx * t, sy * t], atol=1e-12)

        # (c) equal-area Jacobian in (phi_deg, z = sin theta)
        eps = 1e-6
        pdeg = rng.uniform(-179.0, 179.0, 1500)
        z = rng.uniform(-0.99, 0.99, 1500)
        keep = np.abs(np.abs(z) - 2.0 / 3.0) > 1e-3
        pdeg, z = pdeg[keep], z[keep]

        def fwd(p, zz):
            a, b = w.plane_from_native(np.deg2rad(p), np.arcsin(zz))
            return np.asarray(a), np.asarray(b)

        x1, y1 = fwd(pdeg, z)
        x2, y2 = fwd(pdeg + eps, z)
        x3, y3 = fwd(pdeg, z + eps)
        jac = np.abs((x2 - x1) * (y3 - y1) - (x3 - x1) * (y2 - y1)) / eps**2
        assert_allclose(jac, 67.5, rtol=1e-3)

    def test_out_of_map_is_nan(self):
        """Polar gores (HPX), off-cross plane regions (quad-cube), and
        radii beyond the monotone range (ZPN/AIR) must yield NaN."""
        from auromat_tpu.coordinates.wcs import make_wcs

        for code, pv, x, y in [
            ("HPX", {}, np.array([10.0]), np.array([80.0])),
            # +x axis: the wings meet only out to 90/sqrt(2) ~ 63.6 (the
            # polar-facet edges); beyond is the gore / past the tips
            ("XPH", {}, np.array([100.0, 300.0]), np.array([0.0, 0.0])),
            ("TSC", {}, np.array([135.0]), np.array([80.0])),
            # the equatorial band wraps (face 4 may be drawn at -90), so
            # off-cross means off the polar column with |y| > 45
            ("QSC", {}, np.array([-130.0]), np.array([60.0])),
            ("ZPN", {"PV2_1": 1.0, "PV2_2": -0.3}, np.array([200.0]),
             np.array([0.0])),
        ]:
            wcs = make_wcs(self._header(code, **pv))
            phi, theta = wcs.native_from_plane(x, y)
            assert np.isnan(np.asarray(theta)).all(), (code, theta)

    @staticmethod
    def _unit(ra_deg, dec_deg):
        ra, dec = np.deg2rad(ra_deg), np.deg2rad(dec_deg)
        return np.array([np.cos(dec) * np.cos(ra),
                         np.cos(dec) * np.sin(ra), np.sin(dec)])

    @pytest.mark.parametrize("code", ["CAR", "AIT", "HPX", "QSC"])
    def test_native_pole_southern_branch(self, code):
        """Paper II's +- native-pole roots live mod 360: for CRVAL2=-30,
        LONPOLE=180 the roots are 60 and 300 == -60 deg; LATPOLE must be
        able to select EITHER (the -60 branch was unreachable before the
        wrap fix — candidates outside [-90, 90] were discarded instead
        of wrapped). rotmat's third column is the celestial unit vector
        of the native pole (alpha_p, delta_p)."""
        from auromat_tpu.coordinates.wcs import make_wcs, pix2world, \
            world2pix

        h = self._header(code, CRVAL2=-30.0, LONPOLE=180.0, LATPOLE=-60.0)
        w = make_wcs(h)
        # delta_p = -60: alpha_p = ra0 - atan2(0, -sin dp cos phip) =
        # ra0 - 180
        assert_allclose(w.rotmat[:, 2], self._unit(30.0 - 180.0, -60.0),
                        atol=1e-12)
        hn = self._header(code, CRVAL2=-30.0, LONPOLE=180.0, LATPOLE=60.0)
        wn = make_wcs(hn)
        assert_allclose(wn.rotmat[:, 2], self._unit(30.0, 60.0),
                        atol=1e-12)
        # both obliques still invert exactly
        px, py = self._grid()
        ra, dec = pix2world(w, px, py)
        bx, by = world2pix(w, np.asarray(ra), np.asarray(dec))
        m = ~np.isnan(np.asarray(bx))
        assert m.any()
        assert_allclose(np.asarray(bx)[m], px[m], atol=2e-7)
        assert_allclose(np.asarray(by)[m], py[m], atol=2e-7)

    def test_native_pole_tie_breaks_northerly(self):
        """LATPOLE exactly equidistant from both roots (here -60 and
        +60 with LATPOLE=0): Paper II takes the more NORTHERLY root."""
        from auromat_tpu.coordinates.wcs import make_wcs

        h = self._header("CAR", CRVAL2=-30.0, LONPOLE=180.0, LATPOLE=0.0)
        w = make_wcs(h)
        assert_allclose(w.rotmat[:, 2], self._unit(30.0, 60.0),
                        atol=1e-12)

    @pytest.mark.parametrize("code", ["CAR", "AIT", "BON"])
    def test_native_pole_degenerate_lonpole(self, code):
        """theta0=0 with LONPOLE=+-90 leaves delta_p unconstrained (the
        constraint degenerates to sin(dec0)=0): Paper II says the
        LATPOLE card supplies delta_p directly. Before the fix this
        either raised (generic solve) or silently forced delta_p=+-90
        (cylindrical)."""
        from auromat_tpu.coordinates.wcs import make_wcs, pix2world, \
            world2pix

        pv = {"PV2_1": 45.0} if code == "BON" else {}
        h = self._header(code, CRVAL2=0.0, LONPOLE=90.0, LATPOLE=30.0,
                         **pv)
        w = make_wcs(h)
        # alpha_p = ra0 - atan2(sin phip, -sin dp * 0) = ra0 - 90
        assert_allclose(w.rotmat[:, 2], self._unit(30.0 - 90.0, 30.0),
                        atol=1e-12)
        px, py = self._grid()
        ra, dec = pix2world(w, px, py)
        bx, by = world2pix(w, np.asarray(ra), np.asarray(dec))
        m = ~np.isnan(np.asarray(bx))
        assert m.any()
        assert_allclose(np.asarray(bx)[m], px[m], atol=2e-7)
        assert_allclose(np.asarray(by)[m], py[m], atol=2e-7)
        # CRVAL2 != 0 genuinely has no solution there
        with pytest.raises(ValueError, match="native pole"):
            make_wcs(self._header(code, CRVAL2=10.0, LONPOLE=90.0, **pv))

    def test_pc_cdelt_and_crota_spellings(self):
        """The linear matrix in its three FITS spellings must parse
        identically: CD directly, PC x CDELT, and legacy CROTA2 + CDELT
        (astrometry.net writes CD; other producers write the rest —
        the reference read them through astropy)."""
        from auromat_tpu.coordinates.wcs import make_wcs, pix2world

        h_cd = self._header("ZEA")
        px, py = self._grid()
        ra0, de0 = (np.asarray(a) for a in pix2world(make_wcs(h_cd),
                                                     px, py))
        # PC x CDELT: CD = diag(CDELT) @ PC
        h_pc = {k: v for k, v in h_cd.items()
                if not k.startswith("CD")}
        h_pc.update({"CDELT1": 0.01, "CDELT2": 0.02,
                     "PC1_1": 0.9, "PC1_2": 0.3,
                     "PC2_1": -0.1, "PC2_2": 0.55})
        h_cd2 = dict(h_pc)
        h_cd2.update({"CD1_1": 0.009, "CD1_2": 0.003,
                      "CD2_1": -0.002, "CD2_2": 0.011})
        ra_p, de_p = (np.asarray(a) for a in
                      pix2world(make_wcs(h_pc), px, py))
        assert_allclose(ra_p, ra0, atol=1e-12)
        assert_allclose(de_p, de0, atol=1e-12)
        # CD wins when both are present
        ra_b, de_b = (np.asarray(a) for a in
                      pix2world(make_wcs(h_cd2), px, py))
        assert_allclose(ra_b, ra0, atol=1e-12)
        # legacy CROTA2: CD = [[d1 c, -d2 s], [d1 s, d2 c]]
        h_rot = {k: v for k, v in h_cd.items()
                 if not k.startswith("CD")}
        h_rot.update({"CDELT1": 0.01, "CDELT2": 0.012, "CROTA2": 25.0})
        w = make_wcs(h_rot)
        r = np.deg2rad(25.0)
        assert_allclose(
            w.cd,
            [[0.01 * np.cos(r), -0.012 * np.sin(r)],
             [0.01 * np.sin(r), 0.012 * np.cos(r)]], atol=1e-15)

    def test_galactic_axis_pair(self):
        """GLON-xxx/GLAT-xxx pairs parse for the generic families (the
        math is frame-agnostic; outputs are in the header's own lon/lat
        system); mismatched pairs are refused."""
        from auromat_tpu.coordinates.wcs import make_wcs, pix2world, \
            world2pix

        h = self._header("AIT")
        h["CTYPE1"], h["CTYPE2"] = "GLON-AIT", "GLAT-AIT"
        w = make_wcs(h)
        px, py = self._grid()
        lon, lat = pix2world(w, px, py)
        bx, by = world2pix(w, np.asarray(lon), np.asarray(lat))
        assert_allclose(np.asarray(bx), px, atol=2e-7)
        assert_allclose(np.asarray(by), py, atol=2e-7)
        bad = dict(h)
        bad["CTYPE2"] = "ELAT-AIT"  # mismatched system
        with pytest.raises((ValueError, NotImplementedError)):
            make_wcs(bad)

    def test_make_wcs_dispatch_and_validation(self):
        from auromat_tpu.coordinates.wcs import (GeneralZenithalWcs,
                                                 HealpixWcs,
                                                 PseudoConicWcs,
                                                 QuadCubeWcs, XphWcs,
                                                 make_wcs)

        assert isinstance(make_wcs(self._header("AZP")),
                          GeneralZenithalWcs)
        assert isinstance(make_wcs(self._header("BON", PV2_1=30.0)),
                          PseudoConicWcs)
        assert isinstance(make_wcs(self._header("QSC")), QuadCubeWcs)
        assert isinstance(make_wcs(self._header("HPX")), HealpixWcs)
        assert isinstance(make_wcs(self._header("XPH")), XphWcs)
        with pytest.raises(NotImplementedError, match="COBE"):
            make_wcs(self._header("CSC"))
        with pytest.raises(ValueError, match="PV2_1"):
            make_wcs(self._header("BON"))
        with pytest.raises(ValueError, match="gamma"):
            make_wcs(self._header("AZP", PV2_2=95.0))
        with pytest.raises(ValueError, match="increasing"):
            make_wcs(self._header("ZPN", PV2_1=-1.0))
        with pytest.raises(ValueError, match="lambda"):
            make_wcs(self._header("CYP", PV2_2=-1.0))
