"""Numeric-core parity tests.

Golden values for the frame chain are NASA SSCWeb CoordCalculator outputs for
lat=50, lon=-100, r=1 at 2012-01-25 09:26:55 (the same external oracle the
reference validates against, auromat/test/transform_test.py:85-129).
"""

import datetime

import numpy as np
import pytest
from numpy.testing import assert_allclose, assert_array_almost_equal

from auromat_tpu.coordinates import frames
from auromat_tpu.coordinates.transform import (
    cartesian_to_spherical,
    ecef_to_geodetic,
    geodetic_to_ecef,
    geodetic_to_ecef_zero,
    mlt_to_sm_lon,
    rotate_pole,
    sm_lon_to_mlt,
    sm_to_latlon,
    spherical_to_cartesian,
    wrap_longitude,
)
from auromat_tpu.timeutil import ephemeris_seconds, julian_date

DATE = datetime.datetime(2012, 1, 25, 9, 26, 55)
GEO = np.array([[-0.11, -0.63, 0.77]])
J2000 = np.array([[-0.62, 0.16, 0.77]])
GEI = np.array([[-0.62, 0.16, 0.77]])
GSE = np.array([[-0.72, -0.26, 0.64]])
GSM = np.array([[-0.72, -0.30, 0.62]])
SM = np.array([[-0.43, -0.30, 0.85]])


def _apply(mat, vecs):
    return (np.asarray(mat) @ np.asarray(vecs).T).T


class TestJulianDate:
    def test_j2000_epoch(self):
        assert julian_date(datetime.datetime(2000, 1, 1, 12)) == 2451545.0

    def test_known_date(self):
        # 1987-01-27 00:00 UT -> JD 2446822.5 (Meeus, Astronomical Algorithms)
        assert julian_date(datetime.datetime(1987, 1, 27)) == 2446822.5

    def test_fractional(self):
        jd = julian_date(datetime.datetime(2012, 1, 25, 9, 26, 55))
        assert abs(jd - (2455951.5 + (9 * 3600 + 26 * 60 + 55) / 86400.0)) < 1e-9


class TestSphericalCartesian:
    def test_roundtrip(self):
        rng = np.random.default_rng(0)
        x, y, z = rng.random((3, 20, 10))
        r, lat, lon = cartesian_to_spherical(x, y, z)
        xr, yr, zr = spherical_to_cartesian(r, lat, lon)
        assert_array_almost_equal(xr, x)
        assert_array_almost_equal(yr, y)
        assert_array_almost_equal(zr, z)

    def test_unit_radius(self):
        lat, lon = np.deg2rad(37.0), np.deg2rad(-122.0)
        x, y, z = spherical_to_cartesian(None, np.array(lat), np.array(lon))
        assert abs(x**2 + y**2 + z**2 - 1.0) < 1e-12


class TestGeodetic:
    def test_roundtrip_surface_11_decimals(self):
        lat, lon = np.mgrid[-89:89:5, -179:179:5]
        x, y, z = geodetic_to_ecef_zero(np.deg2rad(lat), np.deg2rad(lon))
        rlat, rlon = ecef_to_geodetic(x, y, z)
        assert_array_almost_equal(np.rad2deg(rlat), lat, 11)
        assert_array_almost_equal(np.rad2deg(rlon), lon, 11)

    def test_roundtrip_at_altitude(self):
        lat = np.deg2rad(np.linspace(-80, 80, 30))
        lon = np.deg2rad(np.linspace(-170, 170, 30))
        x, y, z = geodetic_to_ecef(lat, lon, 110.0)
        rlat, rlon = ecef_to_geodetic(x, y, z)
        # Bowring is a one-step method: exact at h=0, ~1e-9 deg at 110 km
        assert_allclose(np.rad2deg(rlat), np.rad2deg(lat), atol=1e-8)
        assert_allclose(np.rad2deg(rlon), np.rad2deg(lon), atol=1e-11)

    def test_equator_and_pole(self):
        x, y, z = geodetic_to_ecef_zero(np.array(0.0), np.array(0.0))
        assert_allclose([x, y, z], [6378.137, 0, 0], atol=1e-9)
        x, y, z = geodetic_to_ecef_zero(np.array(np.pi / 2), np.array(0.0))
        assert_allclose(float(z), 6356.752314245179, atol=1e-9)


class TestFrameChain:
    """SSCWeb golden values, 2-decimal tolerance (inputs given to 2 decimals)."""

    def test_gei_to_geo(self):
        et = ephemeris_seconds(DATE)
        assert_array_almost_equal(_apply(frames.mat_gei_to_geo(et), GEI), GEO, 2)

    def test_gei_to_gse(self):
        et = ephemeris_seconds(DATE)
        assert_array_almost_equal(_apply(frames.mat_gei_to_gse(et), GEI), GSE, 2)

    def test_gse_to_gsm(self):
        et = ephemeris_seconds(DATE)
        assert_array_almost_equal(_apply(frames.mat_gse_to_gsm(et), GSE), GSM, 2)

    def test_gsm_to_sm(self):
        et = ephemeris_seconds(DATE)
        assert_array_almost_equal(_apply(frames.mat_gsm_to_sm(et), GSM), SM, 2)

    def test_geo_to_gei_reverse(self):
        et = ephemeris_seconds(DATE)
        assert_array_almost_equal(_apply(frames.mat_gei_to_geo(et).T, GEO), GEI, 2)

    def test_j2000_to_geo(self):
        et = ephemeris_seconds(DATE)
        assert_array_almost_equal(_apply(frames.mat_j2000_to_geo(et), J2000), GEO, 2)

    def test_j2000_to_sm(self):
        et = ephemeris_seconds(DATE)
        assert_array_almost_equal(_apply(frames.mat_j2000_to_sm(et), J2000), SM, 2)

    def test_geo_to_sm(self):
        et = ephemeris_seconds(DATE)
        assert_array_almost_equal(_apply(frames.mat_geo_to_sm(et), GEO), SM, 2)

    def test_matrices_orthonormal(self):
        et = ephemeris_seconds(DATE)
        for mat in [
            frames.mat_precession(et),
            frames.mat_j2000_to_geo(et),
            frames.mat_j2000_to_sm(et),
            frames.mat_geo_to_sm(et),
        ]:
            assert_allclose(mat @ mat.T, np.eye(3), atol=1e-13)

    def test_chain_consistency(self):
        # geo_to_sm @ j2000_to_geo == j2000_to_sm
        fm = frames.FrameMatrices(DATE)
        assert_allclose(fm.geo_to_sm @ fm.j2000_to_geo, fm.j2000_to_sm, atol=1e-12)


class TestMLT:
    def test_sm_lon_mlt_roundtrip(self):
        lons = np.linspace(-180, 180, 50)
        assert_allclose(mlt_to_sm_lon(sm_lon_to_mlt(lons)), lons, atol=1e-12)

    def test_midnight_noon(self):
        assert sm_lon_to_mlt(0.0) == 12.0
        assert sm_lon_to_mlt(-180.0) == 0.0
        assert sm_lon_to_mlt(180.0) == 24.0


class TestRotatePole:
    def test_roundtrip(self):
        lats = np.deg2rad(np.linspace(60, 89, 20))
        lons = np.deg2rad(np.linspace(-170, 170, 20))
        rl, rn = rotate_pole(lats, lons, 110.0, angle_deg=90.0)
        bl, bn = rotate_pole(np.asarray(rl), np.asarray(rn), 110.0, angle_deg=-90.0)
        # not an exact involution: a rigid rotation does not preserve height
        # above the *ellipsoid*, so re-deriving geodetic coords introduces an
        # O(flattening * altitude-error) wobble (~1e-5 rad). The reference has
        # the identical property (auromat/coordinates/transform.py:301-322).
        assert_allclose(np.asarray(bl), lats, atol=5e-5)
        assert_allclose(np.asarray(bn), lons, atol=5e-5)

    def test_moves_pole_to_equator(self):
        # the north pole rotated by 90 deg about x lands at the equator
        lat, lon = rotate_pole(
            np.array([np.deg2rad(89.999)]), np.array([0.0]), 0.0, angle_deg=90.0
        )
        assert abs(np.rad2deg(float(lat[0]))) < 0.1


class TestSmToLatLon:
    def test_exact_roundtrip_at_altitude(self):
        """sm_to_latlon must invert geodetic->ECEF->SM-angles at the mapping
        altitude (the reference's own version does not: it evaluates Bowring
        at unit radius, transform.py:461-485 — fixed here)."""
        fm = frames.FrameMatrices(DATE)
        from auromat_tpu.coordinates.transform import geo_to_mlat_mlt

        lats = np.linspace(-60, 60, 5)
        lons = np.linspace(-150, 150, 5)
        for alt in (0.0, 110.0):
            x, y, z = geodetic_to_ecef(np.deg2rad(lats), np.deg2rad(lons), alt)
            geo = np.stack([x, y, z], axis=-1)
            mlat, mlt = geo_to_mlat_mlt(geo, fm.geo_to_sm)
            rlat, rlon = sm_to_latlon(
                np.asarray(mlat), mlt_to_sm_lon(np.asarray(mlt)), fm.sm_to_geo,
                altitude=alt,
            )
            assert_allclose(np.asarray(rlat), lats, atol=1e-9)
            assert_allclose(np.asarray(rlon), lons, atol=1e-9)


class TestWrapLongitude:
    def test_values(self):
        assert_allclose(
            np.asarray(wrap_longitude(np.array([0.0, 180.0, -180.0, 190.0, 359.0, -190.0]))),
            [0.0, -180.0, -180.0, -170.0, -1.0, 170.0],
        )


class TestGeomagneticPole:
    def test_pole_location_2010(self):
        # golden values from the reference implementation run on this exact
        # date (auromat.coordinates.transform.northGeomagneticPoleLocation):
        # lat=80.01637928066532, lon=5.022775463593746 rad (wrapped)
        lat, lon = frames.north_geomagnetic_pole_location(datetime.datetime(2010, 1, 1))
        assert abs(lat - 80.01637928066532) < 1e-9
        ref_lon = np.rad2deg(5.022775463593746) - 360.0
        assert abs(lon - ref_lon) < 1e-9
        # sanity vs the published IGRF-11 dipole pole (80.08 N, 72.21 W)
        assert abs(lat - 80.08) < 0.1
        assert abs(lon - (-72.21)) < 0.1
