"""Geodesic (Vincenty) tests against analytic WGS84 truths.

Offline-safe oracles:
* the WGS84 meridian quarter (equator -> pole) is 10_001_965.729 m
  (defining relationship of the original metre, exact to the mm here);
* the equator is a geodesic: arc length = a * delta_lambda;
* direct(inverse) must be the identity (round trip).

Reference component: auromat/coordinates/geodesic.py (geographiclib-backed).
"""

import numpy as np
import pytest

from auromat_tpu.constants import WGS84_A
from auromat_tpu.coordinates import geodesic as geo

L = geo.Location


class TestKnownArcs:
    def test_meridian_quarter(self):
        d = geo.distance(L(0.0, 12.0), L(90.0, 12.0))
        assert abs(d - 10001965.729) < 0.01

    def test_equator_arc(self):
        d = geo.distance(L(0.0, 10.0), L(0.0, 55.0))
        expected = WGS84_A * 1000.0 * np.deg2rad(45.0)
        assert abs(d - expected) < 0.01

    def test_symmetry(self):
        a, b = L(63.4, -110.2), L(48.1, -97.5)
        assert abs(geo.distance(a, b) - geo.distance(b, a)) < 1e-6

    def test_angular_distance_consistent(self):
        a, b = L(60.0, -100.0), L(61.0, -99.0)
        ang = geo.angular_distance(a, b)
        # angular distance ~ arc / mean radius, within the flattening
        approx = geo.distance(a, b) / (WGS84_A * 1000.0)
        assert abs(np.deg2rad(ang) - approx) < np.deg2rad(ang) * 0.01


class TestRoundTrips:
    @pytest.mark.parametrize("a, b", [
        (L(40.6, -73.8), L(51.5, -0.5)),     # transatlantic
        (L(-33.9, 18.4), L(35.7, 139.7)),    # Cape Town -> Tokyo
        (L(63.4, -110.2), L(64.0, -109.0)),  # short auroral-zone hop
    ])
    def test_direct_inverse_roundtrip(self, a, b):
        dist = geo.distance(a, b)
        azi = geo.course(a, b)
        end = geo.destination(a, azi, dist)
        assert abs(end.lat - b.lat) < 1e-8
        assert abs(((end.lon - b.lon) + 180) % 360 - 180) < 1e-8

    def test_intermediate_midpoint(self):
        a, b = L(50.0, -120.0), L(70.0, -80.0)
        mid = geo.intermediate(a, b, f=0.5)
        d1 = geo.distance(a, mid)
        d2 = geo.distance(mid, b)
        assert abs(d1 - d2) < 0.5  # metres

    def test_line_endpoints_and_monotonic(self):
        a, b = L(55.0, -110.0), L(62.0, -95.0)
        pts = np.asarray(geo.line(a, b, resolution=50000))
        assert abs(pts[0, 0] - a.lat) < 1e-9
        assert abs(pts[-1, 0] - b.lat) < 1e-6
        assert (np.diff(pts[:, 0]) > 0).all()


class TestPoleContainment:
    def test_circle_around_pole(self):
        lons = np.linspace(-180, 180, 72, endpoint=False)
        points = [L(80.0, float(lo)) for lo in lons]
        assert geo.contains_or_crosses_pole(points)

    def test_mid_latitude_loop(self):
        # a small loop far from the pole (unclosed: the checker closes it)
        t = np.linspace(0, 2 * np.pi, 72, endpoint=False)
        points = [L(55.0 + 3 * float(np.sin(x)), -100.0 + 5 * float(np.cos(x)))
                  for x in t]
        assert not geo.contains_or_crosses_pole(points)


class TestAntipodal:
    """Nearly-antipodal inverse: Vincenty's lambda iteration diverges there;
    the azimuth-shooting fallback must still return the minimal geodesic.

    Oracle: the DIRECT problem (which converges everywhere). A geodesic of
    length s slightly below the antipodal distance from p1 at azimuth a is
    minimal, so inverse(p1, direct(p1, a, s)) must return (s, a)."""

    def _roundtrip(self, lat1, lon1, azi1, s):
        from auromat_tpu.coordinates.geodesic import _direct, _inverse

        lat2, lon2, _ = _direct(lat1, lon1, azi1, s)
        s_inv, _, azi1_inv, _ = _inverse(lat1, lon1, lat2, lon2)
        return float(s_inv), float(azi1_inv), (float(lat2), float(lon2))

    def test_near_antipodal_roundtrips(self):
        cases = [
            # lat1, lon1, azi1, s (m): all land within the antipodal wedge
            (30.0, 10.0, 20.0, 19_940_000.0),
            (30.0, 10.0, 90.0, 19_940_000.0),
            (30.0, 10.0, 150.0, 19_930_000.0),
            (-45.0, 120.0, 5.0, 19_960_000.0),
            (-45.0, 120.0, 95.0, 19_900_000.0),
            (0.01, -170.0, 45.0, 19_950_000.0),
            (60.0, 0.0, 178.0, 19_920_000.0),
            (10.0, 0.0, -60.0, 19_940_000.0),  # westward departure
        ]
        for lat1, lon1, azi1, s in cases:
            s_inv, azi1_inv, p2 = self._roundtrip(lat1, lon1, azi1, s)
            # distance to sub-meter, azimuth to ~2e-5 deg (0.1 m transverse)
            assert abs(s_inv - s) < 1.0, (lat1, azi1, s, s_inv, p2)
            da = (azi1_inv - azi1 + 180.0) % 360.0 - 180.0
            assert abs(da) < 2e-4, (lat1, azi1, azi1_inv, p2)

    def test_exact_equatorial_antipode(self):
        # the geodesic between equatorial antipodes runs over a pole:
        # distance = 2 x meridian quadrant = 20003931.4586 m (WGS84).
        # exact antipodes are the singular point of the inverse problem
        # (a one-parameter family of minimal geodesics); the shooting
        # solver lands within ~25 m (1e-6 relative) there
        d = geo.distance(L(0.0, 0.0), L(0.0, 180.0))
        assert abs(d - 20003931.4586) < 50.0

    def test_vincenty_region_untouched(self):
        # pairs outside the antipodal wedge still take the fast path and
        # agree with the direct-problem oracle
        s_inv, azi1_inv, _ = self._roundtrip(30.0, 10.0, 40.0, 10_000_000.0)
        assert abs(s_inv - 10_000_000.0) < 1e-3
        assert abs(azi1_inv - 40.0) < 1e-8

    def test_vectorized_mixed_batch(self):
        from auromat_tpu.coordinates.geodesic import _direct, _inverse

        lat1 = np.array([30.0, 30.0, -45.0, 52.0])
        lon1 = np.array([10.0, 10.0, 120.0, -8.0])
        azi = np.array([20.0, 90.0, 5.0, 70.0])
        s = np.array([19_940_000.0, 19_940_000.0, 19_960_000.0, 5_000_000.0])
        lat2, lon2, _ = _direct(lat1, lon1, azi, s)
        s_inv, _, azi_inv, _ = _inverse(lat1, lon1, lat2, lon2)
        assert np.all(np.abs(s_inv - s) < 1.0)
        da = (azi_inv - azi + 180.0) % 360.0 - 180.0
        assert np.all(np.abs(da) < 2e-4)


def test_antipodal_minimality_and_consistency_sweep():
    """Inside the antipodal wedge several genuine geodesics coexist; the
    inverse must return the SHORTEST (never longer than any constructed
    path) and its (azi1, s) must land exactly on the endpoint."""
    from auromat_tpu.coordinates.geodesic import _direct, _inverse

    rng = np.random.default_rng(11)
    n = 200
    lat1 = rng.uniform(-70, 70, n)
    lon1 = rng.uniform(-180, 180, n)
    azi = rng.uniform(-180, 180, n)
    s = rng.uniform(19_950_000, 19_995_000, n)
    lat2, lon2, _ = _direct(lat1, lon1, azi, s)
    s_inv, _, a1, _ = _inverse(lat1, lon1, lat2, lon2)
    assert np.isfinite(s_inv).all()
    assert (s_inv <= s + 2.0).all()
    lat2b, lon2b, _ = _direct(lat1, lon1, a1, s_inv)
    dlat = np.abs(lat2b - lat2)
    dlon = np.abs((lon2b - lon2 + 180) % 360 - 180)
    err_m = np.hypot(dlat, dlon * np.cos(np.deg2rad(lat2))) * 111e3
    assert err_m.max() < 5.0, err_m.max()


class TestPoleContainmentReferenceCases:
    """The reference's own containsOrCrossesPole cases (reference
    test/geodesic_test.py:15-33), incl. the discontinuity-spanning
    non-polar polygon."""

    def test_reference_polygons(self):
        assert not geo.contains_or_crosses_pole(
            [L(1, 0), L(1, 4), L(5, 6), L(5, 2)])
        # same shape shifted onto the 180-degree discontinuity
        assert not geo.contains_or_crosses_pole(
            [L(1, 179), L(1, -177), L(5, -175), L(5, -179)])
        # around the north pole
        assert geo.contains_or_crosses_pole(
            [L(85, -135), L(85, -45), L(85, 45), L(85, 135)])
        # crossing the north pole
        assert geo.contains_or_crosses_pole(
            [L(85, -90), L(85, 0), L(85, 90)])
