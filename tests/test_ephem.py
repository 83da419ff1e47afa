"""SGP4 propagator and ephemeris tests.

Golden values: the classic Spacetrack Report #3 verification TLE — its TEME
positions at tsince 0 and 360 min are published to sub-meter level and are
the standard cross-implementation check.

End-to-end check: the checked-in ISS030-E-102170 header stores the
reference's TLE-derived camera positions at two instants 13 s apart; we fit
osculating elements to that state, emit a TLE, and verify the SGP4 +
TEME->GCRS chain reproduces the header position.
"""

import math
import os
import warnings
from datetime import datetime, timedelta

import numpy as np
import pytest

from auromat_tpu.coordinates.ephem import (
    SGP4,
    TLE,
    EphemerisCalculator,
    parse_tle_file,
    teme_to_gcrs_matrix,
    tle_checksum_ok,
)
from auromat_tpu.io import fits

RES = os.path.join(os.path.dirname(__file__), "resources")

# classic SGP4 test case (Spacetrack Report #3)
TEST_L1 = "1 88888U          80275.98708465  .00073094  13844-3  66816-4 0     8"
TEST_L2 = "2 88888  72.8435 115.9689 0086731  52.6988 110.5714 16.05824518  105"

MU = 398600.8  # km^3/s^2 (WGS-72)


def _checksum(line):
    total = 0
    for c in line[:68]:
        if c.isdigit():
            total += int(c)
        elif c == "-":
            total += 1
    return line[:68] + str(total % 10)


def make_tle(epoch, incl_deg, raan_deg, ecc, argp_deg, ma_deg, mm_rev_day,
             norad=25544):
    day_of_year = (epoch - datetime(epoch.year, 1, 1)).total_seconds() / 86400.0 + 1
    l1 = (
        f"1 {norad:05d}U 98067A   {epoch.year % 100:02d}"
        f"{day_of_year:012.8f}  .00000000  00000-0  00000-0 0    0"
    )
    ecc_str = f"{ecc:.7f}"[2:9]
    l2 = (
        f"2 {norad:05d} {incl_deg:8.4f} {raan_deg:8.4f} {ecc_str} "
        f"{argp_deg:8.4f} {ma_deg:8.4f} {mm_rev_day:11.8f}    0"
    )
    return _checksum(l1.ljust(69)[:69]), _checksum(l2.ljust(69)[:69])


def rv_to_elements(r, v):
    """Osculating Keplerian elements from a state vector (km, km/s)."""
    rmag = np.linalg.norm(r)
    vmag = np.linalg.norm(v)
    h = np.cross(r, v)
    hmag = np.linalg.norm(h)
    n = np.cross([0, 0, 1], h)
    nmag = np.linalg.norm(n)
    evec = (np.cross(v, h) / MU) - r / rmag
    ecc = np.linalg.norm(evec)
    energy = vmag**2 / 2 - MU / rmag
    a = -MU / (2 * energy)
    incl = math.acos(h[2] / hmag)
    raan = math.atan2(n[1], n[0]) % (2 * math.pi)
    argp = math.acos(np.clip(np.dot(n, evec) / (nmag * ecc), -1, 1))
    if evec[2] < 0:
        argp = 2 * math.pi - argp
    nu = math.acos(np.clip(np.dot(evec, r) / (ecc * rmag), -1, 1))
    if np.dot(r, v) < 0:
        nu = 2 * math.pi - nu
    ea = 2 * math.atan2(math.sqrt(1 - ecc) * math.sin(nu / 2),
                        math.sqrt(1 + ecc) * math.cos(nu / 2))
    ma = (ea - ecc * math.sin(ea)) % (2 * math.pi)
    mm_rev_day = math.sqrt(MU / a**3) * 86400 / (2 * math.pi)
    return (math.degrees(incl), math.degrees(raan), ecc, math.degrees(argp),
            math.degrees(ma), mm_rev_day)


def iss_tle_from_header():
    """Fit a TLE to the two real camera positions in the checked-in header."""
    header = fits.read_header(os.path.join(RES, "ISS030-E-102170_dc.wcs"))
    t0 = fits.get_photo_time(header)  # DATE-OBS
    r0_gcrs = np.array(fits.get_spacecraft_position(header))
    x, y, z, shift = fits.get_shifted_spacecraft_position(header)
    r1_gcrs = np.array([x, y, z])  # at t0 + shift (shift = -13 s)
    dt = shift
    # velocity at t0 via finite difference + curvature correction
    a0 = -MU * r0_gcrs / np.linalg.norm(r0_gcrs) ** 3
    v0_gcrs = (r1_gcrs - r0_gcrs) / dt - 0.5 * dt * a0
    # GCRS -> TEME
    m = teme_to_gcrs_matrix(t0)
    r0 = m.T @ r0_gcrs
    v0 = m.T @ v0_gcrs
    incl, raan, ecc, argp, ma, mm = rv_to_elements(r0, v0)
    l1, l2 = make_tle(t0, incl, raan, ecc, argp, ma, mm)
    return TLE(l1, l2), t0, r0_gcrs


class TestTLEParsing:
    def test_parse_fields(self):
        tle = TLE(TEST_L1, TEST_L2)
        assert tle.norad_id == 88888
        assert tle.epoch.year == 1980
        assert abs(tle.ecco - 0.0086731) < 1e-12
        assert abs(np.rad2deg(tle.inclo) - 72.8435) < 1e-9
        assert abs(tle.bstar - 0.66816e-4) < 1e-12

    def test_checksum(self):
        l1, l2 = make_tle(datetime(2012, 1, 25, 12), 51.6, 280.0, 0.0016,
                          291.7, 134.6, 15.59)
        assert tle_checksum_ok(l1)
        assert tle_checksum_ok(l2)
        assert not tle_checksum_ok(l1[:-1] + str((int(l1[-1]) + 1) % 10))
        assert tle_checksum_ok(l1[:-1] + "X") is False  # non-digit: no raise
        assert tle_checksum_ok("") is False

    def test_parse_file(self, tmp_path):
        l1, l2 = make_tle(datetime(2012, 1, 25, 12), 51.6, 280.0, 0.0016,
                          291.7, 134.6, 15.59)
        p = tmp_path / "tle.txt"
        p.write_text(f"ISS (ZARYA)\n{l1}\n{l2}\n{TEST_L1}\n{TEST_L2}\n")
        tles = parse_tle_file(str(p))
        assert len(tles) == 2
        assert tles[0].name == "ISS (ZARYA)"
        assert tles[0].norad_id == 25544


class TestSGP4:
    def test_spacetrack_report_3_golden(self):
        prop = SGP4(TLE(TEST_L1, TEST_L2))
        r0, v0 = prop(0.0)
        np.testing.assert_allclose(
            r0, [2328.97048951, -5995.22076416, 1719.97067261], atol=0.05
        )
        r360, _ = prop(360.0)
        np.testing.assert_allclose(
            r360, [2456.10705566, -6071.93853760, 1222.89727783], atol=0.5
        )

    def test_fitted_iss_orbit_sanity(self):
        tle, _, _ = iss_tle_from_header()
        prop = SGP4(tle)
        for t in np.linspace(0, 92, 20):
            r, v = prop(float(t))
            alt = np.linalg.norm(r) - 6371.0
            assert 250 < alt < 460, (t, alt)  # fitted osc-as-mean elements inflate e
            assert 7.5 < np.linalg.norm(v) < 7.8

    def test_fitted_iss_inclination(self):
        tle, _, _ = iss_tle_from_header()
        assert abs(np.rad2deg(tle.inclo) - 51.64) < 0.3


class TestTemeToGcrs:
    def test_rotation_is_small_and_orthonormal(self):
        m = teme_to_gcrs_matrix(datetime(2012, 1, 25, 9, 27, 8))
        np.testing.assert_allclose(m @ m.T, np.eye(3), atol=1e-12)
        angle = np.rad2deg(np.arccos((np.trace(m) - 1) / 2))
        assert angle < 0.35  # precession dominates over 12 years

    def test_identity_at_j2000(self):
        m = teme_to_gcrs_matrix(datetime(2000, 1, 1, 12))
        angle = np.rad2deg(np.arccos(np.clip((np.trace(m) - 1) / 2, -1, 1)))
        assert angle < 0.01  # only nutation remains at the epoch

    def test_mean_equinox_drift_direction(self):
        """Non-circular gate on the precession/nutation signs.

        TEME's x-axis is the *mean equinox of date*, which regresses
        westward at ~50.3 arcsec/yr: in J2000 coordinates it must sit at
        RA ~= -(zeta_A + z_A) and dec ~= -theta_A. A sign inversion of the
        precession factor (the round-1 bug: applying J2000->MOD instead of
        its inverse) flips RA positive; wrong nutation signs shift RA by
        ~2*dpsi (~10 arcsec). The TLE round-trip tests below cannot catch
        either, because the fit inverts the same matrix.
        """
        from auromat_tpu.coordinates.ephem import julian_date

        for date in (datetime(2012, 1, 25, 9, 27), datetime(2020, 6, 1),
                     datetime(2004, 4, 6, 7, 51, 28)):
            m = teme_to_gcrs_matrix(date)
            v = m @ np.array([1.0, 0.0, 0.0])
            ra = np.rad2deg(np.arctan2(v[1], v[0]))
            dec = np.rad2deg(np.arcsin(v[2]))
            t = (julian_date(date) - 2451545.0) / 36525.0
            zeta = (2306.2181 * t + 0.30188 * t * t) / 3600.0
            z = (2306.2181 * t + 1.09468 * t * t) / 3600.0
            theta = (2004.3109 * t - 0.42665 * t * t) / 3600.0
            # 5e-4 deg = 1.8 arcsec: passes only with the correct inverse
            # precession AND correct nutation signs (wrong nutation ~10")
            assert abs(ra + (zeta + z)) < 5e-4, (date, ra, -(zeta + z))
            assert abs(dec + theta) < 3e-3, (date, dec, -theta)


class TestEphemerisCalculator:
    def test_reproduces_header_camera_position(self):
        """TLE fitted from the header state at DATE-OBS must propagate back
        to the header position (mean-vs-osculating element difference gives
        a ~10 km floor)."""
        tle, t0, r0_gcrs = iss_tle_from_header()
        calc = EphemerisCalculator([tle])
        pos = calc(t0)
        err = np.linalg.norm(pos - r0_gcrs)
        assert err < 15.0, err

    def test_short_propagation_consistency(self):
        """Propagating the fitted orbit +/-60 s stays on a smooth arc with
        ISS orbital speed."""
        tle, t0, _ = iss_tle_from_header()
        calc = EphemerisCalculator([tle])
        p0 = calc(t0)
        p1 = calc(t0 + timedelta(seconds=60))
        speed = np.linalg.norm(p1 - p0) / 60.0
        assert 7.0 < speed < 8.0

    def test_nearest_tle_selection_and_warning(self):
        tle, t0, _ = iss_tle_from_header()
        calc = EphemerisCalculator([tle])
        with warnings.catch_warnings(record=True) as w:
            warnings.simplefilter("always")
            calc(t0 + timedelta(days=3))
            assert any("TLE epoch" in str(x.message) for x in w)

    def test_contains(self):
        tle, t0, _ = iss_tle_from_header()
        calc = EphemerisCalculator([tle, ])
        assert calc.contains(tle.epoch)
        assert not calc.contains(t0 + timedelta(days=400))
