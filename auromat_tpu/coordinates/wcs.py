"""FITS WCS zenithal projections as pure jax.numpy device code.

The reference implements a fast custom TAN unprojection
(auromat/coordinates/wcs.py:66-157, ~2x faster than astropy on CPU) and
falls back to astropy for anything else (reference wcs.py:18-64). Here the
common zenithal family (TAN, SIN, ZEA, ARC, STG) is first-party math —
:class:`ZenithalWcs` + :func:`pix2world` cover the astropy-fallback role;
the flagship fused georef path stays TAN-only (astrometry.net always emits
RA---TAN/DEC--TAN solutions).

Math (FITS Paper II, Calabretta & Greisen 2002):
  pixel offsets -> CD matrix -> projection-plane (x, y) in degrees
  native spherical: phi = arg(-y, x); theta from the projection's radial
  function R_theta (TAN: (180/pi)/tan -> theta = atan(180/(pi R)))
  celestial: rotate by the Euler z-x-z matrix
  Rz(ra_ref + 90) @ Rx(90 - dec_ref) @ Rz(-(lonpole - 90))   [degrees]
"""

import jax
import jax.numpy as jnp
import numpy as np

_RAD_PER_R = np.pi / 180.0  # projection-plane degrees -> radians


def celestial_rotation_matrix(ra_ref_deg, dec_ref_deg, lonpole_deg):
    """Native-spherical -> celestial rotation (host-side, float64).

    Matches euler_matrix(ra+90, 90-dec, -(lonpole-90), 'rzxz') of the
    reference (auromat/coordinates/wcs.py:133-139), i.e.
    Rz(a) @ Rx(b) @ Rz(c).
    """
    a = np.deg2rad(ra_ref_deg + 90.0)
    b = np.deg2rad(90.0 - dec_ref_deg)
    c = np.deg2rad(-(lonpole_deg - 90.0))

    def rz(t):
        ct, st = np.cos(t), np.sin(t)
        return np.array([[ct, -st, 0.0], [st, ct, 0.0], [0.0, 0.0, 1.0]])

    def rx(t):
        ct, st = np.cos(t), np.sin(t)
        return np.array([[1.0, 0.0, 0.0], [0.0, ct, -st], [0.0, st, ct]])

    return rz(a) @ rx(b) @ rz(c)


class ZenithalWcs:
    """Host-side container for a zenithal-projection WCS solution.

    Supports the common zenithal family — TAN (gnomonic), SIN
    (orthographic), ZEA (equal-area), ARC (equidistant), STG
    (stereographic) — the projections the reference reaches through its
    astropy fallback (reference wcs.py:18-64). Built from a
    FITS/astrometry.net header dict (see auromat_tpu.io.fits); the heavy
    per-pixel math runs in :func:`pix2world_cartesian`.
    """

    SUPPORTED = ("TAN", "SIN", "ZEA", "ARC", "STG")

    def __init__(self, header):
        c1 = header.get("CTYPE1") or ""
        c2 = header.get("CTYPE2") or ""
        code = c1[5:] if (
            isinstance(c1, str) and isinstance(c2, str)
            and c1.startswith("RA---") and c2.startswith("DEC--")
            and c1[5:] == c2[5:]
        ) else None
        latpole = float(header.get("LATPOLE", 0.0))
        dec_ref = float(header.get("CRVAL2", 0.0))
        # For zenithal projections the native pole IS the reference point,
        # so delta_p = CRVAL2 and LATPOLE carries no information: wcslib
        # writes the computed value (= CRVAL2) into the card, astrometry.net
        # writes 0. Accept both spellings; anything else on a header is
        # malformed enough to refuse rather than silently ignore.
        latpole_ok = latpole == 0.0 or abs(latpole - dec_ref) < 1e-9
        if code not in self.SUPPORTED or not latpole_ok:
            raise ValueError(
                f"only RA---/DEC-- zenithal projections {self.SUPPORTED} "
                f"with LATPOLE in (0, CRVAL2) are supported; got "
                f"{c1!r}/{c2!r} LATPOLE={header.get('LATPOLE', 0.0)}"
            )
        self.projection = code
        self.ra_ref = float(header["CRVAL1"])
        self.dec_ref = float(header["CRVAL2"])
        self.px_ref = float(header["CRPIX1"])
        self.py_ref = float(header["CRPIX2"])
        self.lonpole = float(header.get("LONPOLE", 180.0))
        self.cd = np.array(
            [
                [float(header["CD1_1"]), float(header["CD1_2"])],
                [float(header["CD2_1"]), float(header["CD2_2"])],
            ]
        )
        self.width = int(header["IMAGEW"]) if "IMAGEW" in header else None
        self.height = int(header["IMAGEH"]) if "IMAGEH" in header else None
        self.rotmat = celestial_rotation_matrix(self.ra_ref, self.dec_ref, self.lonpole)

    def native_from_plane(self, x, y):
        """Projection-plane (x, y) degrees -> native spherical (phi, theta)
        radians; out-of-domain points yield NaN theta."""
        r = jnp.sqrt(x * x + y * y)
        phi = jnp.arctan2(x, -y)
        return phi, _theta_from_r(self.projection, r)

    def plane_from_native(self, phi, theta):
        """Native spherical (rad) -> projection-plane (x, y) degrees;
        unprojectable directions yield NaN."""
        r = _r_from_theta(self.projection, theta)
        return r * jnp.sin(phi), -r * jnp.cos(phi)


class TanWcs(ZenithalWcs):
    """TAN-only WCS container — the contract of the fused georef fast path
    (astrometry.net always emits RA---TAN/DEC--TAN solutions)."""

    def __init__(self, header):
        if not (
            header.get("CTYPE1") == "RA---TAN"
            and header.get("CTYPE2") == "DEC--TAN"
        ):
            raise ValueError(
                "only RA---TAN/DEC--TAN with LATPOLE=0 is supported; got "
                f"{header.get('CTYPE1')}/{header.get('CTYPE2')} "
                "(generic zenithal projections: use ZenithalWcs + pix2world)"
            )
        super().__init__(header)


class CylindricalWcs:
    """Host-side container for a cylindrical-projection WCS solution.

    Covers the common cylindrical family — CAR (plate carree), CEA
    (cylindrical equal area, PV2_1 = lambda), MER (Mercator) — which the
    reference reaches only through its astropy fallback (reference
    wcs.py:18-64). Exposes the same surface as :class:`ZenithalWcs`
    (attrs + native_from_plane/plane_from_native), so :func:`pix2world`,
    :func:`world2pix` and :func:`pix2world_cartesian` work unchanged.

    Cylindrical projections have their fiducial point at native
    (phi0, theta0) = (0, 0) — NOT at the native pole — so the native pole
    (alpha_p, delta_p) must be solved from CRVAL + LONPOLE/LATPOLE
    (FITS Paper II eqs. 8-10, specialized to theta0 = 0, phi0 = 0):

        delta_p = t +- acos(sin(dec0) / |cos(phi_p)|),
                  t = 0 if cos(phi_p) > 0 else pi
        alpha_p = ra0 - atan2(sin(phi_p), -sin(delta_p) cos(phi_p))

    with the +-branch chosen closest to LATPOLE (default +90). The
    native->celestial rotation is then the same Euler z-x-z matrix as the
    zenithal case, parameterized by (alpha_p, delta_p, LONPOLE).
    """

    SUPPORTED = ("CAR", "CEA", "MER")

    def __init__(self, header):
        c1 = header.get("CTYPE1") or ""
        c2 = header.get("CTYPE2") or ""
        code = c1[5:] if (
            isinstance(c1, str) and isinstance(c2, str)
            and c1.startswith("RA---") and c2.startswith("DEC--")
            and c1[5:] == c2[5:]
        ) else None
        if code not in self.SUPPORTED:
            raise ValueError(
                f"only RA---/DEC-- cylindrical projections {self.SUPPORTED}"
                f" are supported here; got {c1!r}/{c2!r}"
            )
        self.projection = code
        self.ra_ref = float(header["CRVAL1"])
        self.dec_ref = float(header["CRVAL2"])
        self.px_ref = float(header["CRPIX1"])
        self.py_ref = float(header["CRPIX2"])
        # Paper II defaults for theta0 = 0: LONPOLE 0 if dec0 >= 0 else 180
        default_lonpole = 0.0 if self.dec_ref >= 0.0 else 180.0
        self.lonpole = float(header.get("LONPOLE", default_lonpole))
        self.latpole = float(header.get("LATPOLE", 90.0))
        # CEA's lambda: PV2_1 (wcslib) with 1.0 (Lambert) default
        self.cea_lambda = float(header.get("PV2_1", 1.0))
        if code == "CEA" and not 0.0 < self.cea_lambda <= 1.0:
            raise ValueError(f"CEA PV2_1 must be in (0, 1]; got "
                             f"{self.cea_lambda}")
        self.cd = np.array(
            [
                [float(header["CD1_1"]), float(header["CD1_2"])],
                [float(header["CD2_1"]), float(header["CD2_2"])],
            ]
        )
        self.width = int(header["IMAGEW"]) if "IMAGEW" in header else None
        self.height = int(header["IMAGEH"]) if "IMAGEH" in header else None

        phip = np.deg2rad(self.lonpole)
        d0 = np.deg2rad(self.dec_ref)
        cosphip = np.cos(phip)
        if abs(cosphip) < 1e-12:
            # delta_p constraint degenerates: sin(dec0) must be 0
            if abs(np.sin(d0)) > 1e-12:
                raise ValueError(
                    f"no native pole solution: LONPOLE={self.lonpole} with "
                    f"CRVAL2={self.dec_ref} violates "
                    "sin(dec0) = cos(delta_p) cos(lonpole)")
            cands = [np.pi / 2, -np.pi / 2]
        else:
            arg = np.sin(d0) / abs(cosphip)
            if abs(arg) > 1.0 + 1e-12:
                raise ValueError(
                    f"no native pole solution for LONPOLE={self.lonpole}, "
                    f"CRVAL2={self.dec_ref} (|sin(dec0)/cos(lonpole)| > 1)")
            c = np.arccos(np.clip(arg, -1.0, 1.0))
            t = 0.0 if cosphip > 0 else np.pi
            cands = [t + c, t - c]
        # wrap into [-pi/2, pi/2] validity and pick the one closest to
        # LATPOLE (Paper II: the LATPOLE card disambiguates the +-branch)
        valid = [dp for dp in cands if abs(dp) <= np.pi / 2 + 1e-12]
        if not valid:
            raise ValueError(
                f"no valid native pole latitude for LONPOLE={self.lonpole},"
                f" CRVAL2={self.dec_ref}")
        lp = np.deg2rad(self.latpole)
        dp = min(valid, key=lambda v: abs(v - lp))
        ap = np.deg2rad(self.ra_ref) - np.arctan2(
            np.sin(phip), -np.sin(dp) * cosphip)
        self.rotmat = celestial_rotation_matrix(
            np.rad2deg(ap), np.rad2deg(dp), self.lonpole)

    def native_from_plane(self, x, y):
        """Projection-plane (x, y) degrees -> native (phi, theta) radians
        (FITS Paper II section 5.2)."""
        phi = x * _RAD_PER_R
        if self.projection == "CAR":
            theta = y * _RAD_PER_R
        elif self.projection == "CEA":
            s = y * _RAD_PER_R * self.cea_lambda
            theta = jnp.arcsin(s)  # |s| > 1 -> NaN (outside the map)
        else:  # MER
            theta = 2.0 * jnp.arctan(jnp.exp(y * _RAD_PER_R)) - jnp.pi / 2
        return phi, theta

    def plane_from_native(self, phi, theta):
        """Native (phi, theta) radians -> projection-plane (x, y) degrees.

        phi is wrapped into [-180, 180) so world2pix lands on the
        principal map copy around CRPIX.
        """
        x = (jnp.rad2deg(phi) + 180.0) % 360.0 - 180.0
        if self.projection == "CAR":
            y = jnp.rad2deg(theta)
        elif self.projection == "CEA":
            y = jnp.rad2deg(jnp.sin(theta)) / self.cea_lambda
        else:  # MER: y = (180/pi) ln tan(pi/4 + theta/2); poles -> +-inf
            y = jnp.rad2deg(jnp.log(jnp.tan(jnp.pi / 4 + theta / 2.0)))
        return x, y


def _native_pole(ra0_deg, dec0_deg, lonpole_deg, latpole_deg, theta0_deg):
    """Celestial coordinates of the native pole for a projection whose
    fiducial native point is (phi0, theta0) = (0, theta0) — the general
    FITS Paper II eqs. 8-10 (host-side float64).

        delta_p = atan2(sin th0, cos th0 cos phi_p)
                  +- acos[ sin dec0 / sqrt(1 - cos^2 th0 sin^2 phi_p) ]
        alpha_p = ra0 - atan2(sin phi_p cos th0,
                              sin th0 cos delta_p
                              - cos th0 sin delta_p cos phi_p)

    (the alpha_p pair comes from evaluating the native->celestial
    spherical triangle at the fiducial:
    cos dec0 sin(ra0 - alpha_p) = cos th0 sin phi_p and
    cos dec0 cos(ra0 - alpha_p) = sin th0 cos delta_p
                                  - cos th0 sin delta_p cos phi_p)

    with the +- branch closest to LATPOLE. Specializes to the zenithal
    identity (theta0 = 90 -> pole = CRVAL) and to
    :class:`CylindricalWcs`'s theta0 = 0 solution.

    :returns: (alpha_p_deg, delta_p_deg)
    """
    th0 = np.deg2rad(theta0_deg)
    d0 = np.deg2rad(dec0_deg)
    phip = np.deg2rad(lonpole_deg)
    den = np.sqrt(max(1.0 - np.cos(th0) ** 2 * np.sin(phip) ** 2, 0.0))
    if den < 1e-12:
        raise ValueError(
            f"degenerate native-pole geometry: theta0={theta0_deg}, "
            f"LONPOLE={lonpole_deg}")
    arg = np.sin(d0) / den
    if abs(arg) > 1.0 + 1e-12:
        raise ValueError(
            f"no native pole solution: CRVAL2={dec0_deg} with "
            f"LONPOLE={lonpole_deg}, theta0={theta0_deg} "
            "(|sin dec0| exceeds the reachable range)")
    c = np.arccos(np.clip(arg, -1.0, 1.0))
    t = np.arctan2(np.sin(th0), np.cos(th0) * np.cos(phip))
    cands = [dp for dp in (t + c, t - c) if abs(dp) <= np.pi / 2 + 1e-12]
    if not cands:
        raise ValueError(
            f"no valid native pole latitude: CRVAL2={dec0_deg}, "
            f"LONPOLE={lonpole_deg}, theta0={theta0_deg}")
    lp = np.deg2rad(latpole_deg)
    dp = min(cands, key=lambda v: abs(v - lp))
    ap = np.deg2rad(ra0_deg) - np.arctan2(
        np.sin(phip) * np.cos(th0),
        np.sin(th0) * np.cos(dp) - np.cos(th0) * np.sin(dp) * np.cos(phip))
    return np.rad2deg(ap), np.rad2deg(dp)


class ConicWcs:
    """Host-side container for a conic-projection WCS solution.

    Covers the FITS conic family (Paper II section 5.3) — COP (conic
    perspective), COE (conic equal area / Albers), COD (conic
    equidistant), COO (conic orthomorphic / Lambert conformal) — which
    the reference reaches only through its astropy fallback (reference
    wcs.py:18-64). Same surface as :class:`ZenithalWcs`
    (native_from_plane / plane_from_native), so :func:`pix2world`,
    :func:`world2pix` and :func:`pix2world_cartesian` work unchanged.

    All four share the conic form about the cone constant C:

        x = R(theta) sin(C phi),  y = -R(theta) cos(C phi) + Y0

    with Y0 = R(theta_a) so the fiducial native point (0, theta_a) lands
    on the origin; theta_a = PV2_1 (required), eta = PV2_2 (default 0)
    give standard parallels theta_a -+ eta. The fiducial has
    theta0 = theta_a != 90, so the native pole comes from the general
    Paper II eqs. 8-10 (:func:`_native_pole`).
    """

    SUPPORTED = ("COP", "COE", "COD", "COO")

    def __init__(self, header):
        c1 = header.get("CTYPE1") or ""
        c2 = header.get("CTYPE2") or ""
        code = c1[5:] if (
            isinstance(c1, str) and isinstance(c2, str)
            and c1.startswith("RA---") and c2.startswith("DEC--")
            and c1[5:] == c2[5:]
        ) else None
        if code not in self.SUPPORTED:
            raise ValueError(
                f"only RA---/DEC-- conic projections {self.SUPPORTED} "
                f"are supported here; got {c1!r}/{c2!r}")
        if "PV2_1" not in header:
            raise ValueError(
                f"conic projection {code} requires PV2_1 (theta_a, the "
                "midpoint of the standard parallels)")
        self.projection = code
        self.theta_a = float(header["PV2_1"])
        self.eta = float(header.get("PV2_2", 0.0))
        if not 0.0 < abs(self.theta_a) <= 90.0:
            raise ValueError(f"conic PV2_1 must be in (0, 90]; got "
                             f"{self.theta_a} (theta_a = 0 degenerates "
                             "the cone into a cylinder — use CAR/CEA/MER)")
        th1, th2 = self.theta_a - self.eta, self.theta_a + self.eta
        if not (-90.0 <= th1 <= 90.0 and -90.0 <= th2 <= 90.0):
            raise ValueError(
                f"standard parallels theta_a -+ eta = {th1}, {th2} out of "
                "[-90, 90]")
        self.ra_ref = float(header["CRVAL1"])
        self.dec_ref = float(header["CRVAL2"])
        self.px_ref = float(header["CRPIX1"])
        self.py_ref = float(header["CRPIX2"])
        # Paper II default for theta0 = theta_a:
        # LONPOLE 0 if dec0 >= theta_a else 180
        default_lonpole = 0.0 if self.dec_ref >= self.theta_a else 180.0
        self.lonpole = float(header.get("LONPOLE", default_lonpole))
        self.latpole = float(header.get("LATPOLE", 90.0))
        self.cd = np.array(
            [
                [float(header["CD1_1"]), float(header["CD1_2"])],
                [float(header["CD2_1"]), float(header["CD2_2"])],
            ]
        )
        self.width = int(header["IMAGEW"]) if "IMAGEW" in header else None
        self.height = int(header["IMAGEH"]) if "IMAGEH" in header else None

        # cone constants (host float64, radians internally)
        ta, e = np.deg2rad(self.theta_a), np.deg2rad(self.eta)
        t1, t2 = ta - e, ta + e
        deg = 180.0 / np.pi
        if code == "COP":
            if abs(self.eta) >= 90.0:
                raise ValueError(f"COP PV2_2 must satisfy |eta| < 90; got "
                                 f"{self.eta}")
            self.C = np.sin(ta)
            self._cope = np.cos(e)
            self.Y0 = deg * self._cope / np.tan(ta)
        elif code == "COE":
            self.C = (np.sin(t1) + np.sin(t2)) / 2.0
            self._s1s2 = np.sin(t1) * np.sin(t2)
            self.Y0 = (deg / self.C) * np.sqrt(
                1.0 + self._s1s2 - 2.0 * self.C * np.sin(ta))
        elif code == "COD":
            if abs(self.eta) > 1e-12:
                self.C = np.sin(ta) * np.sin(e) / e
                self.Y0 = deg * e / np.tan(e) / np.tan(ta)
            else:
                self.C = np.sin(ta)
                self.Y0 = deg / np.tan(ta)
        else:  # COO: Lambert conformal; R = psi * tan((90-theta)/2)^C
            tau1 = np.tan((np.pi / 2 - t1) / 2.0)
            tau2 = np.tan((np.pi / 2 - t2) / 2.0)
            if abs(self.eta) > 1e-12:
                if not (abs(th1) < 90.0 - 1e-9 and abs(th2) < 90.0 - 1e-9):
                    raise ValueError(
                        "COO with two standard parallels requires both "
                        f"strictly inside (-90, 90); got {th1}, {th2}")
                self.C = (np.log(np.cos(t2) / np.cos(t1))
                          / np.log(tau2 / tau1))
            else:
                self.C = np.sin(ta)
            if abs(self.eta) <= 1e-12 and tau1 < 1e-12:
                # theta_1 = 90: cos(t1)/tan((90-t1)/2) -> 2, C -> 1 — the
                # exact STG (stereographic) limit of the conformal cone
                self._psi = 2.0 * deg
            else:
                self._psi = deg * np.cos(t1) / (self.C * tau1 ** self.C)
            self.Y0 = self._psi * np.tan((np.pi / 2 - ta) / 2.0) ** self.C
        ap, dp = _native_pole(self.ra_ref, self.dec_ref, self.lonpole,
                              self.latpole, self.theta_a)
        self.rotmat = celestial_rotation_matrix(ap, dp, self.lonpole)

    def _r_from_theta(self, theta):
        """Conic R(theta) in projection-plane degrees (theta radians)."""
        ta = jnp.deg2rad(self.theta_a)
        deg = 180.0 / jnp.pi
        if self.projection == "COP":
            # perspective from the sphere centre onto the secant cone:
            # valid only within a quarter turn of theta_a
            d = theta - ta
            r = deg * self._cope * (1.0 / jnp.tan(ta) - jnp.tan(d))
            return jnp.where(jnp.abs(d) < jnp.pi / 2, r, jnp.nan)
        if self.projection == "COE":
            s = 1.0 + self._s1s2 - 2.0 * self.C * jnp.sin(theta)
            return (deg / self.C) * jnp.sqrt(jnp.maximum(s, 0.0))
        if self.projection == "COD":
            return self.Y0 + (self.theta_a - jnp.rad2deg(theta))
        # COO
        return self._psi * jnp.tan((jnp.pi / 2 - theta) / 2.0) ** self.C

    def _theta_from_r(self, r):
        """Inverse of :meth:`_r_from_theta` (r degrees -> theta radians);
        out-of-domain radii yield NaN."""
        ta = jnp.deg2rad(self.theta_a)
        rad = jnp.pi / 180.0
        if self.projection == "COP":
            th = ta + jnp.arctan(1.0 / jnp.tan(ta) - r * rad / self._cope)
            return jnp.where(jnp.abs(th) <= jnp.pi / 2, th, jnp.nan)
        if self.projection == "COE":
            s = (1.0 + self._s1s2 - (self.C * r * rad) ** 2) / (2.0 * self.C)
            return jnp.arcsin(s)  # |s| > 1 -> NaN (outside the map)
        if self.projection == "COD":
            th = jnp.deg2rad(self.theta_a + self.Y0 - r)
            return jnp.where(jnp.abs(th) <= jnp.pi / 2, th, jnp.nan)
        # COO: R = psi tau^C, tau = tan((90-theta)/2) >= 0
        tau = (r / self._psi) ** (1.0 / self.C)
        return jnp.pi / 2 - 2.0 * jnp.arctan(tau)

    def native_from_plane(self, x, y):
        """Projection-plane (x, y) degrees -> native (phi, theta) radians
        (FITS Paper II section 5.3); off-cone points yield NaN."""
        dy = self.Y0 - y
        r = jnp.sign(self.theta_a) * jnp.hypot(x, dy)
        # r == 0 is the cone apex: phi undefined, keep theta if exact
        phi = jnp.arctan2(x / r, dy / r) / self.C
        return phi, self._theta_from_r(r)

    def plane_from_native(self, phi, theta):
        """Native (phi, theta) radians -> projection-plane (x, y) degrees."""
        r = self._r_from_theta(theta)
        a = self.C * phi
        return r * jnp.sin(a), self.Y0 - r * jnp.cos(a)


class PseudoCylindricalWcs:
    """Host-side container for a pseudo-cylindrical-projection WCS.

    Covers the FITS pseudo-cylindrical family (Paper II section 5.4) —
    SFL (Sanson-Flamsteed/sinusoidal), PAR (parabolic/Craster), MOL
    (Mollweide), AIT (Hammer-Aitoff) — the all-sky equal-area projections
    the reference reaches only through its astropy fallback (reference
    wcs.py:18-64). Same surface as :class:`ZenithalWcs`
    (native_from_plane / plane_from_native), so :func:`pix2world`,
    :func:`world2pix` and :func:`pix2world_cartesian` work unchanged.

    Like the cylindrical family these have their fiducial at native
    (phi0, theta0) = (0, 0), so the native pole comes from the general
    Paper II eqs. 8-10 solve (:func:`_native_pole` at theta0 = 0); x
    additionally depends on theta (the meridians converge).

    MOL's forward y(theta) requires solving the transcendental
    2 gamma + sin 2 gamma = pi sin theta — done with a fixed-iteration
    Newton (init gamma = theta; the derivative 2 + 2 cos 2 gamma only
    vanishes at the poles, where the init is already the root).
    """

    SUPPORTED = ("SFL", "PAR", "MOL", "AIT")

    def __init__(self, header):
        c1 = header.get("CTYPE1") or ""
        c2 = header.get("CTYPE2") or ""
        code = c1[5:] if (
            isinstance(c1, str) and isinstance(c2, str)
            and c1.startswith("RA---") and c2.startswith("DEC--")
            and c1[5:] == c2[5:]
        ) else None
        if code not in self.SUPPORTED:
            raise ValueError(
                f"only RA---/DEC-- pseudo-cylindrical projections "
                f"{self.SUPPORTED} are supported here; got {c1!r}/{c2!r}")
        self.projection = code
        self.ra_ref = float(header["CRVAL1"])
        self.dec_ref = float(header["CRVAL2"])
        self.px_ref = float(header["CRPIX1"])
        self.py_ref = float(header["CRPIX2"])
        # Paper II defaults for theta0 = 0: LONPOLE 0 if dec0 >= 0 else 180
        default_lonpole = 0.0 if self.dec_ref >= 0.0 else 180.0
        self.lonpole = float(header.get("LONPOLE", default_lonpole))
        self.latpole = float(header.get("LATPOLE", 90.0))
        self.cd = np.array(
            [
                [float(header["CD1_1"]), float(header["CD1_2"])],
                [float(header["CD2_1"]), float(header["CD2_2"])],
            ]
        )
        self.width = int(header["IMAGEW"]) if "IMAGEW" in header else None
        self.height = int(header["IMAGEH"]) if "IMAGEH" in header else None
        ap, dp = _native_pole(self.ra_ref, self.dec_ref, self.lonpole,
                              self.latpole, 0.0)
        self.rotmat = celestial_rotation_matrix(ap, dp, self.lonpole)

    def native_from_plane(self, x, y):
        """Projection-plane (x, y) degrees -> native (phi, theta) radians
        (FITS Paper II section 5.4); out-of-map points yield NaN."""
        if self.projection == "SFL":
            theta = y * _RAD_PER_R
            theta = jnp.where(jnp.abs(theta) <= jnp.pi / 2, theta, jnp.nan)
            phi = x * _RAD_PER_R / jnp.cos(theta)
            return phi, theta
        if self.projection == "PAR":
            theta = 3.0 * jnp.arcsin(y / 180.0)
            theta = jnp.where(jnp.abs(theta) <= jnp.pi / 2, theta, jnp.nan)
            phi = x * _RAD_PER_R / (2.0 * jnp.cos(2.0 * theta / 3.0) - 1.0)
            return phi, theta
        if self.projection == "MOL":
            sg = y * jnp.pi / (180.0 * np.sqrt(2.0))
            g = jnp.arcsin(sg)  # |y| beyond the map rim -> NaN
            theta = jnp.arcsin((2.0 * g + jnp.sin(2.0 * g)) / jnp.pi)
            phi = x * _RAD_PER_R * jnp.pi / (2.0 * np.sqrt(2.0)
                                             * jnp.cos(g))
            return phi, theta
        # AIT (Paper II eqs. 105-107, radian plane coordinates)
        X = x * _RAD_PER_R
        Y = y * _RAD_PER_R
        z2 = 1.0 - (X / 4.0) ** 2 - (Y / 2.0) ** 2
        # principal ellipse: Z^2 >= 1/2 (outside lies no valid (phi, theta))
        z2 = jnp.where(z2 >= 0.5, z2, jnp.nan)
        z = jnp.sqrt(z2)
        theta = jnp.arcsin(Y * z)
        phi = 2.0 * jnp.arctan2(z * X / 2.0, 2.0 * z2 - 1.0)
        return phi, theta

    def plane_from_native(self, phi, theta):
        """Native (phi, theta) radians -> projection-plane (x, y) degrees.

        phi is wrapped into [-pi, pi) so world2pix lands on the principal
        map copy around CRPIX.
        """
        phi = (phi + jnp.pi) % (2.0 * jnp.pi) - jnp.pi
        deg = 180.0 / jnp.pi
        if self.projection == "SFL":
            return deg * phi * jnp.cos(theta), deg * theta
        if self.projection == "PAR":
            return (deg * phi * (2.0 * jnp.cos(2.0 * theta / 3.0) - 1.0),
                    180.0 * jnp.sin(theta / 3.0))
        if self.projection == "MOL":
            g = _mol_gamma(theta)
            x = (2.0 * np.sqrt(2.0) / jnp.pi) * deg * phi * jnp.cos(g)
            y = np.sqrt(2.0) * deg * jnp.sin(g)
            return x, y
        # AIT
        gf = jnp.sqrt(2.0 / (1.0 + jnp.cos(theta) * jnp.cos(phi / 2.0)))
        x = 2.0 * deg * gf * jnp.cos(theta) * jnp.sin(phi / 2.0)
        y = deg * gf * jnp.sin(theta)
        return x, y


def _mol_gamma(theta, iters=12):
    """Solve Mollweide's 2g + sin 2g = pi sin(theta) for g by Newton.

    Init g = theta; the derivative 2 + 2 cos 2g vanishes only at the
    poles, where g = theta is already the exact root (guarded divisor
    keeps the iteration a no-op there). 12 iterations reach f64
    round-off over the whole open interval.
    """
    target = jnp.pi * jnp.sin(theta)
    g = theta
    for _ in range(iters):
        f = 2.0 * g + jnp.sin(2.0 * g) - target
        df = 2.0 + 2.0 * jnp.cos(2.0 * g)
        g = g - f / jnp.maximum(df, 1e-14)
    return g


#: projection code -> WCS class, the dispatch table of :func:`make_wcs`
_WCS_FAMILIES = {
    **{c: ZenithalWcs for c in ZenithalWcs.SUPPORTED},
    **{c: CylindricalWcs for c in CylindricalWcs.SUPPORTED},
    **{c: ConicWcs for c in ConicWcs.SUPPORTED},
    **{c: PseudoCylindricalWcs for c in PseudoCylindricalWcs.SUPPORTED},
}


def make_wcs(header):
    """Build the right WCS container for a FITS header.

    Dispatches on the CTYPE projection code: zenithal codes ->
    :class:`ZenithalWcs`, cylindrical -> :class:`CylindricalWcs`, conic
    -> :class:`ConicWcs`, pseudo-cylindrical ->
    :class:`PseudoCylindricalWcs`. Any other projection raises
    NotImplementedError naming the supported families (the reference
    resolves arbitrary projections through its astropy fallback,
    reference wcs.py:18-64 — exotic polyconic/quad-cube headers are not
    reachable from astrometry.net output, which is always TAN).
    """
    c1 = header.get("CTYPE1") or ""
    code = c1[5:] if isinstance(c1, str) and len(c1) >= 8 else ""
    cls = _WCS_FAMILIES.get(code)
    if cls is None:
        raise NotImplementedError(
            f"projection {code!r} (CTYPE1={c1!r}) is not supported: "
            f"first-party projections are the zenithal family "
            f"{ZenithalWcs.SUPPORTED}, the cylindrical family "
            f"{CylindricalWcs.SUPPORTED}, the conic family "
            f"{ConicWcs.SUPPORTED} and the pseudo-cylindrical family "
            f"{PseudoCylindricalWcs.SUPPORTED}")
    return cls(header)


def _theta_from_r(projection, r):
    """Native latitude theta (rad) from projection-plane radius R (deg).

    Radial inverses of the zenithal R_theta functions (FITS Paper II
    section 5.1); out-of-domain radii yield NaN.
    """
    if projection == "TAN":
        # R = (180/pi)/tan(theta); r=0 -> +inf -> pi/2
        return jnp.arctan((180.0 / jnp.pi) / r)
    if projection == "SIN":
        # R = (180/pi) cos(theta); R > 180/pi -> NaN (outside the disc)
        return jnp.arccos(r * _RAD_PER_R)
    if projection == "ZEA":
        # R = (360/pi) sin((90-theta)/2)
        return jnp.pi / 2 - 2.0 * jnp.arcsin(r * (_RAD_PER_R / 2.0))
    if projection == "ARC":
        # R = 90 - theta [deg]; full sphere is R <= 180
        th = jnp.deg2rad(90.0 - r)
        return jnp.where(r <= 180.0, th, jnp.nan)
    if projection == "STG":
        # R = (360/pi) tan((90-theta)/2)
        return jnp.pi / 2 - 2.0 * jnp.arctan(r * (_RAD_PER_R / 2.0))
    raise NotImplementedError(projection)


def _r_from_theta(projection, theta):
    """Projection-plane radius R (deg) from native latitude theta (rad);
    unprojectable directions (e.g. behind the TAN/SIN plane) yield NaN."""
    if projection == "TAN":
        return jnp.where(theta > 0,
                         (180.0 / jnp.pi) / jnp.tan(theta), jnp.nan)
    if projection == "SIN":
        # the far hemisphere mirrors onto the same disc — mask it, same
        # rationale as tan_world2pix
        return jnp.where(theta >= 0,
                         (180.0 / jnp.pi) * jnp.cos(theta), jnp.nan)
    if projection == "ZEA":
        return (360.0 / jnp.pi) * jnp.sin((jnp.pi / 2 - theta) / 2.0)
    if projection == "ARC":
        return 90.0 - jnp.rad2deg(theta)
    if projection == "STG":
        return (360.0 / jnp.pi) * jnp.tan((jnp.pi / 2 - theta) / 2.0)
    raise NotImplementedError(projection)


def pix2world_cartesian(wcs, px, py, origin=0):
    """Pixel coordinates -> unit ICRS direction vectors for any supported
    projection — zenithal (:class:`ZenithalWcs`) or cylindrical
    (:class:`CylindricalWcs`); generic counterpart of
    :func:`tan_pix2world_cartesian` (the reference reaches non-TAN
    projections via its astropy fallback, reference wcs.py:18-64)."""
    dx = px - (wcs.px_ref - (1 - origin))
    dy = py - (wcs.py_ref - (1 - origin))
    cd = wcs.cd
    x = cd[0, 0] * dx + cd[0, 1] * dy
    y = cd[1, 0] * dx + cd[1, 1] * dy

    phi, theta = wcs.native_from_plane(x, y)

    cos_t = jnp.cos(theta)
    l_ = cos_t * jnp.cos(phi)
    m_ = cos_t * jnp.sin(phi)
    n_ = jnp.sin(theta)
    rot = wcs.rotmat
    vx = rot[0, 0] * l_ + rot[0, 1] * m_ + rot[0, 2] * n_
    vy = rot[1, 0] * l_ + rot[1, 1] * m_ + rot[1, 2] * n_
    vz = rot[2, 0] * l_ + rot[2, 1] * m_ + rot[2, 2] * n_
    return jnp.stack([vx, vy, vz], axis=-1)


def pix2world(wcs, px, py, origin=0):
    """Pixel coordinates -> (ra, dec) degrees for any supported
    projection (zenithal or cylindrical), ra wrapped into [0, 360)."""
    v = pix2world_cartesian(wcs, px, py, origin)
    s = jnp.sqrt(v[..., 0] ** 2 + v[..., 1] ** 2)
    dec = jnp.rad2deg(jnp.arctan2(v[..., 2], s))
    ra = jnp.rad2deg(jnp.arctan2(v[..., 1], v[..., 0]))
    ra = (ra - 360.0) % 360.0
    return ra, dec


def world2pix(wcs, ra_deg, dec_deg, origin=0):
    """Celestial (ra, dec) degrees -> pixel coordinates for any supported
    projection (zenithal or cylindrical); unprojectable directions
    return NaN."""
    ra = jnp.deg2rad(jnp.asarray(ra_deg))
    dec = jnp.deg2rad(jnp.asarray(dec_deg))
    cos_d = jnp.cos(dec)
    v = jnp.stack([cos_d * jnp.cos(ra), cos_d * jnp.sin(ra), jnp.sin(dec)],
                  axis=-1)
    n = jnp.matmul(v, jnp.asarray(wcs.rotmat),  # == rotmat.T @ v
                   precision=jax.lax.Precision.HIGHEST)
    phi = jnp.arctan2(n[..., 1], n[..., 0])
    theta = jnp.arctan2(n[..., 2], jnp.hypot(n[..., 0], n[..., 1]))
    x, y = wcs.plane_from_native(phi, theta)
    inv = np.linalg.inv(wcs.cd)
    dx = inv[0, 0] * x + inv[0, 1] * y
    dy = inv[1, 0] * x + inv[1, 1] * y
    off = 1 - origin
    return dx + wcs.px_ref - off, dy + wcs.py_ref - off


def tan_pix2world_cartesian(wcs: TanWcs, px, py, origin=0):
    """Pixel coordinates -> unit direction vectors in ICRS, (..., 3).

    :param px, py: pixel coordinate arrays (any shape, same shape)
    :param origin: 0 or 1; FITS CRPIX is 1-based, so origin=0 adds 1
    """
    dx = px - (wcs.px_ref - (1 - origin))
    dy = py - (wcs.py_ref - (1 - origin))

    cd = wcs.cd
    x = cd[0, 0] * dx + cd[0, 1] * dy
    y = cd[1, 0] * dx + cd[1, 1] * dy

    r = jnp.sqrt(x * x + y * y)
    phi = jnp.arctan2(x, -y)  # native longitude
    theta = jnp.arctan((180.0 / jnp.pi) / r)  # native latitude; r=0 -> +inf -> pi/2

    cos_t = jnp.cos(theta)
    l_ = cos_t * jnp.cos(phi)
    m_ = cos_t * jnp.sin(phi)
    n_ = jnp.sin(theta)

    rot = wcs.rotmat
    vx = rot[0, 0] * l_ + rot[0, 1] * m_ + rot[0, 2] * n_
    vy = rot[1, 0] * l_ + rot[1, 1] * m_ + rot[1, 2] * n_
    vz = rot[2, 0] * l_ + rot[2, 1] * m_ + rot[2, 2] * n_
    return jnp.stack([vx, vy, vz], axis=-1)


def tan_pix2world(wcs: TanWcs, px, py, origin=0):
    """Pixel coordinates -> (ra, dec) in degrees, ra wrapped into [0, 360).

    Reference: auromat/coordinates/wcs.py:66-157.
    """
    v = tan_pix2world_cartesian(wcs, px, py, origin)
    s = jnp.sqrt(v[..., 0] ** 2 + v[..., 1] ** 2)
    dec = jnp.rad2deg(jnp.arctan2(v[..., 2], s))
    ra = jnp.rad2deg(jnp.arctan2(v[..., 1], v[..., 0]))
    ra = (ra - 360.0) % 360.0
    return ra, dec


def tan_world2pix(wcs: TanWcs, ra_deg, dec_deg, origin=0):
    """Celestial (ra, dec) degrees -> pixel coordinates (inverse of
    :func:`tan_pix2world`; forward TAN projection, FITS Paper II).

    Directions >= 90 deg from the tangent point (theta <= 0, behind the
    tangent plane) are unprojectable and return NaN — without this the
    gnomonic formula MIRRORS the far hemisphere into the frame (the
    antipode of the frame centre lands exactly on the frame centre),
    producing ghost stars/constellations in all-sky overlays.
    """
    ra = jnp.deg2rad(jnp.asarray(ra_deg))
    dec = jnp.deg2rad(jnp.asarray(dec_deg))
    cos_d = jnp.cos(dec)
    v = jnp.stack([cos_d * jnp.cos(ra), cos_d * jnp.sin(ra), jnp.sin(dec)], axis=-1)
    n = jnp.matmul(v, jnp.asarray(wcs.rotmat),  # == rotmat.T @ v
                   precision=jax.lax.Precision.HIGHEST)
    phi = jnp.arctan2(n[..., 1], n[..., 0])
    theta = jnp.arctan2(n[..., 2], jnp.hypot(n[..., 0], n[..., 1]))
    theta = jnp.where(theta > 0, theta, jnp.nan)
    r = (180.0 / jnp.pi) / jnp.tan(theta)
    x = r * jnp.sin(phi)
    y = -r * jnp.cos(phi)
    inv = np.linalg.inv(wcs.cd)
    dx = inv[0, 0] * x + inv[0, 1] * y
    dy = inv[1, 0] * x + inv[1, 1] * y
    off = 1 - origin
    return dx + wcs.px_ref - off, dy + wcs.py_ref - off


def pixel_grid(width, height, start_x=0, start_y=0, corner=True, dtype=jnp.float64):
    """Pixel-corner or pixel-centre coordinate grids.

    Matches the reference grid construction (auromat/coordinates/wcs.py:44-47):
    corner grids start at -0.5 and have one extra row/column.

    :returns: (px, py) arrays of shape (h+1, w+1) or (h, w)
    """
    off = -0.5 if corner else 0.0
    extra = 1 if corner else 0
    xs = jnp.arange(start_x + off, start_x + off + width + extra, dtype=dtype)
    ys = jnp.arange(start_y + off, start_y + off + height + extra, dtype=dtype)
    return jnp.meshgrid(xs, ys)


def pixel_directions(wcs: TanWcs, corner=True, dtype=jnp.float64):
    """Direction vectors in ICRS for every pixel corner or centre.

    ICRS directions are used directly as GCRS/J2000 (error ~0.01 arcsec vs
    20-100 arcsec/px; reference: auromat/mapping/astrometry.py:245-269).

    :returns: (h+1, w+1, 3) if corner else (h, w, 3)
    """
    if wcs.width is None or wcs.height is None:
        raise ValueError(
            "WCS header has no image dimensions (IMAGEW/IMAGEH); "
            "pixel_directions needs them to build the pixel grid"
        )
    px, py = pixel_grid(wcs.width, wcs.height, corner=corner, dtype=dtype)
    return tan_pix2world_cartesian(wcs, px, py, origin=0)
