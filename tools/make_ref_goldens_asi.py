"""Generate THEMIS/MIRACLE reference goldens by EXECUTING /root/reference.

Runs the reference implementation through the dependency shim
(/tmp/refshim.py, see .claude/skills/verify/SKILL.md) on synthetic
calibration inputs and commits the outputs as golden files:

* golden_themis_reproject.npz — reference auromat.mapping.themis.reproject
  (altitude reprojection: reconstruct rays from the station to the
  reference-altitude grid, re-intersect the inflated ellipsoid;
  reference themis.py:224-253) on a regular grid around the Gillam ASI.
* golden_miracle_fisheye.npz — reference MIRACLEMapping.calculateAzEl
  (fisheye pixel -> az/el, miracle.py:314-347) +
  _calculateCameraToPixelDirection (az/el -> GEO direction vectors,
  miracle.py:240-258) + ellipsoid intersection + geodetic conversion on
  the SOD station calibration.

numpy-era note: the reference's ``ind += 0.5`` (miracle.py:332) is an
in-place int+float add that modern numpy rejects; np.indices is patched to
return float64 for the call, which realizes the obviously intended
half-pixel centre offset (2013-era numpy silently truncated it away).

Both gate the repo's chains in tests/test_providers.py (VERDICT r2 item 5).
"""

import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
import refshim  # noqa: F401  (installs stubs + reference path)

RES = os.path.join(os.path.dirname(os.path.abspath(__file__)), "..",
                   "tests", "resources")


def themis_golden():
    from auromat.mapping.themis import reproject

    lat_asi, lon_asi = 56.38, -94.64  # Gillam
    la = lat_asi + np.linspace(-4.0, 4.0, 33)[:, None] + np.zeros((1, 33))
    lo = lon_asi + np.zeros((33, 1)) + np.linspace(-6.0, 6.0, 33)[None, :]
    out = {"lat_asi": lat_asi, "lon_asi": lon_asi, "lats_ref": la,
           "lons_ref": lo, "height_ref": 110.0}
    for h_new in (90.0, 150.0):
        la_n, lo_n = reproject((lat_asi, lon_asi), la, lo, 110.0, h_new)
        out[f"lats_{int(h_new)}"] = la_n
        out[f"lons_{int(h_new)}"] = lo_n
    path = os.path.join(RES, "golden_themis_reproject.npz")
    np.savez_compressed(path, **out)
    print(f"wrote {path}")


def miracle_golden():
    from auromat.mapping import miracle
    from auromat.coordinates.intersection import ellipsoidLineIntersection
    from auromat.coordinates.transform import (ecef2Geodetic,
                                               geodetic2EcefZero)
    from auromat.coordinates.geodesic import wgs84A, wgs84B

    class _Shell(miracle.MIRACLEMapping):
        """Just enough instance state to run the reference fisheye methods."""

        def __init__(self, cal, size):
            self._calData = cal
            self._img = np.zeros((size, size, 3))

        @property
        def img_unmasked(self):
            return self._img

    # SOD-like calibration (explicit numbers; the 512-px reference frame)
    cal = miracle.CalibrationData(
        station="SOD", validFrom=None, validTo=None, lat=67.42, lon=26.39,
        xc=280.4, yc=257.0, k=155.0, rotation=0.1, boundingBoxSimple=None)
    size, altitude = 64, 110.0
    m = _Shell(cal, size)

    orig_indices = np.indices
    np.indices = lambda *a, **k: orig_indices(*a, **k).astype(np.float64)
    try:
        az_c, el_c = m.calculateAzEl(center=True)
        az_k, el_k = m.calculateAzEl(center=False)
    finally:
        np.indices = orig_indices

    dirs = m._calculateCameraToPixelDirection(el_c, az_c)
    ox, oy, oz = geodetic2EcefZero(np.deg2rad(cal.lat), np.deg2rad(cal.lon))
    pos = np.array([ox, oy, oz])
    # keep only above-horizon rays (the reference premasks el < 1 deg)
    inter = ellipsoidLineIntersection(
        wgs84A + altitude, wgs84B + altitude, pos, dirs.reshape(-1, 3))
    inter = inter.reshape(dirs.shape)
    la, lo = ecef2Geodetic(inter[..., 0], inter[..., 1], inter[..., 2],
                           wgs84A, wgs84B)
    np.rad2deg(la, la)
    np.rad2deg(lo, lo)
    path = os.path.join(RES, "golden_miracle_fisheye.npz")
    np.savez_compressed(
        path, size=size, altitude=altitude, lat_asi=cal.lat, lon_asi=cal.lon,
        xc=cal.xc, yc=cal.yc, k=cal.k, rotation=cal.rotation,
        az_center=az_c, el_center=el_c, az_corner=az_k, el_corner=el_k,
        dirs=dirs, lats=la, lons=lo)
    print(f"wrote {path}")


if __name__ == "__main__":
    themis_golden()
    miracle_golden()
