"""Generate end-to-end RESAMPLE goldens by EXECUTING /root/reference.

Runs the reference's full L2-L5 chain (auromat.mapping.astrometry lazy
pyramid -> auromat.resample 'mean' binning) on the two checked-in ISS
frames through the dependency shim (tools/refshim.py):

    BaseAstrometryMapping lazies: pix2world corner+center grids (wcs.py:
    66-157), inflatedEarthIntersection (mapping.py:1474-1510),
    j2000ToLatLon (transform.py:683-738), elevation (astrometry.py:
    200-212), sanitize fixpoint (mapping.py:1063-1231)
    -> resample(mapping, pxPerDeg=25, method='mean') (resample.py:73-368):
    boundingBox/fixedGrid global alignment + histogram2d list-of-weights
    mean binning + uint8 round-trip.

Committed as tests/resources/golden_resample_<frame>.npz; gated by
tests/test_resample_parity.py against the repo chain
(get_mapping -> resample(px_per_deg=25)).

The geographiclib stub is backed by the repo's Vincenty solver (see
refshim) — on this path it feeds only pole detection and bbox sizing
(both far from thresholds for these mid-latitude frames), never the
binned values.
"""

import os
import sys

import numpy as np

_here = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, _here)
sys.path.insert(0, os.path.dirname(_here))  # repo root: auromat_tpu package
import refshim  # noqa: F401  (installs stubs + reference path)

# numpy-2 compat for the 2013-era reference: mapping.py:712 does
# astype(np.int); the alias was removed in numpy 2.0
np.int = int


def _install_patched_histogram():
    """Import the reference's vendored util/histogram.py with one
    mechanical numpy-2 compat fix: `hist[core]` indexes with a LIST of
    slices (histogram.py:261), which 2013-era numpy treated as a tuple;
    modern numpy requires the tuple spelling. No behavioral change."""
    import importlib
    import types

    importlib.import_module("auromat.util")
    path = "/root/reference/auromat/util/histogram.py"
    with open(path) as f:
        src = f.read()
    patched = src.replace("hist = hist[core]", "hist = hist[tuple(core)]")
    assert patched != src
    mod = types.ModuleType("auromat.util.histogram")
    mod.__file__ = path
    exec(compile(patched, path, "exec"), mod.__dict__)
    sys.modules["auromat.util.histogram"] = mod


_install_patched_histogram()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

from auromat_tpu.io import fits as rfits  # noqa: E402
from auromat_tpu.io.image import load_image  # noqa: E402

RES = os.path.join(os.path.dirname(os.path.abspath(__file__)), "..",
                   "tests", "resources")
FRAMES = ["ISS030-E-102170_dc", "ISS029-E-8492"]
PX_PER_DEG = 25


def build_reference_mapping(name):
    from auromat.mapping.astrometry import (BaseAstrometryMapping,
                                            ImageMaskAstrometryMixin)
    from auromat.mapping.mapping import ArrayImageMixin, sanitize_data

    class _RefArrayMappingUnsan(ImageMaskAstrometryMixin, ArrayImageMixin,
                                BaseAstrometryMapping):
        """ArraySpacecraftMapping minus the fits.py import surface
        (reference spacecraft.py:585-596)."""

        def __init__(self, wcsHeader, alti, img, cameraPosGCRS, photoTime,
                     identifier):
            ImageMaskAstrometryMixin.__init__(self)
            ArrayImageMixin.__init__(self, img)
            BaseAstrometryMapping.__init__(self, wcsHeader, alti,
                                           cameraPosGCRS, photoTime,
                                           identifier)

    RefArrayMapping = sanitize_data(_RefArrayMappingUnsan)

    header = rfits.read_header(os.path.join(RES, f"{name}.wcs"))
    photo_time = rfits.get_photo_time(header)
    shifted = rfits.get_shifted_spacecraft_position(header)
    if shifted:
        # reference _prepareMappingParams (spacecraft.py:445-448) pairs the
        # shifted position with the SHIFTED photo time
        from datetime import timedelta
        pos = np.array(shifted[:3])
        photo_time = photo_time + timedelta(seconds=shifted[3])
    else:
        pos = np.array(rfits.get_spacecraft_position(header))
    img = load_image(os.path.join(RES, f"{name}.jpg"))
    return RefArrayMapping(header, 110.0, img, pos, photo_time, name)


def make_golden(name):
    from auromat.resample import resample as ref_resample

    m = build_reference_mapping(name)
    r = ref_resample(m, pxPerDeg=PX_PER_DEG, containsPole=False,
                     method="mean")
    r.checkGuarantees()
    r.checkPlateCarree()

    img = r.img
    out = os.path.join(RES, f"golden_resample_{name}.npz")
    np.savez_compressed(
        out,
        px_per_deg=PX_PER_DEG,
        altitude=110.0,
        # full 2D grids: sanitize masks corners outside the data footprint,
        # so 1D axes are not recoverable from every row/column
        lats=np.asarray(r.lats.filled(np.nan)),
        lons=np.asarray(r.lons.filled(np.nan)),
        lats_center=np.asarray(r.latsCenter.filled(np.nan)),
        lons_center=np.asarray(r.lonsCenter.filled(np.nan)),
        img=np.asarray(img.filled(0)),
        img_mask=np.asarray(np.ma.getmaskarray(img)),
        elevation=np.asarray(r.elevation.filled(np.nan), dtype=np.float32),
    )
    print(name, "->", out, img.shape,
          f"{(~np.ma.getmaskarray(img)).all(axis=-1).mean():.3f} valid")


def make_golden_mlatmlt(name):
    """Reference resampleMLatMLT (resample.py:63-71): GEO->SM mapping
    conversion (mapping.py:1519-1547), mean binning on the SM grid, then
    SM->GEO grid conversion (mapping.py:1549-1559). Gates the repo's
    resample_mlat_mlt end to end, incl. the mLatMlt lazy chain."""
    from auromat.resample import resampleMLatMLT

    m = build_reference_mapping(name)
    r = resampleMLatMLT(m, pxPerDeg=PX_PER_DEG, containsPole=False,
                        method="mean")
    img = r.img
    out = os.path.join(RES, f"golden_resample_mlatmlt_{name}.npz")
    np.savez_compressed(
        out,
        px_per_deg=PX_PER_DEG,
        altitude=110.0,
        lats=np.asarray(r.lats.filled(np.nan)),
        lons=np.asarray(r.lons.filled(np.nan)),
        lats_center=np.asarray(r.latsCenter.filled(np.nan)),
        lons_center=np.asarray(r.lonsCenter.filled(np.nan)),
        img=np.asarray(img.filled(0)),
        img_mask=np.asarray(np.ma.getmaskarray(img)),
        elevation=np.asarray(r.elevation.filled(np.nan), dtype=np.float32),
    )
    print("mlatmlt", name, "->", out, img.shape)


def _inv_gnomonic(x, y, lat0_deg, lon0_deg):
    """Inverse gnomonic projection: tangent-plane (x, y) -> lat/lon deg."""
    rho = np.hypot(x, y)
    c = np.arctan(rho)
    lat0, lon0 = np.deg2rad(lat0_deg), np.deg2rad(lon0_deg)
    sinc, cosc = np.sin(c), np.cos(c)
    with np.errstate(invalid="ignore", divide="ignore"):
        frac = np.where(rho == 0, 0.0, y * sinc * np.cos(lat0) / np.where(rho == 0, 1.0, rho))
    lat = np.arcsin(np.clip(cosc * np.sin(lat0) + frac, -1, 1))
    lon = lon0 + np.arctan2(x * sinc,
                            rho * np.cos(lat0) * cosc - y * np.sin(lat0) * sinc)
    lon = (np.rad2deg(lon) + 180.0) % 360.0 - 180.0
    return np.rad2deg(lat), lon


def _gnomonic_cap(lat0_deg, lon0_deg, half_deg, n):
    """Synthetic all-valid frame: gnomonic cap tangent at (lat0, lon0).

    Returns (lats, lons, lats_c, lons_c, elev, img) with corner grids
    (n+1, n+1) and center grids (n, n); elevation decreases with angular
    distance from the tangent point; image channels are smooth functions
    of the tangent-plane coordinates (so binned means are non-trivial)."""
    ang = np.linspace(-half_deg, half_deg, n + 1) + 0.15
    t = np.tan(np.deg2rad(ang))
    xg, yg = np.meshgrid(t, t)
    lats, lons = _inv_gnomonic(xg, yg, lat0_deg, lon0_deg)
    xc = 0.25 * (xg[:-1, :-1] + xg[1:, :-1] + xg[:-1, 1:] + xg[1:, 1:])
    yc = 0.25 * (yg[:-1, :-1] + yg[1:, :-1] + yg[:-1, 1:] + yg[1:, 1:])
    lats_c, lons_c = _inv_gnomonic(xc, yc, lat0_deg, lon0_deg)
    c_deg = np.rad2deg(np.arctan(np.hypot(xc, yc)))
    elev = np.clip(90.0 - 4.0 * c_deg, 5.0, 90.0)
    img = np.stack([
        np.round(255 * (0.5 + 0.5 * np.sin(37.0 * xc))),
        np.round(255 * (0.5 + 0.5 * np.cos(41.0 * yc))),
        np.round(255 * c_deg / c_deg.max()),
    ], axis=-1).astype(np.uint8)
    return lats, lons, lats_c, lons_c, elev, img


def _mask_wedge(lats, lons, lats_c, lons_c, elev, img):
    """NaN-mask an azimuthal wedge + a corner blob of a cap (concave
    remaining footprint: exercises outline-from-mask under rotation)."""
    n = lats_c.shape[0]
    yy, xx = np.mgrid[0:n, 0:n]
    cy = cx = (n - 1) / 2.0
    ang = np.degrees(np.arctan2(yy - cy, xx - cx))
    wedge = (ang > 15) & (ang < 70)
    blob = (yy - n * 0.15) ** 2 + (xx - n * 0.8) ** 2 < (n * 0.12) ** 2
    cmask = wedge | blob
    lats_c = lats_c.copy()
    lons_c = lons_c.copy()
    elev = elev.copy()
    lats_c[cmask] = np.nan
    lons_c[cmask] = np.nan
    elev[cmask] = np.nan
    # corners masked where ALL adjacent centers are masked (keeps the
    # sanitize invariants constructible on both sides)
    cpad = np.pad(cmask, 1, constant_values=True)
    corner_dead = (cpad[:-1, :-1] & cpad[1:, :-1]
                   & cpad[:-1, 1:] & cpad[1:, 1:])
    lats = lats.copy()
    lons = lons.copy()
    lats[corner_dead] = np.nan
    lons[corner_dead] = np.nan
    return lats, lons, lats_c, lons_c, elev, img


def make_golden_synthetic(tag, lat0, lon0, half_deg, n, contains_pole,
                          masked=False):
    """Pole / 180-degree-discontinuity resample paths (reference
    resample.py:176-214 + 261-277: rotatePole outline+centers, shifted
    longitudes, rotated-back grids) on a synthetic gnomonic cap, executed
    through the reference GenericMapping (mapping.py:1235-1265)."""
    import datetime as dt

    from auromat.mapping.mapping import GenericMapping
    from auromat.resample import resample as ref_resample

    lats, lons, lats_c, lons_c, elev, img = _gnomonic_cap(
        lat0, lon0, half_deg, n)
    if masked:
        lats, lons, lats_c, lons_c, elev, img = _mask_wedge(
            lats, lons, lats_c, lons_c, elev, img)
    photo_time = dt.datetime(2012, 1, 25, 9, 27, 57)
    cam = np.array([0.0, 0.0, 6871.0])
    m = GenericMapping(lats.copy(), lons.copy(), lats_c.copy(),
                       lons_c.copy(), elev.copy(), 110.0, img.copy(), cam,
                       photo_time, f"synthetic_{tag}")
    r = ref_resample(m, pxPerDeg=PX_PER_DEG, containsPole=contains_pole,
                     method="mean")
    rimg = r.img
    out = os.path.join(RES, f"golden_resample_{tag}.npz")
    np.savez_compressed(
        out,
        px_per_deg=PX_PER_DEG,
        altitude=110.0,
        contains_pole=contains_pole,
        lat0=lat0, lon0=lon0, half_deg=half_deg, n=n,
        in_lats=lats, in_lons=lons, in_lats_center=lats_c,
        in_lons_center=lons_c, in_elevation=elev, in_img=img,
        lats=np.asarray(r.lats.filled(np.nan)),
        lons=np.asarray(r.lons.filled(np.nan)),
        lats_center=np.asarray(r.latsCenter.filled(np.nan)),
        lons_center=np.asarray(r.lonsCenter.filled(np.nan)),
        img=np.asarray(rimg.filled(0)),
        img_mask=np.asarray(np.ma.getmaskarray(rimg)),
        elevation=np.asarray(r.elevation.filled(np.nan), dtype=np.float32),
    )
    print(tag, "->", out, rimg.shape,
          f"{(~np.ma.getmaskarray(rimg)).all(axis=-1).mean():.3f} valid")


def make_golden_methods():
    """Interpolation-method goldens ('nearest'/'linear'/'cubic' through
    scipy griddata + outline masking, reference resample.py:216-259) on a
    mid-latitude synthetic cap (straight path: no pole/discontinuity)."""
    import datetime as dt

    from auromat.mapping.mapping import GenericMapping
    from auromat.resample import resample as ref_resample

    lats, lons, lats_c, lons_c, elev, img = _gnomonic_cap(
        55.0, -100.0, 6.0, 140)
    photo_time = dt.datetime(2012, 1, 25, 9, 27, 57)
    cam = np.array([0.0, 0.0, 6871.0])
    payload = {"px_per_deg": PX_PER_DEG, "altitude": 110.0,
               "in_lats": lats, "in_lons": lons, "in_lats_center": lats_c,
               "in_lons_center": lons_c, "in_elevation": elev, "in_img": img}
    for method in ("nearest", "linear", "cubic"):
        m = GenericMapping(lats.copy(), lons.copy(), lats_c.copy(),
                           lons_c.copy(), elev.copy(), 110.0, img.copy(),
                           cam, photo_time, f"synthetic_{method}")
        r = ref_resample(m, pxPerDeg=PX_PER_DEG, containsPole=False,
                         method=method)
        rimg = r.img
        payload[f"{method}_lats"] = np.asarray(r.lats.filled(np.nan))
        payload[f"{method}_img"] = np.asarray(rimg.filled(0))
        payload[f"{method}_img_mask"] = np.asarray(np.ma.getmaskarray(rimg))
        payload[f"{method}_elevation"] = np.asarray(
            r.elevation.filled(np.nan), dtype=np.float32)
        print("method", method, rimg.shape,
              f"{(~np.ma.getmaskarray(rimg)).all(axis=-1).mean():.3f} valid")
    out = os.path.join(RES, "golden_resample_methods.npz")
    np.savez_compressed(out, **payload)
    print("->", out)


def make_golden_polygons(name):
    """Draw-layer quad decomposition golden: the reference's
    generatePolygonsFromMapping (draw_helpers.py:34-90: QuadMesh-style
    corner stacking + NaN/color-mask filtering) on the RESAMPLED mapping —
    the geometry every stereographic/KML/polar plot renders."""
    from auromat.draw_helpers import generatePolygonsFromMapping
    from auromat.resample import resample as ref_resample

    m = build_reference_mapping(name)
    r = ref_resample(m, pxPerDeg=PX_PER_DEG, containsPole=False,
                     method="mean")
    verts, colors = generatePolygonsFromMapping(r)
    out = os.path.join(RES, f"golden_polygons_{name}.npz")
    np.savez_compressed(out, px_per_deg=PX_PER_DEG, altitude=110.0,
                        verts=np.asarray(verts, dtype=np.float64),
                        colors=np.asarray(colors, dtype=np.uint8))
    print("polygons", name, "->", out, verts.shape, colors.shape)


MASK_POLYGON = [[50.0, -110.0], [50.0, -95.0], [58.0, -95.0], [58.0, -110.0]]


def make_golden_mapprops(name):
    """Mapping-property goldens: centroid (polygonCentroid over the
    outline, reference mapping.py:760-783), cameraFootpoint
    (j2000ToLatLon), arcSecPerPx sampling/aggregation (mapping.py:786-843
    — NOTE the per-pair angular distances flow through the shimmed
    geographiclib, i.e. the repo's own Vincenty, so this gates the
    1000-polygon sampling and statistics, not the geodesic core),
    outline/convex hull pixel sets, and maskedByElevation /
    maskedByPolygon center masks (mapping.py:845-923)."""
    m = build_reference_mapping(name)
    c = m.centroid
    f = m.cameraFootpoint
    s = m.arcSecPerPx
    scales = np.array([[p.mean, p.median, p.min, p.max]
                       for p in (s.width, s.height, s.diagonal)])
    m_elev = m.maskedByElevation(15)
    m_poly = m.maskedByPolygon(np.array(MASK_POLYGON, dtype=np.float64))
    out = os.path.join(RES, f"golden_mapprops_{name}.npz")
    np.savez_compressed(
        out,
        altitude=110.0,
        centroid=[c.lat, c.lon],
        camera_footpoint=[f.lat, f.lon],
        arcsec_per_px=scales,
        outline=np.asarray(m.outline, dtype=np.float64),
        convex_hull=np.asarray(m.outlineConvexHull, dtype=np.float64),
        mask_polygon=np.array(MASK_POLYGON, dtype=np.float64),
        elev15_center_mask=np.asarray(
            np.ma.getmaskarray(m_elev.img)[..., 0]),
        poly_center_mask=np.asarray(np.ma.getmaskarray(m_poly.img)[..., 0]),
    )
    print("mapprops", name, "->", out, "centroid", c, "scales", scales[0])


BBOX_CASES = [
    # (latS, lonW, latN, lonE) per box; merged by the reference
    [(10, -50, 20, -40), (15, -45, 25, -30)],
    [(0, -170, 10, -160), (0, 160, 10, 170)],        # discontinuity merge
    [(-20, 10, -10, 20), (0, 40, 10, 50), (30, 100, 40, 110)],
    [(50, 170, 60, -175), (52, 178, 62, -170)],      # both cross 180
    [(5, -10, 15, 0), (5, 5, 15, 15), (5, -30, 15, -20)],
]
BBOX_WIDE_CASE = [(0.0, -100.0, 10.0, 120.0)]  # 220 deg wide single box


def make_golden_bbox():
    """BoundingBox merge goldens (reference mapping.py:232-275).

    Also pins the reference's np.unwrap defect: for an interval wider
    than 180 deg, unwrap REVERSES it and _minimumBoundingBoxLons returns
    the complement box (the repo fixed its port of this in round 2 — the
    directional (east-west) mod 360 formulation)."""
    from auromat.mapping.mapping import BoundingBox

    merged = []
    for case in BBOX_CASES:
        bb = BoundingBox.mergedBoundingBoxes(
            [BoundingBox(*b) for b in case])
        merged.append([bb.latSouth, bb.lonWest, bb.latNorth, bb.lonEast])
    wide = BoundingBox.mergedBoundingBoxes(
        [BoundingBox(*b) for b in BBOX_WIDE_CASE])
    out = os.path.join(RES, "golden_bbox_merge.npz")
    np.savez_compressed(
        out,
        merged=np.asarray(merged, dtype=np.float64),
        wide_case=np.asarray(BBOX_WIDE_CASE, dtype=np.float64),
        wide_merged=np.asarray(
            [wide.latSouth, wide.lonWest, wide.latNorth, wide.lonEast],
            dtype=np.float64),
        **{f"case{i}": np.asarray(c, dtype=np.float64)
           for i, c in enumerate(BBOX_CASES)},
    )
    print("bbox ->", out, "wide (reference, defect):",
          [wide.lonWest, wide.lonEast])


def make_golden_histogram():
    """util.histogram list-of-weights goldens (reference
    util/histogram.py:32-49 searchsorted variant): random coordinates
    incl. exact-edge and out-of-range points, weights [count, w1, w2]."""
    import auromat.util.histogram as ref_hist

    rng = np.random.RandomState(42)
    n = 20000
    x = rng.uniform(-1.2, 1.3, n)
    y = rng.uniform(-0.1, 1.1, n)
    # exact-edge hits: right-most edge must be inclusive
    x[:50] = 1.0
    y[50:100] = 1.0
    w1 = rng.uniform(0, 255, n)
    w2 = rng.normal(0, 3, n)
    bins = (20, 30)
    rng_box = [[-1.0, 1.0], [0.0, 1.0]]
    hists, xe, ye = ref_hist.histogram2d(
        x, y, bins=bins, range=rng_box, weights=[None, w1, w2])
    out = os.path.join(RES, "golden_histogram2d.npz")
    np.savez_compressed(out, x=x, y=y, w1=w1, w2=w2,
                        bins=np.asarray(bins), range=np.asarray(rng_box),
                        count=hists[0], h1=hists[1], h2=hists[2],
                        xedges=xe, yedges=ye)
    print("histogram ->", out, hists[0].shape, hists[0].sum())


def make_golden_igrf():
    """Geomagnetic dipole pole locations (reference transform.py:740-753:
    IGRF g01/g11/h11 interpolation -> mag_lat/mag_lon) for a spread of
    dates — gates the repo's coefficient table, date->epoch math, and
    pole formula end to end."""
    import datetime as dt

    from auromat.coordinates.transform import northGeomagneticPoleLocation

    dates = [dt.datetime(1975, 6, 1), dt.datetime(1999, 12, 31),
             dt.datetime(2003, 3, 15, 12), dt.datetime(2012, 1, 25, 9, 27),
             dt.datetime(2015, 7, 1), dt.datetime(2019, 11, 30)]
    poles = []
    for d in dates:
        loc = northGeomagneticPoleLocation(d)
        poles.append([float(loc.lat), float(loc.lon)])
    out = os.path.join(RES, "golden_igrf_pole.npz")
    np.savez_compressed(
        out,
        dates=np.array([d.isoformat() for d in dates]),
        poles=np.asarray(poles, dtype=np.float64))
    print("igrf ->", out, poles[3])


if __name__ == "__main__":
    import argparse

    ap = argparse.ArgumentParser()
    ap.add_argument("--only", choices=["frames", "mlatmlt", "synthetic",
                                       "methods", "polygons", "mapprops",
                                       "bbox", "histogram", "igrf"],
                    default=None)
    args = ap.parse_args()
    if args.only in (None, "frames"):
        for name in FRAMES:
            make_golden(name)
    if args.only in (None, "mlatmlt"):
        make_golden_mlatmlt("ISS030-E-102170_dc")
    if args.only in (None, "synthetic"):
        make_golden_synthetic("polar", 90.0, 0.0, 12.0, 220,
                              contains_pole=True)
        make_golden_synthetic("discont", 60.0, 180.0, 8.0, 180,
                              contains_pole=False)
        make_golden_synthetic("polar_masked", 90.0, 0.0, 12.0, 220,
                              contains_pole=True, masked=True)
    if args.only in (None, "methods"):
        make_golden_methods()
    if args.only in (None, "polygons"):
        make_golden_polygons("ISS030-E-102170_dc")
    if args.only in (None, "mapprops"):
        make_golden_mapprops("ISS030-E-102170_dc")
    if args.only in (None, "bbox"):
        make_golden_bbox()
    if args.only in (None, "histogram"):
        make_golden_histogram()
    if args.only in (None, "igrf"):
        make_golden_igrf()
