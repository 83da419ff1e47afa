"""End-to-end RESAMPLE parity vs the executed reference implementation.

Goldens (tests/resources/golden_resample_*.npz) were produced by running
the reference's full chain — BaseAstrometryMapping lazy pyramid
(pix2world/intersection/j2000ToLatLon/elevation/sanitize) into
resample(pxPerDeg=25, method='mean') (reference resample.py:73-368) — via
tools/make_ref_goldens_resample.py. This gates the repo's complete L2-L5
path: fixed-grid global alignment, bounding box, mean binning,
uint8 round-trip, elevation channel, and mask semantics.
"""

import os

import numpy as np
import pytest

from auromat_tpu.mapping.spacecraft import get_mapping
from auromat_tpu.resample import resample

RES = os.path.join(os.path.dirname(__file__), "resources")
FRAMES = ["ISS030-E-102170_dc", "ISS029-E-8492"]


@pytest.fixture(scope="module", params=FRAMES)
def frame_pair(request):
    name = request.param
    golden = np.load(os.path.join(RES, f"golden_resample_{name}.npz"))
    m = get_mapping(os.path.join(RES, f"{name}.jpg"),
                    os.path.join(RES, f"{name}.wcs"),
                    altitude=float(golden["altitude"]))
    r = resample(m, px_per_deg=float(golden["px_per_deg"]))
    return golden, r


def test_grid_alignment(frame_pair):
    """Same fixed-grid extent and cell coordinates as the reference."""
    golden, r = frame_pair
    lats = np.asarray(r.lats.filled(np.nan))
    lons = np.asarray(r.lons.filled(np.nan))
    assert lats.shape == golden["lats"].shape, (
        "fixed-grid extent mismatch: the reference's global alignment "
        f"produced {golden['lats'].shape}, repo {lats.shape}")
    for ours, ref in [(lats, golden["lats"]), (lons, golden["lons"]),
                      (np.asarray(r.latsCenter.filled(np.nan)),
                       golden["lats_center"]),
                      (np.asarray(r.lonsCenter.filled(np.nan)),
                       golden["lons_center"])]:
        both = ~np.isnan(ours) & ~np.isnan(ref)
        assert both.any()
        assert np.abs(ours[both] - ref[both]).max() < 1e-9


def test_image_binning(frame_pair):
    """The binned uint8 image matches the reference's histogram2d mean
    path. Pixels whose f64 coordinates differ from the reference chain at
    ~1e-12 deg can flip bins only within ~1e-12 deg of a cell edge — with
    12M samples the expected count is << 1, but the gate allows a handful
    of single-step differences so it cannot go flaky."""
    golden, r = frame_pair
    img = r.img
    assert img.dtype == golden["img"].dtype == np.uint8
    mask = np.ma.getmaskarray(img)
    gmask = golden["img_mask"]
    # masks must be identical except possibly edge-flip cells
    mask_diff = (mask != gmask).any(axis=-1).sum()
    assert mask_diff <= 4, f"{mask_diff} cells differ in mask"
    both = ~mask.any(axis=-1) & ~gmask.any(axis=-1)
    ours = np.asarray(img.filled(0))[both].astype(np.int64)
    ref = golden["img"][both].astype(np.int64)
    diff = np.abs(ours - ref)
    # a bin-edge flip moves one sample between two ~2000-sample means:
    # sub-count change; rounding can then step the uint8 by 1
    assert (diff > 1).sum() == 0, f"max uint8 diff {diff.max()}"
    assert (diff == 1).mean() < 1e-3, f"{(diff == 1).sum()} cells off by 1"


def test_elevation_binning(frame_pair):
    golden, r = frame_pair
    elev = np.asarray(r.elevation.filled(np.nan))
    ref = golden["elevation"]
    assert np.isnan(elev).sum() == np.isnan(ref).sum() or \
        abs(int(np.isnan(elev).sum()) - int(np.isnan(ref).sum())) <= 4
    both = ~np.isnan(elev) & ~np.isnan(ref)
    assert both.any()
    # golden stored as float32; sums agree to f64 — gate at f32 resolution
    assert np.abs(elev[both] - ref[both]).max() < 1e-4


def _gate_grids(r, golden, tol):
    lats = np.asarray(r.lats.filled(np.nan))
    assert lats.shape == golden["lats"].shape, (
        f"fixed-grid extent mismatch: reference {golden['lats'].shape}, "
        f"repo {lats.shape}")
    for la_o, lo_o, la_r, lo_r in [
            (lats, np.asarray(r.lons.filled(np.nan)),
             golden["lats"], golden["lons"]),
            (np.asarray(r.latsCenter.filled(np.nan)),
             np.asarray(r.lonsCenter.filled(np.nan)),
             golden["lats_center"], golden["lons_center"])]:
        both = ~np.isnan(la_o) & ~np.isnan(la_r)
        assert both.any()
        dlat = np.abs(la_o[both] - la_r[both])
        dlon = np.abs(lo_o[both] - lo_r[both])
        dlon = np.minimum(dlon, 360.0 - dlon)  # ±180 wrap
        # longitude is ill-conditioned approaching a pole (undefined AT it
        # — the polar synthetic grid has one cell landing on lat 90 where
        # both sides emit an arbitrary lon): weight by cos(lat)
        d = np.maximum(dlat, dlon * np.cos(np.deg2rad(la_r[both])))
        assert d.max() < tol, f"max grid coord diff {d.max()}"


def _gate_binning(r, golden, max_mask_diff=4, frac_off1=1e-3):
    img = r.img
    mask = np.ma.getmaskarray(img)
    gmask = golden["img_mask"]
    mask_diff = (mask != gmask).any(axis=-1).sum()
    assert mask_diff <= max_mask_diff, f"{mask_diff} cells differ in mask"
    both = ~mask.any(axis=-1) & ~gmask.any(axis=-1)
    ours = np.asarray(img.filled(0))[both].astype(np.int64)
    ref = golden["img"][both].astype(np.int64)
    diff = np.abs(ours - ref)
    assert (diff > 1).sum() == 0, f"max uint8 diff {diff.max()}"
    assert (diff == 1).mean() < frac_off1, f"{(diff == 1).sum()} cells off by 1"


class TestSyntheticPaths:
    """Pole / 180°-discontinuity resample paths vs the executed reference
    (reference resample.py:176-214, 261-277: rotatePole outline+center
    rotation, shifted longitudes, rotated-back output grids) on a
    synthetic all-valid gnomonic cap. The golden stores the INPUT arrays,
    so both chains consume bit-identical mappings."""

    @pytest.fixture(scope="class",
                    params=["polar", "discont", "polar_masked"])
    def pair(self, request):
        from datetime import datetime

        from auromat_tpu.mapping.mapping import Mapping

        golden = np.load(os.path.join(
            RES, f"golden_resample_{request.param}.npz"))
        m = Mapping(golden["in_lats"], golden["in_lons"],
                    golden["in_lats_center"], golden["in_lons_center"],
                    golden["in_elevation"], 110.0, golden["in_img"],
                    [0.0, 0.0, 6871.0], datetime(2012, 1, 25, 9, 27, 57),
                    f"synthetic_{request.param}")
        r = resample(m, px_per_deg=float(golden["px_per_deg"]),
                     contains_pole=bool(golden["contains_pole"]))
        return golden, r

    def test_grids(self, pair):
        golden, r = pair
        # rotated-back grids go through geodetic→ECEF→rotate→Bowring on
        # both sides: f64 parity
        _gate_grids(r, golden, tol=1e-8)

    def test_binning(self, pair):
        golden, r = pair
        _gate_binning(r, golden)

    def test_elevation(self, pair):
        golden, r = pair
        elev = np.asarray(r.elevation.filled(np.nan))
        ref = golden["elevation"]
        both = ~np.isnan(elev) & ~np.isnan(ref)
        assert both.any()
        assert np.abs(elev[both] - ref[both]).max() < 1e-4


class TestInterpMethods:
    """'nearest'/'linear'/'cubic' vs the executed reference (scipy
    griddata + concave-outline masking, reference resample.py:216-259) on
    a mid-latitude synthetic cap. nearest/linear are bit-exact incl.
    masks; cubic differs ONLY where the interpolant overshoots the uint8
    range — the reference np.require-casts the rounded float (wraps
    modulo 256, resample.py:132), the repo deliberately clamps
    (_finalize_int_image) — the gate asserts exactly that signature."""

    @pytest.fixture(scope="class")
    def golden(self):
        return np.load(os.path.join(RES, "golden_resample_methods.npz"))

    @pytest.fixture(scope="class")
    def mapping(self, golden):
        from datetime import datetime

        from auromat_tpu.mapping.mapping import Mapping

        return Mapping(golden["in_lats"], golden["in_lons"],
                       golden["in_lats_center"], golden["in_lons_center"],
                       golden["in_elevation"], 110.0, golden["in_img"],
                       [0.0, 0.0, 6871.0], datetime(2012, 1, 25, 9, 27, 57),
                       "synthetic_methods")

    @pytest.mark.parametrize("method", ["nearest", "linear", "cubic"])
    def test_method(self, golden, mapping, method):
        r = resample(mapping, px_per_deg=float(golden["px_per_deg"]),
                     contains_pole=False, method=method)
        img = r.img
        assert np.asarray(img).shape == golden[f"{method}_img"].shape
        mask = np.ma.getmaskarray(img)
        gmask = golden[f"{method}_img_mask"]
        assert (mask != gmask).sum() == 0, "outline masking differs"
        both = ~mask.any(axis=-1) & ~gmask.any(axis=-1)
        ours = np.asarray(img.filled(0)).astype(np.int64)
        ref = golden[f"{method}_img"].astype(np.int64)
        diff = np.abs(ours - ref)
        diff[~both] = 0
        overshoot = diff > 1
        if method == "cubic":
            # clamp-vs-wrap cells: repo value pinned at an endpoint
            assert overshoot.sum() < 100
            assert np.isin(ours[overshoot], (0, 255)).all(), (
                "non-endpoint repo value at a large diff: not the "
                "clamp-vs-wrap deviation")
            diff[overshoot] = 0
        assert (diff > 1).sum() == 0
        assert (diff == 1).mean() < 1e-3
        elev = np.asarray(r.elevation.filled(np.nan))
        ge = golden[f"{method}_elevation"]
        b = ~np.isnan(elev) & ~np.isnan(ge)
        assert b.any()
        # golden elevation stored f32
        assert np.abs(elev[b] - ge[b]).max() < 1e-4


def test_histogram2d_parity():
    """util.histogram.histogram2d list-of-weights host API vs the
    executed reference vendored histogram (util/histogram.py:32-49):
    identical counts and weight sums incl. right-edge-inclusive and
    out-of-range points."""
    from auromat_tpu.util.histogram import histogram2d

    g = np.load(os.path.join(RES, "golden_histogram2d.npz"))
    hists, xe, ye = histogram2d(
        g["x"], g["y"], bins=tuple(g["bins"]),
        range=[list(r) for r in g["range"]],
        weights=[None, g["w1"], g["w2"]])
    assert np.array_equal(xe, g["xedges"])
    assert np.array_equal(ye, g["yedges"])
    assert np.array_equal(hists[0], g["count"])
    assert np.abs(hists[1] - g["h1"]).max() < 1e-9
    assert np.abs(hists[2] - g["h2"]).max() < 1e-9


def test_bbox_merge_parity():
    """BoundingBox.mergedBoundingBoxes vs the executed reference
    (mapping.py:232-275) on overlap / discontinuity / multi-box cases,
    plus the pinned deviation: for an interval wider than 180 deg the
    reference's np.unwrap REVERSES it and returns the COMPLEMENT box
    (golden: west=120, east=-100 for a (-100..120) box); the repo's
    directional (east-west) mod 360 formulation returns the box itself."""
    from auromat_tpu.mapping.mapping import BoundingBox

    golden = np.load(os.path.join(RES, "golden_bbox_merge.npz"))
    merged = golden["merged"]
    i = 0
    while f"case{i}" in golden:
        case = golden[f"case{i}"]
        bb = BoundingBox.mergedBoundingBoxes(
            [BoundingBox(*map(float, b)) for b in case])
        ours = np.array([bb.latSouth, bb.lonWest, bb.latNorth, bb.lonEast])
        assert np.abs(ours - merged[i]).max() < 1e-9, (i, ours, merged[i])
        i += 1
    assert i == len(merged)

    wide = golden["wide_case"][0]
    bb = BoundingBox.mergedBoundingBoxes([BoundingBox(*map(float, wide))])
    # reference golden is the complement (unwrap defect)
    ref = golden["wide_merged"]
    assert abs(ref[1] - 120.0) < 1e-9 and abs(ref[3] - (-100.0)) < 1e-9
    # repo: the box itself
    assert abs(bb.lonWest - (-100.0)) < 1e-9
    assert abs(bb.lonEast - 120.0) < 1e-9


def test_mapping_properties_parity():
    """Mapping-level property parity vs the executed reference
    (mapping.py:760-923): centroid (signed-area polygonCentroid over the
    outline), cameraFootpoint, arcSecPerPx sampling statistics, the
    outline point multiset, convex-hull geometry, and maskedByElevation /
    maskedByPolygon center masks (bit-exact)."""
    name = "ISS030-E-102170_dc"
    golden = np.load(os.path.join(RES, f"golden_mapprops_{name}.npz"))
    m = get_mapping(os.path.join(RES, f"{name}.jpg"),
                    os.path.join(RES, f"{name}.wcs"),
                    altitude=float(golden["altitude"]))
    c, f = m.centroid, m.cameraFootpoint
    assert abs(c.lat - golden["centroid"][0]) < 1e-9
    assert abs(c.lon - golden["centroid"][1]) < 1e-9
    assert abs(f.lat - golden["camera_footpoint"][0]) < 1e-9
    assert abs(f.lon - golden["camera_footpoint"][1]) < 1e-9
    s = m.arcSecPerPx
    scales = np.array([[p.mean, p.median, p.min, p.max]
                       for p in (s.width, s.height, s.diagonal)])
    # NOTE: the reference's per-pair distances flow through the shimmed
    # geographiclib (backed by the repo solver) — this gates the
    # 1000-polygon sampling/aggregation, not the geodesic core (which has
    # its own direct-problem oracle tests)
    assert np.abs(scales / golden["arcsec_per_px"] - 1).max() < 1e-9

    # outline: same point multiset (traversal start/orientation may differ)
    ro, go = np.asarray(m.outline), golden["outline"]
    assert ro.shape == go.shape
    rs = ro[np.lexsort(ro.T)]
    gs = go[np.lexsort(go.T)]
    assert np.abs(rs - gs).max() < 1e-9

    # convex hull: the reference emits every point on hull facets (7k+
    # collinear pixel-grid points, utils.py:245-275), the repo the minimal
    # vertex set — gate geometric equivalence: repo vertices are reference
    # hull points, and all reference points lie inside the repo hull
    rh, gh = np.asarray(m.outlineConvexHull), golden["convex_hull"]
    ref_set = set(map(tuple, np.round(gh, 9)))
    assert all(tuple(p) in ref_set for p in np.round(rh, 9))
    # both hulls are convex in PIXEL space; mapped to lat/lon the facet
    # midpoints bow off the vertex-to-vertex chords, so lat/lon
    # point-in-polygon containment is not a valid equivalence test. The
    # subset check above plus identical angular extents pin the geometry.
    assert np.abs(rh.min(axis=0) - gh.min(axis=0)).max() < 1e-9
    assert np.abs(rh.max(axis=0) - gh.max(axis=0)).max() < 1e-9

    me = m.maskedByElevation(15)
    assert (np.ma.getmaskarray(me.img)[..., 0]
            == golden["elev15_center_mask"]).all()
    mp = m.maskedByPolygon(golden["mask_polygon"])
    assert (np.ma.getmaskarray(mp.img)[..., 0]
            == golden["poly_center_mask"]).all()


def test_polygon_decomposition_parity():
    """Draw-layer quad decomposition vs the executed reference
    generatePolygonsFromMapping (reference draw_helpers.py:34-90) on the
    resampled mapping — the geometry every stereographic/KML/polar plot
    renders. Same quads, same order, same colors; the reference emits
    (lat, lon) vertices, the repo plot-order (x=lon, y=lat)."""
    name = "ISS030-E-102170_dc"
    golden = np.load(os.path.join(RES, f"golden_polygons_{name}.npz"))
    m = get_mapping(os.path.join(RES, f"{name}.jpg"),
                    os.path.join(RES, f"{name}.wcs"),
                    altitude=float(golden["altitude"]))
    r = resample(m, px_per_deg=float(golden["px_per_deg"]))
    from auromat_tpu.draw_helpers import polygons_from_mapping_or_collection

    verts, colors = polygons_from_mapping_or_collection(r)
    ref_verts = golden["verts"][:, :, ::-1]  # (lat,lon) -> (lon,lat)
    assert verts.shape == ref_verts.shape, (
        f"quad count/order differs: {verts.shape} vs {ref_verts.shape}")
    assert np.abs(verts - ref_verts).max() < 1e-9
    ref_colors = golden["colors"].astype(np.float64) / 255.0
    assert np.abs(colors[:, :3] - ref_colors).max() == 0.0


def test_mlatmlt_parity():
    """resample_mlat_mlt vs the executed reference resampleMLatMLT
    (reference resample.py:63-71 + mapping.py:1519-1559): gates the GEO→SM
    mapping conversion, mean binning on the regular-MLat/MLT grid, and the
    SM→GEO conversion of the output grid LONGITUDES exactly.

    Output LATITUDES deliberately deviate: the reference's smToLatLon
    (transform.py:461-485) evaluates Bowring on the UNIT-RADIUS point
    (1 km from the Earth's centre), saturating geodetic latitude towards
    ±90° (this frame: ~89.3° where the footprint sits at ~60°) — not the
    inverse of its own forward GEO→SM chain. The repo intersects the SM
    ray at the mapping altitude instead (sm_to_latlon docstring). Here we
    (a) REPRODUCE the reference's unit-radius computation from the repo's
    own SM grids and gate it against the golden — proving the deviation is
    exactly understood — and (b) gate the corrected lats by round-trip:
    the output mapping's own mLatMlt must reproduce the regular MLat grid.
    """
    name = "ISS030-E-102170_dc"
    golden = np.load(os.path.join(RES, f"golden_resample_mlatmlt_{name}.npz"))
    m = get_mapping(os.path.join(RES, f"{name}.jpg"),
                    os.path.join(RES, f"{name}.wcs"),
                    altitude=float(golden["altitude"]))
    from auromat_tpu.mapping.mapping import convert_mapping_to_sm
    from auromat_tpu.resample import resample, resample_mlat_mlt

    r = resample_mlat_mlt(m, px_per_deg=float(golden["px_per_deg"]),
                          contains_pole=False)
    # binning is performed on the SM grid — independent of the geo
    # conversion of the output coordinates
    assert np.asarray(r.lats).shape == golden["lats"].shape
    _gate_binning(r, golden)
    elev = np.asarray(r.elevation.filled(np.nan))
    refe = golden["elevation"]
    both = ~np.isnan(elev) & ~np.isnan(refe)
    assert both.any()
    assert np.abs(elev[both] - refe[both]).max() < 1e-4

    # longitudes: unaffected by the unit-radius defect — exact parity
    lons = np.asarray(r.lons.filled(np.nan))
    bothl = ~np.isnan(lons) & ~np.isnan(golden["lons"])
    assert bothl.any()
    assert np.abs(lons[bothl] - golden["lons"][bothl]).max() < 1e-9

    # (a) reproduce the reference's unit-radius latitude from the repo's
    # regular SM grid: Bowring on the unit direction vector
    import jax.numpy as jnp

    from auromat_tpu.coordinates.transform import (apply_rotation_vecs,
                                                   ecef_to_geodetic,
                                                   spherical_to_cartesian)
    from auromat_tpu.utils import host_f64_device

    sm_r = resample(convert_mapping_to_sm(m),
                    px_per_deg=float(golden["px_per_deg"]),
                    contains_pole=False)
    with host_f64_device():
        x, y, z = spherical_to_cartesian(
            None, jnp.deg2rad(sm_r.lats.data), jnp.deg2rad(sm_r.lons.data))
        g = apply_rotation_vecs(sm_r.frame_matrices.sm_to_geo,
                                jnp.stack([x, y, z], axis=-1))
        buggy_lat, _ = ecef_to_geodetic(g[..., 0], g[..., 1], g[..., 2])
    buggy_lat = np.rad2deg(np.asarray(buggy_lat))
    bothb = bothl  # same mask
    assert np.abs(buggy_lat[bothb] - golden["lats"][bothb]).max() < 1e-9

    # (b) corrected lats round-trip: mLatMlt of the output reproduces the
    # regular MLat grid
    mlat, _ = r.mLatMlt
    mlat = np.asarray(mlat.filled(np.nan))
    ref_mlat = np.asarray(sm_r.lats.data)
    bothm = ~np.isnan(mlat) & bothl
    assert bothm.any()
    assert np.abs(mlat[bothm] - ref_mlat[bothm]).max() < 1e-6
