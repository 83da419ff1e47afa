"""Data-model tests: mask invariants, masking ops, bbox, collections."""

import datetime
import os

import numpy as np
import numpy.ma as ma
import pytest

from auromat_tpu.mapping.mapping import (
    BoundingBox,
    Mapping,
    MappingCollection,
    sanitize_masks,
)
from auromat_tpu.mapping.spacecraft import get_mapping

RES = os.path.join(os.path.dirname(__file__), "resources")


def synthetic_mapping(n=40, lat0=60.0, lon0=-100.0, hole=True):
    sp = np.linspace(0, 10, n + 1)
    lats = lat0 + np.tile(sp, n + 1).reshape(n + 1, n + 1).T
    lons = lon0 + np.tile(sp, n + 1).reshape(n + 1, n + 1)
    if hole:
        r = n * 0.4
        y, x = np.ogrid[-r : r + 1, -r : r + 1]
        mask = np.zeros_like(lats, dtype=bool)
        m = (x**2 + y**2 <= r**2)
        mask[: m.shape[0], : m.shape[1]] = m
        lats[mask] = np.nan
        lons[mask] = np.nan
    step = sp[1] - sp[0]
    lats_c = lats[:-1, :-1] + step / 2
    lons_c = lons[:-1, :-1] + step / 2
    rng = np.random.default_rng(0)
    img = (rng.random((n, n, 3)) * 255).astype(np.uint8)
    elev = np.full((n, n), 45.0)
    return Mapping(
        lats, lons, lats_c, lons_c, elev, 110.0, img,
        np.array([0.0, 0.0, 10000.0]), datetime.datetime(2012, 1, 25, 9, 27, 8),
        "synthetic",
    )


class TestSanitizeMasks:
    def test_fixpoint_simple(self):
        corner = np.zeros((5, 5), dtype=bool)
        center = np.zeros((4, 4), dtype=bool)
        center[1, 1] = True  # one masked centre
        cm, ccm = sanitize_masks(corner, center)
        # a single masked centre does not mask any corner (each corner has
        # other defined neighbours)
        assert not cm.any()
        assert ccm.sum() == 1

    def test_corner_propagation(self):
        corner = np.zeros((5, 5), dtype=bool)
        corner[0, 0] = True
        center = np.zeros((4, 4), dtype=bool)
        cm, ccm = sanitize_masks(corner, center)
        # centre (0,0) loses a corner -> masked
        assert ccm[0, 0]
        assert ccm.sum() == 1
        assert cm[0, 0] and cm.sum() == 1

    def test_isolated_corner_removed(self):
        corner = np.zeros((5, 5), dtype=bool)
        center = np.ones((4, 4), dtype=bool)
        center[3, 3] = False
        cm, ccm = sanitize_masks(corner, center)
        # only corners adjacent to the single live centre survive
        assert (~cm).sum() == 4
        assert not cm[3:5, 3:5].any()


class TestMappingModel:
    def test_guarantees_after_sanitize(self):
        m = synthetic_mapping()
        m.checkGuarantees()

    def test_masked_by_elevation(self):
        m = synthetic_mapping()
        elev = np.asarray(m.elevation.filled(np.nan)).copy()
        elev[:10] = 5.0
        m2 = Mapping(
            m.lats, m.lons, m.latsCenter, m.lonsCenter, elev, m.altitude,
            m.img_unmasked, m.cameraPosGCRS, m.photoTime, m.identifier,
        )
        m3 = m2.maskedByElevation(10)
        m3.checkGuarantees()
        assert m3.center_mask[:10].all()
        assert not m3.center_mask[11:].all()

    def test_masked_by_elevation_all_masked_raises(self):
        m = synthetic_mapping()
        with pytest.raises(ValueError):
            m.maskedByElevation(89.9)

    def test_masked_by_polygon(self):
        m = synthetic_mapping(hole=False)
        poly = [(58.0, -101.0), (58.0, -93.0), (67.0, -93.0), (67.0, -101.0)]
        m2 = m.maskedByPolygon(poly)
        m2.checkGuarantees()
        assert m2.center_mask.any()
        assert (~m2.center_mask).any()

    def test_bounding_box(self):
        m = synthetic_mapping(hole=False)
        bb = m.boundingBox
        assert bb.latSouth == pytest.approx(60.0)
        assert bb.latNorth == pytest.approx(70.0)
        assert bb.lonWest == pytest.approx(-100.0)
        assert bb.lonEast == pytest.approx(-90.0)
        assert not bb.containsPole
        assert not bb.containsDiscontinuity

    def test_centroid(self):
        m = synthetic_mapping(hole=False)
        c = m.centroid
        assert c.lat == pytest.approx(65.0, abs=0.2)
        assert c.lon == pytest.approx(-95.0, abs=0.2)

    def test_mlat_mlt_masks(self):
        m = synthetic_mapping()
        mlat, mlt = m.mLatMlt
        assert np.array_equal(ma.getmaskarray(mlat), m.corner_mask)
        vals = np.asarray(mlt.compressed())
        assert vals.min() >= 0 and vals.max() <= 24

    def test_rgb(self):
        m = synthetic_mapping()
        rgb = m.rgb
        assert rgb.dtype == np.uint8 and rgb.shape[2] == 3


class TestBoundingBox:
    def test_merge_simple(self):
        b1 = BoundingBox(50, -110, 60, -100)
        b2 = BoundingBox(55, -105, 65, -95)
        merged = BoundingBox.mergedBoundingBoxes([b1, b2])
        assert merged == BoundingBox(50, -110, 65, -95)

    def test_merge_discontinuity(self):
        b1 = BoundingBox(50, 170, 60, 179)
        b2 = BoundingBox(50, -179, 60, -170)
        merged = BoundingBox.mergedBoundingBoxes([b1, b2])
        assert merged.lonWest == 170
        assert merged.lonEast == -170
        assert merged.containsDiscontinuity

    def test_center_size(self):
        bb = BoundingBox(50, -110, 60, -100)
        c = bb.center
        assert 54 < c.lat < 56
        assert -106 < c.lon < -104
        # ~10 deg of latitude ~ 1110 km
        assert 1000 < bb.size.height < 1250

    def test_minimum_bbox(self):
        bb = BoundingBox.minimumBoundingBox([(50, -110), (60, -100), (55, -105)])
        assert bb == BoundingBox(50, -110, 60, -100)

    def test_merge_wide_box_roundtrip(self):
        """Intervals wider than 180 deg must survive a merge unchanged
        (np.unwrap previously reversed them, returning the COMPLEMENT)."""
        wide = BoundingBox(10, -170, 60, 170)  # 340 deg through lon 0
        assert BoundingBox.mergedBoundingBoxes([wide]) == wide
        crossing = BoundingBox(10, 170, 60, -170)  # 20 deg through +-180
        assert BoundingBox.mergedBoundingBoxes([crossing]) == crossing

    def test_merge_full_circle(self):
        bb = BoundingBox.mergedBoundingBoxes([BoundingBox(10, -180, 60, 180)])
        assert (bb.lonWest, bb.lonEast) == (-180, 180)

    def test_merge_short_arc_across_discontinuity(self):
        merged = BoundingBox.mergedBoundingBoxes(
            [BoundingBox(10, 150, 20, 170), BoundingBox(10, -170, 20, -150)]
        )
        assert (merged.lonWest, merged.lonEast) == (150, -150)


class TestRealFrame:
    def test_get_mapping_real_frame_guarantees(self):
        m = get_mapping(
            os.path.join(RES, "ISS030-E-102170_dc.jpg"),
            os.path.join(RES, "ISS030-E-102170_dc.wcs"),
            fast_center=True,
        )
        m.checkGuarantees()
        bb = m.boundingBox
        assert 47 < bb.latSouth < 49
        assert 60 < bb.latNorth < 62
        assert -112 < bb.lonWest < -110
        assert -93 < bb.lonEast < -91
        fp = m.cameraFootpoint
        assert 44 < fp.lat < 45.5
        scale = m.arcSecPerPx
        # native ISS pixel scale: median ~6.15 arcsec/px width
        # (docs/userguide/index.rst:133)
        assert 3 < scale.width.median < 12

    @pytest.mark.slow
    def test_masked_by_elevation_real(self):
        m = get_mapping(
            os.path.join(RES, "ISS030-E-102170_dc.jpg"),
            os.path.join(RES, "ISS030-E-102170_dc.wcs"),
            fast_center=True,
        )
        m2 = m.maskedByElevation(10)
        m2.checkGuarantees()
        assert m2.center_mask.sum() > m.center_mask.sum()
        elev = m2.elevation
        assert float(elev.min()) >= 10


class TestCollection:
    def test_collection(self):
        m1 = synthetic_mapping(hole=False)
        m2 = synthetic_mapping(hole=False, lat0=62.0)
        coll = MappingCollection([m1, m2], "test")
        assert len(coll) == 2
        bb = coll.boundingBox
        assert bb.latNorth == pytest.approx(72.0)
        assert coll.photoTime == m1.photoTime


def test_grayscale_rgb_mask_shape():
    """Base Mapping.rgb on 1-channel imagery: the mask must be rebuilt at 3
    channels (found by driving a grayscale mosaic into draw_stereographic —
    ma.masked_array raised MaskError on the (h, w, 1) img mask)."""
    import datetime

    n = 4
    lats = np.tile(np.linspace(50, 53, n + 1)[:, None], (1, n + 1))
    lons = np.tile(np.linspace(10, 13, n + 1)[None, :], (n + 1, 1))
    lats_c = (lats[:-1, :-1] + lats[1:, 1:]) / 2
    lons_c = (lons[:-1, :-1] + lons[1:, 1:]) / 2
    elev = np.full((n, n), 45.0)
    elev[0, 0] = np.nan
    img = np.full((n, n), 1000, np.uint16)
    m = Mapping(lats, lons, lats_c, lons_c, elev, 110.0, img,
                np.zeros(3), datetime.datetime(2012, 1, 1), "gray")
    rgb = m.rgb
    assert rgb.shape == (n, n, 3) and rgb.mask.shape == (n, n, 3)
    assert rgb.mask[0, 0].all() and not rgb.mask[1, 1].any()


class TestBoundingBoxReferenceOracles:
    """The reference's OWN published test values (reference
    test/boundingbox_test.py:12-48) — center/size of the minimum spherical
    rectangle computed there with the real geographiclib (Karney); the
    repo's Vincenty-based geometry agrees to well below the reference's
    own 7-decimal gate (measured ~4e-9 km)."""

    def test_plain(self):
        bb = BoundingBox(latSouth=-60, lonWest=80, latNorth=-30, lonEast=85)
        np.testing.assert_array_almost_equal(
            [bb.center.lat, bb.center.lon], [-45.03119418083877, 82.5])
        np.testing.assert_array_almost_equal(
            [bb.size.width, bb.size.height],
            [482.39311013217343, 3336.5953086140203], decimal=5)

    def test_discontinuity(self):
        bb = BoundingBox(latSouth=-60.646114098, lonWest=82.7852215499,
                         latNorth=-38.7515567117, lonEast=-178.546517062)
        np.testing.assert_array_almost_equal(
            [bb.center.lat, bb.center.lon],
            [-54.33647117488648, 132.11935224395])
        np.testing.assert_array_almost_equal(
            [bb.size.width, bb.size.height],
            [8084.704893634039, 3464.8889697347718], decimal=5)

    def test_poles(self):
        for lat_s, lat_n, clat in [(60, 90, 90), (-90, -60, -90)]:
            bb = BoundingBox(latSouth=lat_s, lonWest=-180, latNorth=lat_n,
                             lonEast=180)
            np.testing.assert_array_almost_equal(
                [bb.center.lat, bb.center.lon], [clat, 0])
            np.testing.assert_array_almost_equal(
                [bb.size.width, bb.size.height],
                [6695.78581964, 6695.78581964], decimal=5)

    def test_point(self):
        bb = BoundingBox(latSouth=50, lonWest=80, latNorth=50, lonEast=80)
        np.testing.assert_array_almost_equal(
            [bb.center.lat, bb.center.lon], [50, 80])
        assert bb.size.width == 0 and bb.size.height == 0

    def test_merge(self):
        bb1 = BoundingBox(latSouth=-55, lonWest=95, latNorth=-45, lonEast=109)
        bb2 = BoundingBox(latSouth=44, lonWest=-164, latNorth=74, lonEast=-35)
        bb = BoundingBox.mergedBoundingBoxes([bb1, bb2])
        np.testing.assert_array_equal(
            [bb.latSouth, bb.latNorth, bb.lonWest, bb.lonEast],
            [bb1.latSouth, bb2.latNorth, bb1.lonWest, bb2.lonEast])
        np.testing.assert_array_almost_equal(
            [bb.center.lat, bb.center.lon], [21.136113246, -150])
