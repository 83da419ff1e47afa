"""Ray/ellipsoid intersection semantics tests.

Covers the same directed/undirected/inside-origin/miss cases the reference
pins down (auromat/test/intersection_test.py) — these NaN semantics are the
masking mechanism of the whole pipeline.
"""

import numpy as np
from numpy.testing import assert_array_almost_equal, assert_array_equal

from auromat_tpu.constants import WGS84_A, WGS84_B
from auromat_tpu.coordinates.intersection import (
    ellipsoid_line_intersection,
    ellipsoid_line_intersects,
    sphere_line_intersection,
)
from auromat_tpu.coordinates.transform import geodetic_to_ecef, unit_vectors

NAN3 = [np.nan, np.nan, np.nan]


class TestSphere:
    def test_simple_hit(self):
        p = sphere_line_intersection(2.0, np.array([0.0, 3, 0]), np.array([0.0, -1, 0]))
        assert_array_equal(np.asarray(p), [0, 2, 0])

    def test_array_hit_and_miss(self):
        dirs = unit_vectors(np.array([[0.0, -1, 0], [-1.0, -1, 0]]))
        p = sphere_line_intersection(2.0, np.array([0.0, 3, 0]), np.asarray(dirs))
        assert_array_equal(np.asarray(p), [[0, 2, 0], NAN3])


class TestEllipsoid:
    def test_undirected_through_earth(self):
        p1 = np.array(geodetic_to_ecef(np.deg2rad(30.0), np.deg2rad(60.0), 0.0))
        p2 = np.array(geodetic_to_ecef(np.deg2rad(-30.0), np.deg2rad(-60.0), 0.0))
        i1 = ellipsoid_line_intersection(
            WGS84_A, WGS84_B, p1, (p1 - p2)[None, :], directed=False
        )
        assert_array_almost_equal(np.asarray(i1), [p1])

    def test_sphere_degenerate(self):
        origin = np.array([0.0, 3, 0])
        dirs = np.array([[0.0, -1, 0], [0.0, -1, 0], [-1.0, -1, 0]])
        p = ellipsoid_line_intersection(2.0, 2.0, origin, dirs)
        assert_array_equal(np.asarray(p), [[0, 2, 0], [0, 2, 0], NAN3])
        hits = ellipsoid_line_intersects(2.0, 2.0, origin, dirs)
        assert_array_equal(np.asarray(hits), [True, True, False])

    def test_directed_behind_origin(self):
        origin = np.array([2.0, 0, 0])
        direction = np.array([[1.0, 0, 0]])  # pointing away from the body

        res = sphere_line_intersection(1.0, origin, direction, directed=False)
        assert_array_equal(np.asarray(res), [[1, 0, 0]])
        res = sphere_line_intersection(1.0, origin, direction, directed=True)
        assert_array_equal(np.asarray(res), [NAN3])

        res = ellipsoid_line_intersection(1.0, 1.0, origin, direction, directed=False)
        assert_array_equal(np.asarray(res), [[1, 0, 0]])
        res = ellipsoid_line_intersection(1.0, 1.0, origin, direction, directed=True)
        assert_array_equal(np.asarray(res), [NAN3])
        assert_array_equal(
            np.asarray(ellipsoid_line_intersects(1.0, 1.0, origin, direction, directed=False)),
            [True],
        )
        assert_array_equal(
            np.asarray(ellipsoid_line_intersects(1.0, 1.0, origin, direction, directed=True)),
            [False],
        )

    def test_directed_from_other_side(self):
        origin = np.array([-2.0, 0, 0])
        direction = np.array([[1.0, 0, 0]])
        res = sphere_line_intersection(1.0, origin, direction, directed=True)
        assert_array_equal(np.asarray(res), [[-1, 0, 0]])
        direction2 = np.array([[-1.0, 0, 0]])
        res = sphere_line_intersection(1.0, origin, direction2, directed=True)
        assert_array_equal(np.asarray(res), [NAN3])

    def test_origin_inside(self):
        origin = np.array([1.0, 0, 0])
        direction = np.array([[1.0, 0, 0]])

        for directed in (False, True):
            res = sphere_line_intersection(2.0, origin, direction, directed=directed)
            assert_array_equal(np.asarray(res), [[2, 0, 0]])
            res = ellipsoid_line_intersection(2.0, 2.0, origin, direction, directed=directed)
            assert_array_equal(np.asarray(res), [[2, 0, 0]])
            assert_array_equal(
                np.asarray(
                    ellipsoid_line_intersects(2.0, 2.0, origin, direction, directed=directed)
                ),
                [True],
            )

        # inside, pointing backwards: directed returns the backward exit
        direction2 = np.array([[-1.0, 0, 0]])
        res = sphere_line_intersection(2.0, origin, direction2, directed=False)
        assert_array_equal(np.asarray(res), [[2, 0, 0]])
        res = sphere_line_intersection(2.0, origin, direction2, directed=True)
        assert_array_equal(np.asarray(res), [[-2, 0, 0]])

    def test_non_unit_direction_ellipsoid(self):
        # ellipsoid intersection must not require unit directions
        origin = np.array([0.0, 3, 0])
        dirs = np.array([[0.0, -7.5, 0]])
        p = ellipsoid_line_intersection(2.0, 2.0, origin, dirs)
        assert_array_almost_equal(np.asarray(p), [[0, 2, 0]])

    def test_oblate_polar_hit(self):
        a, b = 2.0, 1.0
        origin = np.array([0.0, 0, 5])
        dirs = np.array([[0.0, 0, -1], [1.0, 0, 0]])
        p = ellipsoid_line_intersection(a, b, origin, dirs)
        assert_array_almost_equal(np.asarray(p), [[0, 0, 1], NAN3])
