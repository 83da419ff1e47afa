"""Small util-module tests (decorators, osutil, url plumbing)."""

import numpy as np
import pytest

from auromat_tpu.util.decorators import inherit_docs, lazy_property, printoptions


class TestDecorators:
    def test_lazy_property_computed_once(self):
        calls = []

        class C:
            @lazy_property
            def value(self):
                calls.append(1)
                return 42

        c = C()
        assert c.value == 42 and c.value == 42
        assert len(calls) == 1
        assert len(C().__class__.__mro__) >= 1  # separate instance recomputes
        d = C()
        assert d.value == 42
        assert len(calls) == 2

    def test_inherit_docs(self):
        class A:
            def f(self):
                """Base docs."""

        @inherit_docs
        class B(A):
            def f(self):
                pass

        assert B.f.__doc__ == "Base docs."

    def test_printoptions_restores(self):
        before = np.get_printoptions()["precision"]
        with printoptions(precision=2):
            assert np.get_printoptions()["precision"] == 2
        assert np.get_printoptions()["precision"] == before


class TestUtils:
    def test_polygon_area_centroid(self):
        from auromat_tpu.utils import polygon_area, polygon_centroid

        square = np.array([[0.0, 0.0], [2.0, 0.0], [2.0, 2.0], [0.0, 2.0]])
        assert abs(polygon_area(square) - 4.0) < 1e-12
        np.testing.assert_allclose(polygon_centroid(square), [1.0, 1.0])

    def test_points_inside_polygon(self):
        from auromat_tpu.utils import points_inside_polygon

        square = np.array([[0.0, 0.0], [2.0, 0.0], [2.0, 2.0], [0.0, 2.0]])
        pts = np.array([[1.0, 1.0], [3.0, 1.0]])
        inside = points_inside_polygon(pts, square)
        assert inside[0] and not inside[1]

    def test_find_nearest(self):
        from auromat_tpu.utils import find_nearest

        a = np.array([1.0, 3.0, 7.0, 10.0])
        assert find_nearest(a, 6.0) == 2
