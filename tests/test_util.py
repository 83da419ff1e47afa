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


class TestFitsChecksum:
    def test_checksum_property_randomized(self, tmp_path):
        """The defining FITS checksum property: the ones-complement sum of
        the final header (with the encoded CHECKSUM chars in place) plus
        the data folds to 0xFFFFFFFF. Randomized headers exercise the
        end-around carry and the excluded-character shifting."""
        import numpy as np

        from auromat_tpu.io import fits as f

        rng = np.random.default_rng(9)
        for trial in range(60):
            h = f.FitsHeader()
            h["SIMPLE"] = True
            for k in range(int(rng.integers(1, 12))):
                h[f"K{k:06d}"] = float(rng.uniform(-1e10, 1e10))
            data = rng.integers(0, 256, int(rng.integers(0, 4000)),
                                dtype=np.uint8).tobytes()
            data += b"\x00" * ((-len(data)) % 2880)
            f.set_checksums(h, data)
            path = str(tmp_path / f"c{trial}.fits")
            f.write_header(h, path)
            blob = open(path, "rb").read()
            assert f.verify_checksum(blob, data), trial
            # encoded chars are strictly alphanumeric
            assert all(c.isalnum() for c in h["CHECKSUM"]), h["CHECKSUM"]

    def test_encode_known_zero(self):
        # complement of 0xFFFFFFFF is 0 -> all '0' chars
        from auromat_tpu.io.fits import _encode_checksum

        assert _encode_checksum(0xFFFFFFFF) == "0" * 16


class TestTimeutil:
    def test_contains_leap_second(self):
        from datetime import datetime, timezone

        from auromat_tpu.timeutil import contains_leap_second

        assert contains_leap_second(datetime(2012, 6, 30, 12),
                                    datetime(2012, 7, 1, 12))
        # range starting exactly at the insertion instant excludes the
        # 23:59:60 second
        assert not contains_leap_second(datetime(2012, 7, 1),
                                        datetime(2012, 12, 1))
        # argument order is normalized
        assert contains_leap_second(datetime(2017, 1, 1),
                                    datetime(2016, 12, 31))
        assert not contains_leap_second(datetime(1999, 1, 1),
                                        datetime(2005, 12, 1))
        # tz-aware datetimes work
        assert contains_leap_second(
            datetime(2015, 6, 30, 23, 59, tzinfo=timezone.utc),
            datetime(2015, 7, 1, 0, 1, tzinfo=timezone.utc))
        # non-UTC zones are converted, not taken as UTC calendar dates:
        # 08:00-10:00 +09:00 on July 1 is 23:00-01:00 UTC across the
        # 2015-06-30 leap second
        from datetime import timedelta, timezone as tz

        tz9 = tz(timedelta(hours=9))
        assert contains_leap_second(datetime(2015, 7, 1, 8, tzinfo=tz9),
                                    datetime(2015, 7, 1, 10, tzinfo=tz9))
        assert not contains_leap_second(datetime(2015, 6, 30, 8, tzinfo=tz9),
                                        datetime(2015, 6, 30, 10, tzinfo=tz9))

    def test_cdflib_leap_table_derived(self):
        """cdflib's (date, TAI-UTC) pairs come from the canonical timeutil
        table: spot-check offsets around insertions."""
        from datetime import datetime

        from auromat_tpu.io.cdflib import _LEAP_SECONDS, _tai_minus_utc

        assert _LEAP_SECONDS[0] == (datetime(1972, 1, 1), 10)
        assert _LEAP_SECONDS[-1] == (datetime(2017, 1, 1), 37)
        assert _tai_minus_utc(datetime(2012, 1, 25)) == 34
        assert _tai_minus_utc(datetime(2012, 7, 1)) == 35
