"""Spacetrack archive maintenance logic (no network: the coverage and
checksum-filter helpers are pure file/line functions)."""

import os
from datetime import datetime, timedelta

import numpy as np
import pytest

from auromat_tpu.coordinates.spacetrack import Spacetrack
from tests.test_ephem import make_tle


def _write_archive(path, epochs):
    lines = []
    for e in epochs:
        l1, l2 = make_tle(e, 51.6, 100.0, 0.0005, 90.0, 0.0, 15.5)
        lines += [l1, l2]
    with open(path, "w") as f:
        f.write("\n".join(lines) + "\n")


@pytest.fixture
def st(tmp_path):
    return Spacetrack("user", "pw", str(tmp_path))


class TestCoverage:
    def test_contiguous_archive_covers(self, st, tmp_path):
        path = tmp_path / "25544.tle"
        epochs = [datetime(2012, 1, 1) + timedelta(days=d)
                  for d in range(0, 30, 2)]
        _write_archive(path, epochs)
        assert st._covers(str(path), datetime(2012, 1, 2),
                          datetime(2012, 1, 25))

    def test_gapped_archive_does_not_cover(self, st, tmp_path):
        """Append-ordered disjoint ranges: first/last epochs span the
        request but the interior has a weeks-long hole — skipping the
        download here would silently extrapolate SGP4 across the gap."""
        path = tmp_path / "25544.tle"
        may = [datetime(2012, 5, 1) + timedelta(days=d) for d in range(5)]
        aug = [datetime(2012, 8, 1) + timedelta(days=d) for d in range(5)]
        _write_archive(path, may + aug)  # append order, sorted here
        assert not st._covers(str(path), datetime(2012, 6, 10),
                              datetime(2012, 6, 20))

    def test_unsorted_archive_order_is_handled(self, st, tmp_path):
        path = tmp_path / "25544.tle"
        late = [datetime(2012, 3, 1) + timedelta(days=d) for d in range(10)]
        early = [datetime(2012, 2, 25) + timedelta(days=d) for d in range(5)]
        _write_archive(path, late + early)  # later range appended FIRST
        assert st._covers(str(path), datetime(2012, 2, 26),
                          datetime(2012, 3, 8))

    def test_future_end_clamped_to_now(self, st, tmp_path):
        """update_tles_for pads the range +2 days into the future; no
        published TLE can reach it, so coverage clamps to now — otherwise
        min_update_interval is never honored and every call re-queries."""
        path = tmp_path / "25544.tle"
        now = datetime.now()
        epochs = [now - timedelta(days=5) + timedelta(days=d * 0.5)
                  for d in range(11)]  # up to ~now
        _write_archive(path, epochs)
        assert st._covers(str(path), now - timedelta(days=4),
                          now + timedelta(days=2))


class TestChecksumFilter:
    def test_drops_whole_pair_on_one_bad_line(self):
        e = datetime(2012, 1, 1)
        l1a, l2a = make_tle(e, 51.6, 100.0, 0.0005, 90.0, 0.0, 15.5)
        l1b, l2b = make_tle(e + timedelta(days=1), 51.6, 100.0, 0.0005,
                            90.0, 0.0, 15.5)
        bad_l2a = l2a[:-1] + ("0" if l2a[-1] != "0" else "1")
        out = Spacetrack._checksum_filter([l1a, bad_l2a, l1b, l2b])
        # the first ENTRY is dropped entirely: no orphan line 1 that the
        # parser would misread as a name line of the next TLE
        assert out == [l1b, l2b]

    def test_name_line_kept_with_intact_pair(self):
        e = datetime(2012, 1, 1)
        l1, l2 = make_tle(e, 51.6, 100.0, 0.0005, 90.0, 0.0, 15.5)
        out = Spacetrack._checksum_filter(["ISS (ZARYA)", l1, l2])
        assert out == ["ISS (ZARYA)", l1, l2]
        bad_l1 = l1[:-1] + ("0" if l1[-1] != "0" else "1")
        out = Spacetrack._checksum_filter(["ISS (ZARYA)", bad_l1, l2])
        assert out == []
