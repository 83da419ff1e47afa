"""Sequence solving for spacecraft imagery: EXIF times + TLEs + solve-field.

Orchestration mirroring auromat/solving/spacecraft.py:28-159: read EXIF
capture times, update the TLE archive, blind-solve each frame (skipping
already-solved ones — the implicit checkpoint/resume of the system,
SURVEY.md section 5), and stamp NORAD id + TLE-derived camera position into
each solved header.
"""

import os

import numpy as np

from auromat_tpu.coordinates.ephem import EphemerisCalculator
from auromat_tpu.io import fits
from auromat_tpu.io.image import read_exif_time
from auromat_tpu.solving.solving import solve_image

ISS_NORAD_ID = 25544


def solve_sequence(image_dir, wcs_dir, tle_path=None, norad_id=ISS_NORAD_ID,
                   spacetrack_user=None, spacetrack_password=None,
                   overwrite=False, **solve_kw):
    """Solve every image in ``image_dir`` into ``wcs_dir``.

    :param tle_path: TLE archive file; if None and space-track credentials
        are given, the archive is downloaded/updated first
    :returns: dict image filename -> wcs path or None
    """
    os.makedirs(wcs_dir, exist_ok=True)
    images = sorted(
        f for f in os.listdir(image_dir)
        if os.path.splitext(f)[1].lower() in (".jpg", ".jpeg", ".png", ".tif", ".tiff")
    )
    times = {}
    for f in images:
        t = read_exif_time(os.path.join(image_dir, f))
        if t is not None:
            times[f] = t

    if tle_path is None and spacetrack_user:
        from auromat_tpu.coordinates.spacetrack import Spacetrack

        st = Spacetrack(spacetrack_user, spacetrack_password, wcs_dir)
        tle_path = st.update_tles_for(norad_id, list(times.values()))

    calc = None
    if tle_path and os.path.exists(tle_path):
        calc = EphemerisCalculator(tle_path, norad_id=norad_id)

    results = {}
    for f in images:
        base = os.path.splitext(f)[0]
        wcs_path = os.path.join(wcs_dir, base + ".wcs")
        if os.path.exists(wcs_path) and not overwrite:
            results[f] = wcs_path  # already solved: skip (resume semantics)
            continue
        solved = solve_image(os.path.join(image_dir, f), wcs_path, **solve_kw)
        if solved is None:
            results[f] = None
            continue
        header = fits.read_header(solved)
        fits.set_norad_id(header, norad_id)
        t = times.get(f)
        if t is not None and calc is not None:
            pos = calc(t)
            fits.set_spacecraft_position(header, np.asarray(pos), t)
        fits.write_header(header, solved)
        results[f] = solved
    return results


def intersects_earth(header, altitude=110.0):
    """Plausibility: do any frame rays hit the inflated Earth?

    Reference spacecraft.py:508-522 sanity-checks solutions this way.
    """
    from auromat_tpu.coordinates.wcs import TanWcs
    from auromat_tpu.mapping.spacecraft import resolve_camera_position
    from auromat_tpu.ops.georef import GeorefParams, georeference_points

    wcs = TanWcs(header)
    pos, photo_time, _ = resolve_camera_position(header)
    params = GeorefParams.from_wcs(wcs, pos, photo_time, altitude)
    xs = np.linspace(0, wcs.width - 1, 32)
    ys = np.linspace(0, wcs.height - 1, 32)
    px, py = np.meshgrid(xs, ys)
    lat, _ = georeference_points(params, px, py)
    return bool(np.isfinite(np.asarray(lat)).any())


def is_consistent(header, altitude=110.0):
    """Solve-sanity check: the Earth must intersect the frame from below
    (the reference additionally checks quad stars aren't Earth-covered,
    spacecraft.py:523-555)."""
    from auromat_tpu.coordinates.wcs import TanWcs
    from auromat_tpu.mapping.spacecraft import resolve_camera_position
    from auromat_tpu.ops.georef import GeorefParams, georeference_points

    wcs = TanWcs(header)
    pos, photo_time, _ = resolve_camera_position(header)
    params = GeorefParams.from_wcs(wcs, pos, photo_time, altitude)
    xs = np.linspace(0, wcs.width - 1, 16)
    px, py = np.meshgrid(xs, [0.0, wcs.height - 1.0])
    lat, _ = georeference_points(params, px, py)
    lat = np.asarray(lat)
    top_hits = np.isfinite(lat[0]).mean()
    bottom_hits = np.isfinite(lat[1]).mean()
    # a consistent oblique Earth view: bottom row mostly on Earth, top mostly sky
    return bottom_hits > top_hits
