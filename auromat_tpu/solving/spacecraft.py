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


def is_consistent(header, altitude=0.0, star_px_coords=None):
    """Solve-sanity check (reference spacecraft.py:523-555): a plausible
    oblique aurora frame intersects the Earth PARTIALLY — all-Earth or
    all-sky means a wrong timestamp/solution — regardless of which edge
    the Earth sits on (the camera may be mounted in any orientation).
    Optionally rejects solutions whose quad stars would be covered by the
    modelled Earth.

    :param star_px_coords: (n, 2) x,y pixel coords of solve stars
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
    hits = np.isfinite(np.asarray(lat))
    if hits.all() or not hits.any():
        return False
    if star_px_coords is not None:
        spx = np.asarray(star_px_coords, dtype=np.float64)
        slat, _ = georeference_points(params, spx[:, 0], spx[:, 1])
        if np.isfinite(np.asarray(slat)).any():
            return False  # a solve star would sit on the Earth disk
    return True


def solve(image_path, wcs_path, tle_path=None, norad_id=ISS_NORAD_ID,
          overwrite=False, **solve_kw):
    """Solve a single image into ``wcs_path``; returns True on success
    (reference solving/spacecraft.py:28-65). The spacecraft position is
    stamped from the TLE archive when available, like solve_sequence."""
    from auromat_tpu.solving.solving import solve_image

    if os.path.exists(wcs_path) and not overwrite:
        raise FileExistsError(wcs_path)
    solved = solve_image(image_path, wcs_path, **solve_kw)
    if solved is None:
        return False
    header = fits.read_header(solved)
    fits.set_norad_id(header, norad_id)
    t = read_exif_time(image_path)
    if t is not None and tle_path and os.path.exists(tle_path):
        calc = EphemerisCalculator(tle_path, norad_id=norad_id)
        fits.set_spacecraft_position(header, np.asarray(calc(t)), t)
    fits.write_header(header, solved)
    return True
