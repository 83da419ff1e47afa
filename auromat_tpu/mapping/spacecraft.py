"""Spacecraft (ISS DSLR) mapping provider: image files + .wcs solutions.

Mirrors auromat/mapping/spacecraft.py: pairs image files with astrometric
``.wcs`` headers, resolves the camera position from the header cards
(time-shift-corrected position preferred, then plain position, then TLE
recomputation via auromat_tpu.coordinates.ephem), and yields Mappings.

The reference's NuMap process-parallel sequence pipeline
(spacecraft.py:308-377) is unnecessary here: sequences georeference lazily
per frame on device; for burst throughput use
auromat_tpu.parallel.sharded_batch_georef instead.
"""

import os
from datetime import timedelta

import numpy as np

from auromat_tpu.io import fits
from auromat_tpu.io.image import load_image
from auromat_tpu.mapping.astrometry import create_mapping
from auromat_tpu.mapping.mapping import BaseMappingProvider

IMAGE_EXTENSIONS = (".jpg", ".jpeg", ".png", ".tif", ".tiff")


def resolve_camera_position(header, tle_path=None, spacetrack=None):
    """Camera GCRS position (km) and photo time from a .wcs header.

    Order (reference spacecraft.py:428-485): shifted position cards ->
    plain position cards -> TLE propagation at DATE-OBS.

    :returns: (position (3,), photo_time, shift_seconds)
    """
    photo_time = fits.get_photo_time(header)
    shifted = fits.get_shifted_spacecraft_position(header)
    if shifted is not None:
        x, y, z, shift = shifted
        return np.array([x, y, z]), photo_time + timedelta(seconds=shift), shift
    pos = fits.get_spacecraft_position(header)
    if pos is not None:
        return np.asarray(pos, dtype=np.float64), photo_time, 0.0
    norad_id = fits.get_norad_id(header)
    if tle_path is not None and norad_id is not None and photo_time is not None:
        from auromat_tpu.coordinates.ephem import EphemerisCalculator

        calc = EphemerisCalculator(tle_path)
        return calc(photo_time), photo_time, 0.0
    raise ValueError(
        "no spacecraft position in header and no TLE fallback available"
    )


def get_mapping(image_path, wcs_path, altitude=110.0, identifier=None,
                fast_center=False, tle_path=None, metadata=None, dtype=None):
    """Georeference one image + .wcs pair (reference spacecraft.py:380-426)."""
    import jax.numpy as jnp

    header = fits.read_header(wcs_path)
    pos, photo_time, _ = resolve_camera_position(header, tle_path)
    img = load_image(image_path)
    if identifier is None:
        identifier = os.path.splitext(os.path.basename(image_path))[0]
    return create_mapping(
        header, img, pos, photo_time, altitude=altitude, identifier=identifier,
        metadata=metadata, fast_center=fast_center,
        dtype=dtype or jnp.float64,
    )


class SpacecraftMappingProvider(BaseMappingProvider):
    """Provider over a directory of images and a directory of .wcs files.

    Frames are matched by basename and ordered by (shifted) photo time.
    Reference: auromat/mapping/spacecraft.py:40-146.
    """

    def __init__(self, image_dir, wcs_dir=None, tle_path=None, altitude=110.0,
                 fast_center=False, maxTimeOffset=3):
        super().__init__(maxTimeOffset)
        self.image_dir = image_dir
        self.wcs_dir = wcs_dir or image_dir
        self.tle_path = tle_path
        self.altitude = altitude
        self.fast_center = fast_center
        self._index = None

    def _build_index(self):
        if self._index is not None:
            return self._index
        wcs_files = {
            os.path.splitext(f)[0]: os.path.join(self.wcs_dir, f)
            for f in os.listdir(self.wcs_dir)
            if f.lower().endswith(".wcs")
        }
        entries = []
        for f in sorted(os.listdir(self.image_dir)):
            base, ext = os.path.splitext(f)
            if ext.lower() not in IMAGE_EXTENSIONS:
                continue
            if base not in wcs_files:
                continue
            wcs_path = wcs_files[base]
            header = fits.read_header(wcs_path)
            try:
                _, photo_time, _ = resolve_camera_position(header, self.tle_path)
            except ValueError:
                photo_time = fits.get_photo_time(header)
            entries.append(
                {"id": base, "image": os.path.join(self.image_dir, f),
                 "wcs": wcs_path, "time": photo_time}
            )
        entries.sort(key=lambda e: (e["time"] is None, e["time"]))
        self._index = entries
        return entries

    @property
    def range(self):
        idx = self._build_index()
        if not idx:
            raise ValueError("no image/wcs pairs found")
        return idx[0]["time"], idx[-1]["time"]

    def contains(self, date):
        idx = self._build_index()
        return any(
            e["time"] is not None
            and abs((e["time"] - date).total_seconds()) <= self.maxTimeOffset
            for e in idx
        )

    def _load(self, entry):
        return get_mapping(
            entry["image"], entry["wcs"], altitude=self.altitude,
            identifier=entry["id"], fast_center=self.fast_center,
            tle_path=self.tle_path,
        )

    def get(self, date):
        idx = self._build_index()
        candidates = [e for e in idx if e["time"] is not None]
        if not candidates:
            raise ValueError("no dated mappings available")
        best = min(candidates, key=lambda e: abs((e["time"] - date).total_seconds()))
        if abs((best["time"] - date).total_seconds()) > self.maxTimeOffset:
            raise ValueError(f"no mapping within maxTimeOffset of {date}")
        return self._load(best)

    def getById(self, identifier):
        for e in self._build_index():
            if e["id"] == identifier:
                return self._load(e)
        raise ValueError(f"no mapping with identifier {identifier!r}")

    def getSequence(self, dateBegin=None, dateEnd=None):
        for e in self._build_index():
            if dateBegin is not None and (e["time"] is None or e["time"] < dateBegin):
                continue
            if dateEnd is not None and (e["time"] is None or e["time"] > dateEnd):
                continue
            yield self._load(e)
