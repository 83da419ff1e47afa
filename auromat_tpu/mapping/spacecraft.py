"""Spacecraft (ISS DSLR) mapping provider: image files + .wcs solutions.

Mirrors auromat/mapping/spacecraft.py: pairs image files with astrometric
``.wcs`` headers, resolves the camera position from the header cards
(time-shift-corrected position preferred, then plain position, then TLE
recomputation via auromat_tpu.coordinates.ephem), and yields Mappings.

The reference's NuMap process-parallel sequence pipeline
(spacecraft.py:308-377) becomes a batched device call:
:meth:`SpacecraftMappingProvider.getSequenceBatched` /
:func:`get_mapping_batch` stack a frame burst's calibration into
DynGeorefParams and georeference all frames in ONE vmapped jit step
(f32 device precision; the per-frame ``get``/``getSequence`` path keeps
float64 CPU parity). For multi-chip bursts use
auromat_tpu.parallel.sharded_batch_georef / make_sharded_mosaic_step.
"""

import functools
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
                 fast_center=False, maxTimeOffset=3, dtype=None):
        super().__init__(maxTimeOffset)
        self.image_dir = image_dir
        self.wcs_dir = wcs_dir or image_dir
        self.tle_path = tle_path
        self.altitude = altitude
        self.fast_center = fast_center
        self.dtype = dtype  # None = float64 (CPU parity); e.g. jnp.float32
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
                 "wcs": wcs_path, "time": photo_time,
                 "shape": (header.get("IMAGEW"), header.get("IMAGEH"))}
            )
        from datetime import datetime as _dt

        entries.sort(key=lambda e: (e["time"] is None,
                                    e["time"] or _dt.min, e["id"]))
        self._index = entries
        return entries

    @property
    def range(self):
        idx = self._build_index()
        if not idx:
            raise ValueError("no image/wcs pairs found")
        return idx[0]["time"], idx[-1]["time"]

    def timeRange(self, dateBegin=None, dateEnd=None):
        """(first, last) photo times of the frames a
        dateBegin/dateEnd-filtered sequence (getSequence/
        getSequenceBatched/iterParamBursts — shared filter) actually
        includes; (None, None) if nothing timed is in range. Unlike
        :attr:`range` this respects the query window — sequence-level
        products (CLI ``--mosaic``) must not be stamped with the time of
        an excluded frame."""
        times = [e["time"]
                 for chunk in self._iter_entry_chunks(dateBegin, dateEnd, 1)
                 for e in chunk if e["time"] is not None]
        if not times:
            return None, None
        return times[0], times[-1]

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
            tle_path=self.tle_path, dtype=self.dtype,
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

    def getSequenceBatched(self, dateBegin=None, dateEnd=None, batch=4,
                           with_mlatmlt=True):
        """Sequence via the batched device pipeline (P2 replacement).

        Groups same-shaped frames into bursts of ``batch`` and runs ONE
        vmapped georeference jit step per burst (f32 on device — bin-grade
        precision, see ops.georegrid; use getSequence for f64 CPU parity).
        A shape change mid-sequence (camera/crop change) closes the current
        burst, so mixed-shape folders work like the per-frame path.
        """
        for chunk in self._iter_entry_chunks(dateBegin, dateEnd, batch):
            yield from self._load_batch(chunk, with_mlatmlt)

    def _iter_entry_chunks(self, dateBegin, dateEnd, batch):
        """Date-filter the index and yield same-shaped entry chunks of at
        most ``batch`` frames — the burst-splitting rule shared by
        :meth:`getSequenceBatched` and :meth:`iterParamBursts` (a shape
        change mid-sequence closes the current burst)."""
        entries = [e for e in self._build_index()
                   if not (dateBegin is not None and (e["time"] is None
                                                      or e["time"] < dateBegin))
                   and not (dateEnd is not None and (e["time"] is None
                                                     or e["time"] > dateEnd))]
        chunk = []
        for e in entries:
            if chunk and e.get("shape") != chunk[-1].get("shape"):
                yield chunk
                chunk = []
            chunk.append(e)
            if len(chunk) == batch:
                yield chunk
                chunk = []
        if chunk:
            yield chunk

    def _load_batch(self, entries, with_mlatmlt):
        pairs = [(e["image"], e["wcs"]) for e in entries]
        yield from get_mapping_batch(
            pairs, altitude=self.altitude, tle_path=self.tle_path,
            identifiers=[e["id"] for e in entries],
            with_mlatmlt=with_mlatmlt, fast_center=self.fast_center,
        )

    def iterParamBursts(self, dateBegin=None, dateEnd=None, batch=8):
        """Yield (params_list, imgs) bursts for the sharded mosaic pipeline
        (auromat_tpu.parallel.mosaic_sequence) — calibration + raw imagery
        only, no per-pixel host arrays are ever materialized (the georef
        runs inside the mosaic step's jit). Same date filtering and
        shape-change burst splitting as :meth:`getSequenceBatched`
        (shared :meth:`_iter_entry_chunks`).
        """
        for chunk in self._iter_entry_chunks(dateBegin, dateEnd, batch):
            params, imgs = [], []
            for e in chunk:
                img, p = _load_frame_calibration(
                    e["image"], e["wcs"], self.altitude, self.tle_path)
                img = np.asarray(img)
                # the mosaic binning kernels' contract is integer-valued
                # 0..255 imagery (bf16 one-hot matmuls / 8-bit packed
                # sorts; resample() gates on the same) — a uint16 source
                # would silently wrap/clamp downstream, so refuse it here
                if img.dtype != np.uint8:
                    raise ValueError(
                        f"{e['image']}: mosaic bursts need uint8 imagery "
                        f"(got {img.dtype}); the device binning kernels "
                        "are specified for integer 0..255 values — "
                        "rescale the source images first")
                params.append(p)
                imgs.append(img.astype(np.float32))
            yield params, np.stack(imgs)


def _load_frame_calibration(image_path, wcs_path, altitude=110.0,
                            tle_path=None, full=False):
    """Load one frame's imagery + device calibration (no per-pixel work).

    :returns: (img, GeorefParams) — or with ``full=True`` additionally
        (header, photo_time, camera_pos, FrameMatrices) for callers that
        construct Mapping objects.
    """
    from auromat_tpu.coordinates.frames import FrameMatrices
    from auromat_tpu.coordinates.wcs import TanWcs
    from auromat_tpu.ops.georef import GeorefParams

    header = fits.read_header(wcs_path)
    pos, photo_time, _ = resolve_camera_position(header, tle_path)
    img = load_image(image_path)
    fm = FrameMatrices(photo_time)
    p = GeorefParams.from_wcs(TanWcs(header), pos, photo_time, altitude, fm)
    assert (img.shape[1], img.shape[0]) == (p.width, p.height)
    if full:
        return img, p, header, photo_time, pos, fm
    return img, p


@functools.lru_cache(maxsize=8)
def _batched_georef_fn(width, height, fast_center, with_mlatmlt):
    import jax
    import jax.numpy as jnp

    from auromat_tpu.ops.georef import georeference_dyn

    def fn(dyn):
        return jax.vmap(
            lambda d: georeference_dyn(d, width, height,
                                       fast_center=fast_center,
                                       with_mlatmlt=with_mlatmlt,
                                       dtype=jnp.float32)
        )(dyn)

    return jax.jit(fn)


def get_mapping_batch(image_wcs_pairs, altitude=110.0, tle_path=None,
                      identifiers=None, with_mlatmlt=True, fast_center=True):
    """Georeference a burst of same-shaped frames in one device call.

    The whole burst's per-frame calibration stacks into DynGeorefParams and
    the full georeference chain runs ONCE under vmap (SURVEY.md P2: the
    reference's NuMap process pipeline, spacecraft.py:334-361, as a batched
    jit step). Device math is f32 — adequate for binned products (see
    ops.georegrid's error budget); use :func:`get_mapping` for f64 parity.

    :param image_wcs_pairs: [(image_path, wcs_path), ...] — all frames must
        share the image shape
    :returns: list of AstrometryMapping
    """
    import jax.numpy as jnp
    import numpy.ma as ma

    from auromat_tpu.mapping.astrometry import AstrometryMapping
    from auromat_tpu.ops.georef import DynGeorefParams

    headers, imgs, params, times, poss, fms = [], [], [], [], [], []
    for image_path, wcs_path in image_wcs_pairs:
        img, p, header, photo_time, pos, fm = _load_frame_calibration(
            image_path, wcs_path, altitude, tle_path, full=True)
        headers.append(header)
        imgs.append(img)
        params.append(p)
        times.append(photo_time)
        poss.append(pos)
        fms.append(fm)
    shapes = {(p.width, p.height) for p in params}
    assert len(shapes) == 1, f"batch must share one frame shape, got {shapes}"
    w, h = shapes.pop()

    dyn = DynGeorefParams.stack(params, dtype=jnp.float32)
    out = _batched_georef_fn(w, h, fast_center, with_mlatmlt)(dyn)
    out_np = {k: np.asarray(v, dtype=np.float64) for k, v in out.items()}

    mappings = []
    for i, (image_path, _) in enumerate(image_wcs_pairs):
        ident = (identifiers[i] if identifiers
                 else os.path.splitext(os.path.basename(image_path))[0])
        m = AstrometryMapping(
            out_np["lats"][i].copy(), out_np["lons"][i].copy(),
            out_np["lats_center"][i].copy(), out_np["lons_center"][i].copy(),
            out_np["elevation"][i].copy(), altitude, imgs[i], poss[i],
            times[i], ident, sanitized=fast_center, frame_matrices=fms[i],
        )
        m.wcs_header = headers[i]
        if with_mlatmlt:
            def masked(key, mask):
                a = out_np[key][i].copy()
                a[mask] = np.nan
                return ma.masked_invalid(a, copy=False)

            cm, ccm = m.corner_mask, m.center_mask
            m._mlatmlt = (masked("mlat", cm), masked("mlt", cm))
            m._mlatmlt_center = (masked("mlat_center", ccm),
                                 masked("mlt_center", ccm))
        mappings.append(m)
    return mappings
