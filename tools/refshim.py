"""Dependency shim to execute /root/reference (esa/auromat) for golden values.

The reference needs 2013-era deps absent here (six, spacepy, astropy APIs,
geographiclib, skimage, numpy.core.umath_tests). This installs minimal
FUNCTIONAL stubs for exactly the call surface the golden paths touch, then
puts /root/reference on sys.path. Recreates the r2 shim described in
.claude/skills/verify/SKILL.md.
"""

import sys
import types

import numpy as np

# --- six ---------------------------------------------------------------
six = types.ModuleType("six")
six.add_metaclass = lambda meta: (lambda cls: meta(cls.__name__, cls.__bases__,
                                                   dict(cls.__dict__)))
six.PY3 = True
six.PY2 = False
six.string_types = (str,)
six.integer_types = (int,)
# real packages (dateutil via matplotlib) import these too
six.text_type = str
six.binary_type = bytes
six.advance_iterator = next
six.next = next
six.itervalues = lambda d, **kw: iter(d.values(**kw))
six.iterkeys = lambda d, **kw: iter(d.keys(**kw))
six.u = lambda s: s
six.b = lambda s: s.encode("latin-1")
import functools as _functools  # noqa: E402

six.wraps = _functools.wraps


def _with_metaclass(meta, *bases):
    return meta("_NewBase", bases or (object,), {})


six.with_metaclass = _with_metaclass
import _thread as _thread_mod  # noqa: E402

six_moves = types.ModuleType("six.moves")
six_moves.range = range
six_moves.zip = zip
six_moves.map = map
six_moves._thread = _thread_mod
six.moves = six_moves
sys.modules["six.moves"] = six_moves
sys.modules["six.moves._thread"] = _thread_mod


def _reraise(tp, value, tb=None):
    if value is None:
        value = tp()
    if value.__traceback__ is not tb:
        raise value.with_traceback(tb)
    raise value


six.reraise = _reraise
six.iteritems = lambda d, **kw: iter(d.items(**kw))
moves = types.ModuleType("six.moves")
moves.range = range
moves.map = map
urllib_mod = types.ModuleType("six.moves.urllib")
urllib_error = types.ModuleType("six.moves.urllib.error")


class HTTPError(Exception):
    pass


urllib_error.HTTPError = HTTPError
urllib_request = types.ModuleType("six.moves.urllib.request")
urllib_request.urlopen = None
urllib_parse = types.ModuleType("six.moves.urllib.parse")
urllib_mod.error = urllib_error
urllib_mod.request = urllib_request
urllib_mod.parse = urllib_parse
moves.urllib = urllib_mod
six.moves = moves
sys.modules.update({
    "six": six, "six.moves": moves, "six.moves.urllib": urllib_mod,
    "six.moves.urllib.error": urllib_error,
    "six.moves.urllib.request": urllib_request,
    "six.moves.urllib.parse": urllib_parse,
})

# --- numpy.core.umath_tests -------------------------------------------
umath = types.ModuleType("numpy.core.umath_tests")
umath.matrix_multiply = np.matmul
umath.inner1d = lambda a, b: np.einsum("...i,...i->...", a, b)
sys.modules["numpy.core.umath_tests"] = umath

# --- astropy (functional Angle/units; Time unused on golden paths) ----
astropy = types.ModuleType("astropy")


class _Unit:
    __array_priority__ = 10000  # make ndarray * unit defer to __rmul__

    def __init__(self, name):
        self.name = name

    def __rmul__(self, value):
        return _Quantity(value, self.name)


class _Quantity:
    def __init__(self, value, unit):
        self.value = value
        self.unit = unit

    @property
    def rad(self):
        return self.value if self.unit == "rad" else np.deg2rad(self.value)


units = types.ModuleType("astropy.units")
units.rad = _Unit("rad")
units.deg = _Unit("deg")
units.m = _Unit("m")
units.km = _Unit("km")


class Angle:
    def __init__(self, q):
        if isinstance(q, _Quantity):
            self._rad = np.asarray(q.rad, dtype=np.float64)
        elif isinstance(q, Angle):
            self._rad = q._rad
        else:
            self._rad = np.asarray(q, dtype=np.float64)

    def wrap_at(self, limit):
        lim = limit.rad if isinstance(limit, _Quantity) else float(limit)
        return Angle(np.mod(self._rad - (lim - 2 * np.pi), 2 * np.pi)
                     + (lim - 2 * np.pi))

    @property
    def degree(self):
        return np.rad2deg(self._rad)

    @property
    def radian(self):
        return self._rad


coordinates = types.ModuleType("astropy.coordinates")
angles = types.ModuleType("astropy.coordinates.angles")
angles.Angle = Angle
coordinates.Angle = Angle
coordinates.angles = angles


class Time:
    """Functional subset: Time(datetime, scale='utc').jd — all the
    reference's date2es (transform.py:525-532) consumes."""

    def __init__(self, value, scale="utc", format=None):
        import datetime as _dt

        if not isinstance(value, _dt.datetime):
            raise NotImplementedError(f"Time stub: {type(value)}")
        if value.tzinfo is not None:
            value = value.astimezone(_dt.timezone.utc).replace(tzinfo=None)
        self._dt = value

    @property
    def jd(self):
        import datetime as _dt

        delta = self._dt - _dt.datetime(1970, 1, 1)
        return 2440587.5 + delta.total_seconds() / 86400.0


time_mod = types.ModuleType("astropy.time")
time_mod.Time = Time
constants = types.ModuleType("astropy.constants")
constants.R_earth = _Quantity(6378136.0, "m")
units.arcsec = _Unit("arcsec")
units.degree = _Unit("deg")


def _quantity_to(self, unit):
    # arcsec <-> degree are the only conversions the golden paths make
    # (resample.plateCarreeResolution, mapping.arcSecPerPx)
    uname = getattr(unit, "name", None)
    if self.unit == "arcsec" and uname == "deg":
        return _Quantity(self.value / 3600.0, "deg")
    if self.unit == "deg" and uname == "arcsec":
        return _Quantity(self.value * 3600.0, "arcsec")
    if self.unit == uname:
        return self
    raise NotImplementedError((self.unit, unit))


_Quantity.to = _quantity_to
wcs_pkg = types.ModuleType("astropy.wcs")
wcs_wcs = types.ModuleType("astropy.wcs.wcs")


class WCS:  # import surface of reference wcs.py; TAN fast path never builds it
    def __init__(self, *a, **k):
        raise NotImplementedError("astropy.wcs.WCS stub")


wcs_wcs.WCS = WCS
wcs_pkg.WCS = WCS
wcs_pkg.wcs = wcs_wcs
wcs_pkg.__path__ = []
astropy.__version__ = "1.0"  # LooseVersion checks in resample.py
astropy.units = units
astropy.coordinates = coordinates
astropy.time = time_mod
astropy.constants = constants
astropy.wcs = wcs_pkg
astropy.__path__ = []
sys.modules.update({
    "astropy": astropy, "astropy.units": units,
    "astropy.coordinates": coordinates,
    "astropy.coordinates.angles": angles,
    "astropy.time": time_mod, "astropy.constants": constants,
    "astropy.wcs": wcs_pkg, "astropy.wcs.wcs": wcs_wcs,
})

# --- geographiclib -----------------------------------------------------
geographiclib = types.ModuleType("geographiclib")
geodesic_mod = types.ModuleType("geographiclib.geodesic")


class _Geodesic:
    WGS84 = None  # populated after class def
    # outmask flag constants (values irrelevant — the backing
    # implementation always computes every quantity it can)
    EMPTY = 0
    DISTANCE = 1
    AZIMUTH = 2
    LATITUDE = 4
    LONGITUDE = 8
    ALL = 0x7FFF


class _GeodesicLine:
    """Minimal geographiclib GeodesicLine: Position(s12) via the repo's
    direct-problem solver (only lat2/lon2 are read on the golden paths)."""

    def __init__(self, lat1, lon1, azi1):
        self._start = (lat1, lon1, azi1)

    def Position(self, s12, outmask=None):
        from auromat_tpu.coordinates import geodesic as _g

        lat1, lon1, azi1 = self._start
        loc = _g.destination(_g.Location(lat1, lon1), azi1, s12)
        return {"lat2": float(loc.lat), "lon2": float(loc.lon), "s12": s12}


class _WGS84:
    a = 6378137.0
    f = 1 / 298.257223563

    # Functional backing via the repo's vectorized Vincenty solver
    # (auromat_tpu.coordinates.geodesic — itself golden-tested against
    # direct-problem oracles). On the resample-golden path these feed only
    # pole detection and bbox sizing, never the binned values.
    def Inverse(self, lat1, lon1, lat2, lon2, outmask=None):
        from auromat_tpu.coordinates import geodesic as _g

        p1, p2 = _g.Location(lat1, lon1), _g.Location(lat2, lon2)
        azi1 = float(_g.course(p1, p2))
        azi2 = (float(_g.course(p2, p1)) + 180.0 + 180.0) % 360.0 - 180.0
        return {
            "s12": float(_g.distance(p1, p2)),
            "a12": float(_g.angular_distance(p1, p2)),
            "azi1": azi1,
            "azi2": azi2,
            "lat1": lat1, "lon1": lon1, "lat2": lat2, "lon2": lon2,
        }

    def Direct(self, lat1, lon1, azi1, s12, outmask=None):
        from auromat_tpu.coordinates import geodesic as _g

        loc = _g.destination(_g.Location(lat1, lon1), azi1, s12)
        return {"lat2": float(loc.lat), "lon2": float(loc.lon),
                "s12": s12, "azi1": azi1, "lat1": lat1, "lon1": lon1}

    def Line(self, lat1, lon1, azi1, caps=None):
        return _GeodesicLine(lat1, lon1, azi1)


_Geodesic.WGS84 = _WGS84()
geodesic_mod.Geodesic = _Geodesic
constants_mod = types.ModuleType("geographiclib.constants")


class Constants:
    WGS84_a = 6378137.0
    WGS84_f = 1 / 298.257223563


constants_mod.Constants = Constants
geographiclib.geodesic = geodesic_mod
geographiclib.constants = constants_mod
geographiclib.__path__ = []  # mark as package for submodule imports
sys.modules["geographiclib"] = geographiclib
sys.modules["geographiclib.geodesic"] = geodesic_mod
sys.modules["geographiclib.constants"] = constants_mod

# --- skimage (utils.py / image.py import surface) ----------------------
skimage = types.ModuleType("skimage")
sk_io = types.ModuleType("skimage.io")
sk_io.imread = None
sk_io.imsave = None
measure = types.ModuleType("skimage.measure")


def _find_contours(image, level):
    """cv2-backed stand-in for skimage.measure.find_contours as consumed by
    the reference's _outline_skimage (utils.py:96-151): returns closed
    (y, x) float contours of the binary image whose rounded coordinates
    index the True region's boundary pixels. cv2.findContours with
    CHAIN_APPROX_NONE traces exactly those pixels."""
    import cv2

    mask = (np.asarray(image) >= level).astype(np.uint8)
    contours, _ = cv2.findContours(mask, cv2.RETR_EXTERNAL,
                                   cv2.CHAIN_APPROX_NONE)
    out = []
    for c in contours:
        xy = c[:, 0, :].astype(np.float64)  # (n, 2) x,y
        yx = xy[:, ::-1]
        # cv2 traverses outer contours in the OPPOSITE orientation to
        # skimage.find_contours; signed-area consumers downstream
        # (reference utils.polygonCentroid via outline()) depend on it —
        # a reversed ring negates the centroid to the antipode
        yx = yx[::-1]
        yx = np.vstack([yx, yx[:1]])  # find_contours returns closed rings
        out.append(yx)
    return out


measure.find_contours = _find_contours
sk_color = types.ModuleType("skimage.color")
sk_color.gray2rgb = lambda a: np.repeat(np.asarray(a)[..., None], 3, axis=-1)
sk_color.rgb2gray = None
sk_util = types.ModuleType("skimage.util")
sk_util.img_as_ubyte = None
skimage.io = sk_io
skimage.measure = measure
skimage.color = sk_color
skimage.util = sk_util
skimage.__path__ = []
sys.modules.update({"skimage": skimage, "skimage.io": sk_io,
                    "skimage.measure": measure, "skimage.color": sk_color,
                    "skimage.util": sk_util})

# --- spacepy.pycdf ------------------------------------------------------
spacepy = types.ModuleType("spacepy")
pycdf = types.ModuleType("spacepy.pycdf")


class CDF(dict):
    def __init__(self, *a, **k):
        raise NotImplementedError("spacepy.pycdf stub")


pycdf.CDF = CDF
pycdf.const = types.SimpleNamespace()
pycdf.lib = types.SimpleNamespace()
spacepy.pycdf = pycdf
sys.modules["spacepy"] = spacepy
sys.modules["spacepy.pycdf"] = pycdf

# --- exifread -----------------------------------------------------------
exifread = types.ModuleType("exifread")
exifread.process_file = lambda *a, **k: {}
sys.modules["exifread"] = exifread

# --- astropy.io.fits / astropy.utils / astroquery import surface -------
# auromat.fits imports these at module level; the golden paths (e.g.
# solving.masking via auromat.draw) never call into them.
def _raising(name):
    def _f(*a, **k):
        raise NotImplementedError(name + " stub")

    return _f


io_pkg = types.ModuleType("astropy.io")
io_fits = types.ModuleType("astropy.io.fits")
for _n in ("open", "getheader", "Column", "BinTableHDU", "Header"):
    setattr(io_fits, _n, _raising("astropy.io.fits." + _n))
io_pkg.fits = io_fits
io_pkg.__path__ = []
astropy.io = io_pkg
utils_pkg = types.ModuleType("astropy.utils")
utils_data = types.ModuleType("astropy.utils.data")
utils_data.download_file = _raising("astropy.utils.data.download_file")
utils_pkg.data = utils_data
utils_pkg.__path__ = []
astropy.utils = utils_pkg
astroquery = types.ModuleType("astroquery")
astroquery_query = types.ModuleType("astroquery.query")


class suspend_cache:
    def __init__(self, *a, **k):
        pass

    def __enter__(self):
        return self

    def __exit__(self, *a):
        return False


astroquery_query.suspend_cache = suspend_cache
astroquery.query = astroquery_query
astroquery.__path__ = []
sys.modules.update({
    "astropy.io": io_pkg, "astropy.io.fits": io_fits,
    "astropy.utils": utils_pkg, "astropy.utils.data": utils_data,
    "astroquery": astroquery, "astroquery.query": astroquery_query,
})

# --- draw-layer import surface (basemap/brewer2mpl/old-mpl) -------------
# auromat.draw imports these at module level; the golden paths (e.g.
# solving.masking's debug-only drawHistogram) never call them.
basemap = types.ModuleType("mpl_toolkits.basemap")


class Basemap:
    def __init__(self, *a, **k):
        raise NotImplementedError("Basemap stub")


basemap.Basemap = Basemap
sys.modules["mpl_toolkits.basemap"] = basemap
brewer2mpl = types.ModuleType("brewer2mpl")


def _get_map(*a, **k):
    import matplotlib.cm as _cm

    # close enough for module-level colormap globals the golden paths
    # never render
    return types.SimpleNamespace(mpl_colormap=_cm.get_cmap("RdBu")
                                 if hasattr(_cm, "get_cmap")
                                 else __import__("matplotlib").colormaps["RdBu"])


brewer2mpl.get_map = _get_map
sys.modules["brewer2mpl"] = brewer2mpl
try:  # matplotlib.mlab.poly_between was removed in matplotlib 3.x
    import matplotlib.mlab as _mlab

    if not hasattr(_mlab, "poly_between"):
        def _poly_between(x, ylower, yupper):
            import numpy as _np

            x = _np.concatenate((x, x[::-1]))
            y = _np.concatenate((yupper, ylower[::-1]))
            return x, y

        _mlab.poly_between = _poly_between
except ImportError:
    pass

sys.path.insert(0, "/root/reference")
