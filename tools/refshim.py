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


class Time:  # transform.py imports it; golden paths never call it
    def __init__(self, *a, **k):
        raise NotImplementedError("astropy.time.Time stub")


time_mod = types.ModuleType("astropy.time")
time_mod.Time = Time
constants = types.ModuleType("astropy.constants")
constants.R_earth = _Quantity(6378136.0, "m")
astropy.units = units
astropy.coordinates = coordinates
astropy.time = time_mod
astropy.constants = constants
sys.modules.update({
    "astropy": astropy, "astropy.units": units,
    "astropy.coordinates": coordinates,
    "astropy.coordinates.angles": angles,
    "astropy.time": time_mod, "astropy.constants": constants,
})

# --- geographiclib -----------------------------------------------------
geographiclib = types.ModuleType("geographiclib")
geodesic_mod = types.ModuleType("geographiclib.geodesic")


class _Geodesic:
    WGS84 = None  # populated after class def


class _WGS84:
    a = 6378137.0
    f = 1 / 298.257223563

    def Inverse(self, *a, **k):
        raise NotImplementedError("geographiclib stub")

    Direct = Inverse
    Line = Inverse


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
measure.find_contours = None
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

sys.path.insert(0, "/root/reference")
