"""Lens distortion models and image undistortion on device.

The reference delegates to the lensfun C++ library (auromat/util/
lensdistortion.py); here the distortion polynomials (ptlens / poly3 / poly5,
the models lensfun's database uses) are evaluated directly in jax.numpy and
the image remap is a batched bilinear gather — the distortion correction of
a 12 MP frame becomes a single fused device computation.

Radii are normalised by half the smaller image dimension (lensfun's
convention).
"""

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np


def distortion_factor(model, params, ru):
    """rd/ru as a function of the undistorted radius ru.

    models: 'ptlens' (a, b, c), 'poly3' (k1,), 'poly5' (k1, k2)
    """
    if model == "ptlens":
        a, b, c = params
        return a * ru**3 + b * ru**2 + c * ru + (1.0 - a - b - c)
    if model == "poly3":
        (k1,) = params
        return 1.0 - k1 + k1 * ru * ru
    if model == "poly5":
        k1, k2 = params
        return 1.0 + k1 * ru * ru + k2 * ru**4
    raise ValueError(f"unknown distortion model {model!r}")


def undistorted_radius(model, params, rd, iterations=8):
    """Invert rd = ru * f(ru) by fixed-point iteration (jit-safe)."""
    ru = rd
    for _ in range(iterations):
        ru = rd / distortion_factor(model, params, ru)
    return ru


@partial(jax.jit, static_argnums=(1, 3))
def _remap(img, model, params, shape):
    h, w = shape
    half = min(h, w) / 2.0
    cy, cx = (h - 1) / 2.0, (w - 1) / 2.0
    ys = (jnp.arange(h, dtype=jnp.float32) - cy) / half
    xs = (jnp.arange(w, dtype=jnp.float32) - cx) / half
    yy, xx = jnp.meshgrid(ys, xs, indexing="ij")
    # corrected image pixel -> sampling position in the distorted source:
    # the stored image is distorted, so we evaluate the distortion at the
    # undistorted (output) radius
    ru = jnp.sqrt(xx * xx + yy * yy)
    factor = distortion_factor(model, tuple(params), ru)
    sx = xx * factor * half + cx
    sy = yy * factor * half + cy
    # bilinear gather
    x0 = jnp.clip(jnp.floor(sx).astype(jnp.int32), 0, w - 2)
    y0 = jnp.clip(jnp.floor(sy).astype(jnp.int32), 0, h - 2)
    fx = jnp.clip(sx - x0, 0.0, 1.0)
    fy = jnp.clip(sy - y0, 0.0, 1.0)
    img_f = img.astype(jnp.float32)

    def gather(yi, xi):
        return img_f[yi, xi]

    v00 = gather(y0, x0)
    v01 = gather(y0, x0 + 1)
    v10 = gather(y0 + 1, x0)
    v11 = gather(y0 + 1, x0 + 1)
    fx = fx[..., None]
    fy = fy[..., None]
    out = (
        v00 * (1 - fx) * (1 - fy) + v01 * fx * (1 - fy)
        + v10 * (1 - fx) * fy + v11 * fx * fy
    )
    eps = 1e-3  # tolerate float rounding at the exact border
    inside = (sx >= -eps) & (sx <= w - 1 + eps) & (sy >= -eps) & (sy <= h - 1 + eps)
    return jnp.where(inside[..., None], out, 0.0)


def correct_lens_distortion(img, model="ptlens", params=(0.0, 0.0, 0.0)):
    """Undistort an (h, w, C) image; returns the same dtype.

    Reference: auromat/util/lensdistortion.py:159-196 (lensfun
    ``apply_geometry_distortion`` + cv2.remap).
    """
    img = np.asarray(img)
    squeeze = img.ndim == 2
    if squeeze:
        img = img[:, :, None]
    out = np.asarray(
        _remap(jnp.asarray(img), model, tuple(float(p) for p in params),
               img.shape[:2])
    )
    if np.issubdtype(img.dtype, np.integer):
        out = np.clip(np.round(out), np.iinfo(img.dtype).min,
                      np.iinfo(img.dtype).max).astype(img.dtype)
    else:
        out = out.astype(img.dtype)
    return out[:, :, 0] if squeeze else out


def distortion_displacement(shape, model="ptlens", params=(0.0, 0.0, 0.0)):
    """Per-pixel displacement field (dx, dy) introduced by the correction —
    used by the drawing diagnostics (reference lensdistortion.py:234-267)."""
    h, w = shape
    half = min(h, w) / 2.0
    cy, cx = (h - 1) / 2.0, (w - 1) / 2.0
    ys = (np.arange(h) - cy) / half
    xs = (np.arange(w) - cx) / half
    yy, xx = np.meshgrid(ys, xs, indexing="ij")
    ru = np.sqrt(xx * xx + yy * yy)
    factor = np.asarray(distortion_factor(model, tuple(params), ru))
    dx = (xx * factor - xx) * half
    dy = (yy * factor - yy) * half
    return dx, dy


# ---------------------------------------------------------------------------
# EXIF-driven model lookup (replaces the reference's lensfun-DB path,
# auromat/util/lensdistortion.py:44-107, without the lensfun C library)
# ---------------------------------------------------------------------------

def _norm(s):
    return " ".join(str(s).lower().split())


# (camera_model, lens_model) -> sorted list of (focal_mm, model, terms).
# crop factor keyed per camera. Coefficients for the bundled entries are
# APPROXIMATE poly3 fits from published rectilinear-distortion figures
# (D ~= k1 at the image half-height); the ISS production path does NOT use
# this table — the ESA archive supplies per-sequence model parameters
# (mapping/iss.py), exactly like the reference consumes them. Register
# calibrated entries with :func:`register_lens`.
LENS_DB = {}
CAMERA_CROP = {}


def register_lens(camera, lens, focal_mm, model, terms, crop_factor=None):
    """Register distortion parameters for (camera, lens) at one focal
    length, REPLACING any existing entry at that focal length (so a
    calibrated entry overrides the bundled approximate one).

    :param crop_factor: the CAMERA's crop factor; None keeps a previously
        registered value (defaults to 1.0 for a new camera) — a defaulted
        parameter must not silently reset another lens's registration
    """
    key = (_norm(camera), _norm(lens))
    focal_mm = float(focal_mm)
    entries = [e for e in LENS_DB.get(key, []) if e[0] != focal_mm]
    entries.append((focal_mm, model, tuple(terms)))
    entries.sort(key=lambda e: e[0])
    LENS_DB[key] = entries
    if crop_factor is not None:
        CAMERA_CROP[_norm(camera)] = float(crop_factor)
    else:
        CAMERA_CROP.setdefault(_norm(camera), 1.0)


# the ISS aurora imagery bodies/lenses (NASA EOL metadata); approximate
for cam in ("NIKON D3S", "NIKON D3", "NIKON D4"):
    register_lens(cam, "24.0 mm f/1.4", 24.0, "poly3", (-0.019,), 1.0)
    register_lens(cam, "28.0 mm f/1.4", 28.0, "poly3", (-0.015,), 1.0)
    register_lens(cam, "50.0 mm f/1.4", 50.0, "poly3", (-0.007,), 1.0)
    register_lens(cam, "85.0 mm f/1.4", 85.0, "poly3", (0.002,), 1.0)


def lookup_from_exif(exif):
    """Distortion model parameters for an EXIF tag dict.

    Accepts the tag names written by exiftool (``Model``, ``LensModel``/
    ``Lens``, ``FocalLength``) or plain keys (camera/lens/focal_length).
    Interpolates terms linearly between the two nearest registered focal
    lengths of the matched lens (the lensfun behaviour).

    :returns: dict(model=..., params=..., crop_factor=..., focal_length=...)
    :raises LookupError: when no entry matches
    """
    cam = exif.get("Model") or exif.get("camera")
    lens = exif.get("LensModel") or exif.get("Lens") or exif.get("lens")
    focal = exif.get("FocalLength") or exif.get("focal_length")
    if cam is None or lens is None or focal is None:
        raise LookupError("EXIF lacks Model/LensModel/FocalLength")
    focal = float(str(focal).split()[0])
    key = (_norm(cam), _norm(lens))
    entries = LENS_DB.get(key)
    if not entries:
        # partial lens-name match (exiftool and lensfun spell lenses
        # differently; match on the shared focal/aperture designation)
        for (c, l), e in LENS_DB.items():
            if c == _norm(cam) and (l in _norm(lens) or _norm(lens) in l):
                entries = e
                break
    if not entries:
        raise LookupError(f"no distortion entry for {cam!r} + {lens!r}; "
                          "register one with register_lens()")
    focals = [e[0] for e in entries]
    if focal <= focals[0]:
        _, model, terms = entries[0]
    elif focal >= focals[-1]:
        _, model, terms = entries[-1]
    else:
        import bisect

        i = bisect.bisect_left(focals, focal)
        f0, m0, t0 = entries[i - 1]
        f1, m1, t1 = entries[i]
        if m0 != m1 or len(t0) != len(t1):
            _, model, terms = entries[i if focal - f0 > f1 - focal else i - 1]
        else:
            w = (focal - f0) / (f1 - f0)
            model = m0
            terms = tuple((1 - w) * a + w * b for a, b in zip(t0, t1))
    return dict(model=model, params=tuple(terms),
                crop_factor=CAMERA_CROP.get(_norm(cam), 1.0),
                focal_length=focal)


def correct_lens_distortion_exif(img, exif):
    """Undistort an image using EXIF-matched model parameters."""
    info = lookup_from_exif(exif)
    return correct_lens_distortion(img, model=info["model"],
                                   params=info["params"])
