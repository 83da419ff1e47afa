"""Generate star-field MASKING goldens by EXECUTING /root/reference.

Runs the reference's automatic star-field masking chain
(auromat.solving.masking.maskStarfield, masking.py:236-413: first-spike
histogram threshold, contour categorization, block masking, masked
adaptive threshold, Hough-line rejection, lonely-block removal, noise
sigma estimate) on the two checked-in ISS frames through the dependency
shim (tools/refshim.py).

Committed as tests/resources/golden_masking_<frame>.npz; gated by
tests/test_masking_parity.py against the repo chain
(auromat_tpu.solving.masking.mask_starfield).
"""

import os
import sys

import numpy as np

_here = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, _here)
sys.path.insert(0, os.path.dirname(_here))
import refshim  # noqa: F401

np.int = int
np.float = float
np.product = np.prod  # removed aliases (numpy 2), used by masking.py

import matplotlib  # noqa: E402

matplotlib.use("Agg")


def _install_patched_masking():
    """Import the reference's solving/masking.py with two mechanical
    numpy-2 compat fixes (no behavioral change):

    - ``np.asarray(contours)`` on the ragged findContours list
      (masking.py:96) implicitly built an object array on 2013-era numpy;
      modern numpy raises — spell the dtype.
    - ``cv.fillPoly(..., contours[isOffendingContour], ...)`` then hands
      an object ndarray to OpenCV, which modern cv2 rejects — pass the
      equivalent list.
    """
    import importlib
    import types

    importlib.import_module("auromat.solving")
    # vendored view_as_blocks: `tuple(arr_shape / block_shape)` is float
    # division on py3 — as_strided rejects float shapes (the reference ran
    # py2's integer division). Same mechanical // fix skimage itself made.
    vb_path = "/root/reference/auromat/solving/viewasblocks.py"
    with open(vb_path) as f:
        vb_src = f.read()
    vb_patched = vb_src.replace("tuple(arr_shape / block_shape)",
                                "tuple((arr_shape // block_shape).astype(int))")
    assert vb_patched != vb_src
    vb_mod = types.ModuleType("auromat.solving.viewasblocks")
    vb_mod.__file__ = vb_path
    exec(compile(vb_patched, vb_path, "exec"), vb_mod.__dict__)
    sys.modules["auromat.solving.viewasblocks"] = vb_mod

    path = "/root/reference/auromat/solving/masking.py"
    with open(path) as f:
        src = f.read()
    patched = src.replace(
        "contours = np.asarray(contours)",
        "contours = np.asarray(contours, dtype=object)")
    assert patched != src
    patched2 = patched.replace(
        "cv.fillPoly(imFilledOffenders, contours[isOffendingContour], 255)",
        "cv.fillPoly(imFilledOffenders, "
        "list(contours[isOffendingContour]), 255)")
    assert patched2 != patched
    # HoughLinesP layout: cv2 2.4 returned (1, N, 4) and the loop walks
    # lines[0,:]; modern cv2 returns (N, 1, 4). reshape(-1, 4) walks the
    # same line set under both layouts.
    patched3 = patched2.replace("for line in lines[0,:]:",
                                "for line in lines.reshape(-1, 4):")
    assert patched3 != patched2
    patched2 = patched3
    mod = types.ModuleType("auromat.solving.masking")
    mod.__file__ = path
    exec(compile(patched2, path, "exec"), mod.__dict__)
    sys.modules["auromat.solving.masking"] = mod
    return mod


RES = os.path.join(os.path.dirname(os.path.abspath(__file__)), "..",
                   "tests", "resources")
FRAMES = ["ISS030-E-102170_dc", "ISS029-E-8492"]


def main():
    masking = _install_patched_masking()
    for name in FRAMES:
        p = os.path.join(RES, f"{name}.jpg")
        mask, sigma = masking.maskStarfield(p)
        out = os.path.join(RES, f"golden_masking_{name}.npz")
        np.savez_compressed(out, mask=np.asarray(mask, dtype=bool),
                            sigma=float(sigma))
        print(name, "->", out, mask.shape,
              f"{np.asarray(mask).mean():.4f} starfield, sigma={sigma:.3f}")


if __name__ == "__main__":
    main()
