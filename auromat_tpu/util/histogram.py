"""Multi-weight 2D histogram (host-side convenience API).

The reference vendors a searchsorted-based histogram2d with a list-of-weights
extension so count+R+G+B+elevation bin in one coordinate pass
(auromat/util/histogram.py:32-49). On this framework the hot binning runs on
device (auromat_tpu.ops.regrid); this module provides the equivalent
host-side API for interactive/numpy use with the same one-pass semantics.
"""

import numpy as np


def histogram2d(x, y, bins, range=None, weights=None):
    """numpy.histogram2d with support for a LIST of weights arrays.

    :param weights: None, an array, or a list where each element is None
        (count) or a weight array; one shared bin pass serves all of them
    :returns: (hist or list of hists, xedges, yedges)
    """
    x = np.asarray(x)
    y = np.asarray(y)
    if not isinstance(weights, list):
        return np.histogram2d(x, y, bins=bins, range=range, weights=weights)

    try:
        nx, ny = bins
    except TypeError:
        nx = ny = bins
    if range is not None:
        (xlo, xhi), (ylo, yhi) = range
    else:
        xlo, xhi = x.min(), x.max()
        ylo, yhi = y.min(), y.max()
    xedges = np.linspace(xlo, xhi, nx + 1)
    yedges = np.linspace(ylo, yhi, ny + 1)

    # single digitize pass shared by all weights
    ix = np.searchsorted(xedges, x, side="right") - 1
    iy = np.searchsorted(yedges, y, side="right") - 1
    ix[x == xhi] = nx - 1  # right-most edge inclusive
    iy[y == yhi] = ny - 1
    valid = (ix >= 0) & (ix < nx) & (iy >= 0) & (iy < ny)
    flat = ix[valid] * ny + iy[valid]

    hists = []
    for w in weights:
        wv = None if w is None else np.asarray(w)[valid]
        h = np.bincount(flat, weights=wv, minlength=nx * ny).astype(np.float64)
        hists.append(h.reshape(nx, ny))
    return hists, xedges, yedges


def histogramdd(sample, bins, range=None, weights=None):
    """numpy.histogramdd passthrough with list-of-weights support (2D only
    for the list case)."""
    if isinstance(weights, list):
        x, y = np.asarray(sample).T if np.asarray(sample).ndim == 2 else sample
        return histogram2d(x, y, bins, range, weights)
    return np.histogramdd(sample, bins=bins, range=range, weights=weights)
