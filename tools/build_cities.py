"""Build resources/cities_ne50m.npz from Natural Earth populated places.

The reference bundles the public-domain Natural Earth
ne_50m_populated_places_simple shapefile and scatters city points on its
Basemap plots (reference draw.py:403-420 _drawCities). This tool re-bundles
the same PUBLIC-DOMAIN DATA (naturalearthdata.com, "free for any purpose")
as a compact npz — same treatment the Xephem constellation data got — via a
minimal pure-Python reader for point .shp + .dbf (no GDAL/pyshp in this
environment).

Usage: python tools/build_cities.py [shapefile_basename] (default: the
reference's bundled copy).
"""

import os
import struct
import sys

import numpy as np


def read_point_shp(path):
    """Read an ESRI point shapefile -> (lon, lat) float64 arrays."""
    lons, lats = [], []
    with open(path, "rb") as f:
        header = f.read(100)
        assert struct.unpack(">i", header[:4])[0] == 9994, "not a shapefile"
        shape_type = struct.unpack("<i", header[32:36])[0]
        assert shape_type == 1, f"not a point shapefile (type {shape_type})"
        while True:
            rec_header = f.read(8)
            if len(rec_header) < 8:
                break
            (_, length_words) = struct.unpack(">ii", rec_header)
            rec = f.read(length_words * 2)
            rtype = struct.unpack("<i", rec[:4])[0]
            if rtype == 1:  # point (type 0 = null shape, skip)
                x, y = struct.unpack("<dd", rec[4:20])
                lons.append(x)
                lats.append(y)
    return np.asarray(lons), np.asarray(lats)


def read_dbf(path, fields):
    """Read selected columns from a dBASE III .dbf -> dict of lists."""
    with open(path, "rb") as f:
        header = f.read(32)
        n_records = struct.unpack("<I", header[4:8])[0]
        header_size = struct.unpack("<H", header[8:10])[0]
        record_size = struct.unpack("<H", header[10:12])[0]
        descs = []
        while True:
            d = f.read(32)
            if d[0:1] == b"\r":
                f.seek(-31, 1)
                break
            name = d[:11].split(b"\x00")[0].decode("ascii", "replace")
            ftype = d[11:12].decode("ascii")
            size = d[16]
            descs.append((name, ftype, size))
        f.seek(header_size)
        out = {name: [] for name in fields}
        for _ in range(n_records):
            rec = f.read(record_size)
            if len(rec) < record_size or rec[0:1] == b"*":  # deleted
                continue
            off = 1
            for name, ftype, size in descs:
                raw = rec[off : off + size]
                off += size
                if name not in fields:
                    continue
                text = raw.decode("utf-8", "replace").strip()
                if ftype in "NF":
                    try:
                        out[name].append(float(text) if text else np.nan)
                    except ValueError:
                        out[name].append(np.nan)
                else:
                    out[name].append(text)
    return out


def build(base, out_path):
    lons, lats = read_point_shp(base + ".shp")
    attrs = read_dbf(base + ".dbf", {"name", "natscale", "pop_max"})
    n = len(lons)
    natscale = np.asarray(attrs.get("natscale") or [10.0] * n, np.float32)
    names = np.asarray(attrs.get("name") or [""] * n, dtype=object)
    assert len(natscale) == n and len(names) == n, (n, len(natscale))
    np.savez_compressed(
        out_path,
        lons=lons.astype(np.float32), lats=lats.astype(np.float32),
        natscale=natscale, names=names.astype(str),
    )
    print(f"wrote {out_path}: {n} places")


if __name__ == "__main__":
    default = "/root/reference/auromat/resources/ne_50m_populated_places_simple"
    base = sys.argv[1] if len(sys.argv) > 1 else default
    here = os.path.dirname(os.path.abspath(__file__))
    build(base, os.path.join(here, "..", "auromat_tpu", "resources",
                             "cities_ne50m.npz"))
