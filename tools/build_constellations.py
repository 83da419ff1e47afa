"""Regenerate the bundled constellation stick-figure dataset.

The dataset is Xephem's constellation figures (courtesy of Elwood Downey;
BSD-licensed via AURA's misc_astro redistribution), the same public data the
reference vendors as a 1336-line Python table. We store it as a compressed
npz of per-constellation (drawcode, ra_deg, dec_deg) float32 arrays.

Usage: python tools/build_constellations.py <path-to-xephem-table.py> <out.npz>
where the table defines ``data[name] = [[drawcode, ra*1800, dec*60], ...]``.
"""

import sys

import numpy as np


def main(src_path, out_path):
    ns = {}
    with open(src_path) as f:
        exec(compile(f.read(), src_path, "exec"), ns)
    data = ns["data"]
    arrays = {}
    for name, rows in data.items():
        a = np.asarray(rows, dtype=np.float64)
        out = np.empty_like(a, dtype=np.float32)
        out[:, 0] = a[:, 0]                 # 0 = move, 1 = draw
        out[:, 1] = a[:, 1] / 1800.0 * 15.0  # hours*1800 -> degrees
        out[:, 2] = a[:, 2] / 60.0           # degrees*60 -> degrees
        arrays[name] = out
    np.savez_compressed(out_path, **arrays)
    print(f"wrote {len(arrays)} constellations to {out_path}")


if __name__ == "__main__":
    main(sys.argv[1], sys.argv[2])
