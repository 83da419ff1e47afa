"""Direct coverage for the debug entry points, the IGRF dipole pole (vs
executed-reference goldens), and the profiling utilities."""

import os
import shutil
from datetime import datetime

import numpy as np
import pytest

RES = os.path.join(os.path.dirname(__file__), "resources")


def test_igrf_pole_parity():
    """north_geomagnetic_pole_location vs the executed reference
    (transform.py:740-753: IGRF g01/g11/h11 epoch interpolation ->
    mag_lat/mag_lon), golden_igrf_pole.npz — bit-level agreement."""
    from auromat_tpu.coordinates.frames import north_geomagnetic_pole_location

    g = np.load(os.path.join(RES, "golden_igrf_pole.npz"))
    for d, p in zip(g["dates"], g["poles"]):
        lat, lon = north_geomagnetic_pole_location(
            datetime.fromisoformat(str(d)))
        assert abs(lat - p[0]) < 1e-12
        assert abs(lon - p[1]) < 1e-12


def test_igrf_beyond_table_raises():
    from auromat_tpu.coordinates import igrf

    with pytest.raises(ValueError, match="beyond the IGRF"):
        igrf.g01(igrf.NUM_EPOCHS - 1 + 0.2, 0.2)


def test_debug_check_horizon_and_graticule(tmp_path):
    import matplotlib

    matplotlib.use("Agg", force=True)
    from auromat_tpu import debug

    img = os.path.join(RES, "ISS030-E-102170_dc.jpg")
    wcs = os.path.join(RES, "ISS030-E-102170_dc.wcs")
    out1 = debug.check_horizon(img, wcs, out_path=str(tmp_path / "h.png"))
    out2 = debug.check_graticule(img, wcs, out_path=str(tmp_path / "g.png"))
    for out in (out1, out2):
        assert os.path.exists(out)
        assert os.path.getsize(out) > 10000  # a real rendered PNG


def test_debug_batch_mask(tmp_path):
    from auromat_tpu import debug
    from auromat_tpu.io.image import load_image

    src = tmp_path / "in"
    src.mkdir()
    shutil.copy(os.path.join(RES, "ISS030-E-102170_dc.jpg"),
                src / "frame.jpg")
    out_dir = tmp_path / "out"
    results = debug.batch_mask(str(src), str(out_dir))
    assert set(results) == {"frame.jpg"}
    path, sigma = results["frame.jpg"]
    assert os.path.exists(path) and sigma >= 0.9
    preview = load_image(path)
    orig = load_image(str(src / "frame.jpg"))
    # masked-out region must be blacked; starfield kept
    assert (preview == 0).all(axis=-1).mean() > 0.5
    assert preview.shape == orig.shape


def test_stage_timer_and_benchmark():
    import jax.numpy as jnp

    from auromat_tpu.profiling import StageTimer, benchmark

    t = StageTimer(sync=False)
    with t("a"):
        _ = jnp.ones((8, 8)) @ jnp.ones((8, 8))
    with t("a"):
        pass
    with t("b"):
        pass
    assert t.total("a") >= 0.0
    rep = t.report()
    assert "a" in rep and "b" in rep
    med, times = benchmark(lambda x: x + 1, jnp.ones((4,)), iters=3, warmup=1)
    assert med >= 0.0 and len(times) == 3
