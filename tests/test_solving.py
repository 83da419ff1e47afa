"""Solving pipeline tests: masking on the real ISS frame, noise estimation,
solver command construction + timeout kill (with a stand-in binary), lens
distortion models, and EOL sequence metadata."""

import os
import stat
import sys
import time

import numpy as np
import pytest

from auromat_tpu.io.image import load_image
from auromat_tpu.solving import masking, noise, solving
from auromat_tpu.solving.eol import SequenceMetadata, frame_id
from auromat_tpu.util import lensdistortion

RES = os.path.join(os.path.dirname(__file__), "resources")
ISS = os.path.join(RES, "ISS029-E-8492.jpg")


class TestNoise:
    def test_pure_noise(self):
        rng = np.random.default_rng(0)
        sigma = 7.0
        im = rng.normal(128, sigma, (256, 256))
        est = noise.estimate_noise_level(im)
        assert abs(est - sigma) < 0.5

    def test_flat_image(self):
        assert noise.estimate_noise_level(np.full((64, 64), 100.0)) == 0.0


class TestMasking:
    def test_mask_starfield_real_frame(self):
        img = load_image(ISS)
        mask, sigma = masking.mask_starfield(img)
        assert mask.shape == img.shape[:2]
        frac = mask.mean()
        # the star sky occupies the upper part of this frame
        assert 0.1 < frac < 0.7, frac
        # upper third should be mostly starfield, lower third mostly masked
        h = mask.shape[0]
        assert mask[: h // 3].mean() > 0.3
        assert mask[: h // 3].mean() > 3 * mask[-h // 3 :].mean()
        assert sigma >= 0.9

    def test_mask_rect(self):
        img = load_image(ISS)
        mask, sigma = masking.mask_starfield_rect(img, (10, 10), (500, 300))
        assert mask[10:300, 10:500].all()
        assert not mask[301:, :].any()
        assert sigma > 0

    def test_max_size_rectangle(self):
        m = np.zeros((6, 8), dtype=bool)
        m[1:4, 2:7] = True
        m[5, 0] = True
        (y, x), (h, w) = masking._max_size_rectangle(m)
        assert (y, x, h, w) == (1, 2, 3, 5)

    def test_view_as_blocks(self):
        a = np.arange(24).reshape(4, 6)
        b = masking.view_as_blocks(a, (2, 3))
        assert b.shape == (2, 2, 2, 3)
        assert np.array_equal(b[0, 0], [[0, 1, 2], [6, 7, 8]])
        b[0, 0] = 0  # view is writable into the original
        assert a[0, 0] == 0


class TestSolverDriver:
    def test_command_construction(self):
        cmd = solving.build_solve_command(
            "img.png", "/tmp/out", scale_range=(20.0, 40.0), sigma=3.5,
        )
        s = " ".join(cmd)
        assert "--crpix-center" in s
        assert "--scale-low 20.000" in s
        assert "--scale-high 40.000" in s
        assert "--sigma 3.50" in s
        assert "--no-tweak" in s

    def test_timeout_kills_process_tree(self):
        t0 = time.time()
        code, _, err = solving.run_with_timeout(
            [sys.executable, "-c", "import time,subprocess,sys;"
             "p=subprocess.Popen([sys.executable,'-c','import time;time.sleep(60)']);"
             "time.sleep(60)"],
            timeout=2,
        )
        assert code is None
        assert time.time() - t0 < 20

    def test_fake_solver_end_to_end(self, tmp_path):
        """A stand-in solve-field that emits a .wcs validates the whole
        mask->invoke->read-back flow without astrometry.net."""
        wcs_src = os.path.join(RES, "ISS029-E-8492.wcs")
        fake = tmp_path / "solve-field"
        fake.write_text(
            "#!/bin/sh\n"
            "# emulate astrometry.net: write <base>.wcs into --dir\n"
            'img="$1"; shift\n'
            'dir=""\n'
            'while [ $# -gt 0 ]; do if [ "$1" = "--dir" ]; then dir="$2"; fi; shift; done\n'
            f'cp {wcs_src} "$dir/$(basename "${{img%.*}}").wcs"\n'
        )
        fake.chmod(fake.stat().st_mode | stat.S_IEXEC)
        out_wcs = tmp_path / "out.wcs"
        result = solving.solve_image(
            ISS, str(out_wcs), mask=True, solve_field=str(fake),
            work_dir=str(tmp_path),
        )
        assert result == str(out_wcs)
        from auromat_tpu.io import fits

        header = fits.read_header(result)
        assert header["CTYPE1"] == "RA---TAN"
        img = load_image(ISS)
        assert header["IMAGEW"] == img.shape[1]

    def test_missing_solver_raises(self):
        with pytest.raises(RuntimeError, match="not found"):
            solving.solve_image(ISS, solve_field="definitely-not-a-binary")


class TestLensDistortion:
    def test_zero_distortion_identity(self):
        rng = np.random.default_rng(0)
        img = (rng.random((40, 60, 3)) * 255).astype(np.uint8)
        out = lensdistortion.correct_lens_distortion(img, "ptlens", (0, 0, 0))
        assert np.array_equal(out, img)

    def test_models(self):
        r = np.array([0.0, 0.5, 1.0])
        f = np.asarray(lensdistortion.distortion_factor("poly3", (0.1,), r))
        np.testing.assert_allclose(f, [0.9, 0.925, 1.0])
        f5 = np.asarray(lensdistortion.distortion_factor("poly5", (0.1, 0.01), r))
        np.testing.assert_allclose(f5, [1.0, 1.025625, 1.11])

    def test_inverse_radius(self):
        params = (0.02, -0.05, 0.03)
        ru = np.linspace(0.01, 1.2, 50)
        rd = ru * np.asarray(lensdistortion.distortion_factor("ptlens", params, ru))
        back = np.asarray(lensdistortion.undistorted_radius("ptlens", params, rd))
        np.testing.assert_allclose(back, ru, atol=1e-6)

    def test_barrel_distortion_moves_corners(self):
        img = np.zeros((64, 64), dtype=np.uint8)
        img[10, 10] = 255
        out = lensdistortion.correct_lens_distortion(img, "poly3", (0.15,))
        assert out[10, 10] != 255 or out.sum() != 255  # content moved
        dx, dy = lensdistortion.distortion_displacement((64, 64), "poly3", (0.15,))
        assert abs(dx[32, 32]) < 0.1  # near-centre barely displaced
        assert abs(dx[0, 0]) > 0.5  # corners displaced


class TestEol:
    def test_frame_id(self):
        assert frame_id("ISS030", 102170) == "ISS030-E-102170"

    def test_metadata_sidecar(self, tmp_path):
        meta = SequenceMetadata(str(tmp_path))
        meta.update(mission="ISS030", fromFrame=1, toFrame=10)
        meta2 = SequenceMetadata(str(tmp_path))
        assert meta2["mission"] == "ISS030"
        assert meta2["toFrame"] == 10
