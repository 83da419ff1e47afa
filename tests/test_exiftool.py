"""ExifTool batch-wrapper tests (gated on the external binary, like the
reference's exiftool dependency)."""

import shutil

import pytest

from auromat_tpu.util.exiftool import ExifTool

HAVE_EXIFTOOL = shutil.which("exiftool") is not None


def test_missing_binary_raises(monkeypatch):
    import auromat_tpu.util.exiftool as m
    monkeypatch.setattr(m.shutil, "which", lambda _: None)
    with pytest.raises(RuntimeError):
        ExifTool()


@pytest.mark.skipif(not HAVE_EXIFTOOL, reason="exiftool binary not installed")
def test_get_metadata(tmp_path):
    import numpy as np
    from PIL import Image

    p = tmp_path / "img.jpg"
    Image.fromarray(np.zeros((8, 8, 3), dtype=np.uint8)).save(p)
    with ExifTool() as et:
        meta = et.get_metadata(p)
        assert meta.get("File:ImageWidth") == 8 or meta.get("ImageWidth") == 8
