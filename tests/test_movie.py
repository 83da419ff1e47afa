"""create_movie command construction / error surfacing with a stand-in
ffmpeg (the binary is absent in this environment, like the reference's
movie_test is gated on it)."""

import os
import stat

import numpy as np
import pytest

from auromat_tpu.util.movie import create_movie


def _fake_ffmpeg(tmp_path, exit_code=0, stderr_msg=""):
    fake = tmp_path / "ffmpeg"
    fake.write_text(
        "#!/bin/sh\n"
        f'echo "$@" > {tmp_path}/argv.txt\n'
        # the input pattern is the argument after -i
        'prev=""\n'
        'for a in "$@"; do if [ "$prev" = "-i" ]; then echo "$a" > '
        f'{tmp_path}/input.txt; fi; prev="$a"; done\n'
        'out=""\n'
        'for a in "$@"; do out="$a"; done\n'
        f'[ {exit_code} -eq 0 ] && touch "$out"\n'
        f'echo "{stderr_msg}" >&2\n'
        f"exit {exit_code}\n"
    )
    fake.chmod(fake.stat().st_mode | stat.S_IEXEC)
    return str(fake)


@pytest.fixture
def frames(tmp_path):
    from auromat_tpu.io.image import save_image

    paths = []
    for i in range(3):
        p = tmp_path / f"odd_name_{i:03d}.png"
        save_image(str(p), np.full((8, 8, 3), i * 40, dtype=np.uint8))
        paths.append(str(p))
    return paths


def test_create_movie_command(tmp_path, frames):
    out = tmp_path / "out.mp4"
    res = create_movie(str(out), frames, fps=12,
                       ffmpeg=_fake_ffmpeg(tmp_path))
    assert res == str(out)
    argv = (tmp_path / "argv.txt").read_text()
    assert "-framerate 12" in argv
    assert "libx264" in argv and "yuv420p" in argv
    # even-dimension safeguard when no width given
    assert "scale=trunc(iw/2)*2:trunc(ih/2)*2" in argv
    # frames are symlinked into a sequential %08d pattern
    pattern = (tmp_path / "input.txt").read_text().strip()
    assert pattern.endswith("%08d.png")


def test_create_movie_width_scaling(tmp_path, frames):
    out = tmp_path / "out.webm"
    create_movie(str(out), frames, width=640,
                 ffmpeg=_fake_ffmpeg(tmp_path))
    argv = (tmp_path / "argv.txt").read_text()
    assert "libvpx" in argv
    assert "scale=640:trunc(ow/a/2)*2" in argv


def test_create_movie_error_surfaces_stderr(tmp_path, frames):
    out = tmp_path / "bad.mp4"
    fake = _fake_ffmpeg(tmp_path, exit_code=1,
                        stderr_msg="width not divisible by 2")
    with pytest.raises(RuntimeError, match="width not divisible by 2"):
        create_movie(str(out), frames, ffmpeg=fake)


def test_create_movie_rejects_unknown_container(tmp_path, frames):
    with pytest.raises(ValueError, match="unsupported movie container"):
        create_movie(str(tmp_path / "x.avi"), frames,
                     ffmpeg=_fake_ffmpeg(tmp_path))
