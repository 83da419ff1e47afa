"""Small reference-API-surface helpers added for completeness.

Each maps 1:1 to a reference symbol (cited in the implementations):
fits CD/centre setters and radius, shifted photo time, EXIF date
conversion, mpl/cv image converters, coroutine throw, consecutive-dup
removal, continuous-path reordering, figure-from-image canvas, EOL
sequence iteration helpers, THEMIS L2 masking, and download_resource.
"""

import os
from datetime import datetime, timedelta

import numpy as np
import pytest

RES = os.path.join(os.path.dirname(__file__), "resources")


def test_cd_matrix_roundtrip():
    from auromat_tpu.io import fits

    header = {"IMAGEW": 4000, "IMAGEH": 3000}
    fits.set_cd_matrix(header, scale=0.002, rotation_deg=30.0)
    assert header["CD1_1"] == pytest.approx(0.002 * np.cos(np.deg2rad(30)))
    assert header["CD2_1"] == pytest.approx(0.002 * np.sin(np.deg2rad(30)))
    assert header["CD1_2"] == -header["CD2_1"]
    assert header["CD2_2"] == header["CD1_1"]
    # scale recoverable: sqrt(det)
    det = header["CD1_1"] * header["CD2_2"] - header["CD1_2"] * header["CD2_1"]
    assert np.sqrt(det) == pytest.approx(0.002)
    assert fits.get_radius(header) == pytest.approx(
        0.002 * np.hypot(4000, 3000) / 2)
    assert fits.get_radius(header, extend=0.5) == pytest.approx(
        fits.get_radius(header) * 1.5)


def test_set_center_radec():
    from auromat_tpu.io import fits

    header = {"IMAGEW": 400, "IMAGEH": 300}
    fits.set_center_radec(header, 123.5, -45.0)
    assert header["CRPIX1"] == 201 and header["CRPIX2"] == 151
    assert header["CRVAL1"] == 123.5 and header["CRVAL2"] == -45.0


def test_get_shifted_photo_time():
    from auromat_tpu.io import fits

    header = fits.read_header(
        os.path.join(RES, "ISS030-E-102170_dc.wcs"))
    t0 = fits.get_photo_time(header)
    shift = fits.get_shifted_spacecraft_position(header)[3]
    assert fits.get_shifted_photo_time(header) == t0 + timedelta(seconds=shift)


def test_convert_exif_date():
    from auromat_tpu.io.image import convert_exif_date

    t = convert_exif_date("2012:01:25 09:27:57")
    assert t == datetime(2012, 1, 25, 9, 27, 57)
    # exiftool may return the subsecond field as an int
    t = convert_exif_date("2012:01:25 09:27:57", 5)
    assert t.microsecond == 500000
    t = convert_exif_date("2012:01:25 09:27:57", "05")
    assert t.microsecond == 50000


def test_image_converters():
    from auromat_tpu.io.image import image_to_cv, image_to_mpl

    rgb8 = np.array([[[0, 128, 255]]], dtype=np.uint8)
    m = image_to_mpl(rgb8)
    assert m.max() <= 1.0 and m[0, 0, 2] == pytest.approx(1.0)
    bgr = image_to_cv(rgb8)
    assert bgr.dtype == np.uint8
    assert list(bgr[0, 0]) == [255, 128, 0]
    rgb16 = np.array([[[65535, 0, 32768]]], dtype=np.uint16)
    m16 = image_to_mpl(rgb16)
    assert m16[0, 0, 0] == pytest.approx(1.0)
    assert m16[0, 0, 2] == pytest.approx(0.5, abs=1e-4)


def test_coroutine_throw():
    import sys

    from auromat_tpu.util.coroutine import coroutine, throw

    seen = []

    @coroutine
    def consumer():
        try:
            while True:
                seen.append((yield))
        except ValueError as e:
            seen.append(("caught", str(e)))
            raise

    c = consumer()
    c.send(1)
    try:
        raise ValueError("boom")
    except ValueError:
        tb = sys.exc_info()[2]
        with pytest.raises(ValueError):
            throw(c, ValueError, "boom", tb)
    assert seen == [1, ("caught", "boom")]


def test_without_consecutive_duplicates():
    from auromat_tpu.utils import without_consecutive_duplicates

    p = np.array([[0, 0], [0, 0], [1, 0], [1, 0], [1, 0], [0, 0]])
    out = without_consecutive_duplicates(p)
    assert out.tolist() == [[0, 0], [1, 0], [0, 0]]


def test_ensure_continuous_path():
    from auromat_tpu.draw_helpers import ensure_continuous_path

    # two segments: middle->right then left->middle, split by a jump
    seg = np.array([[0, 5], [0, 6], [0, 7], [0, 0], [0, 1], [0, 2],
                    [0, 3], [0, 4]])
    out = ensure_continuous_path(seg)
    assert out[:, 1].tolist() == [0, 1, 2, 3, 4, 5, 6, 7]
    cont = np.array([[0, 0], [0, 1], [1, 2]])
    assert ensure_continuous_path(cont).tolist() == cont.tolist()


def test_load_fig_image():
    import matplotlib

    matplotlib.use("Agg", force=True)
    from auromat_tpu.draw_helpers import load_fig_image

    img = np.zeros((40, 60, 3), dtype=np.uint8)
    fig, ax = load_fig_image(img)
    assert ax.get_xlim() == (0, 60)
    assert ax.get_ylim() == (40, 0)  # inverted y: image convention
    import matplotlib.pyplot as plt

    plt.close(fig)


def test_eol_sequence_iters(tmp_path):
    from auromat_tpu.solving import eol

    meta = {"mission": "ISS030", "fromFrame": 10, "toFrame": 14,
            "missing": [12]}
    frames = list(eol.frame_iter(meta))
    assert frames == [10, 11, 13, 14]
    pairs = list(eol.filename_iter(meta))
    assert pairs[0] == ("ISS030-E-10.jpg", 10)
    assert eol.filename_of(13, meta) == "ISS030-E-13.jpg"


def test_eol_download_images_jpg(tmp_path):
    from auromat_tpu.solving import eol

    # existing files are not re-downloaded: pre-create them so no network
    ids = [("ISS030", "E", 7), ("ISS030", "E", 8)]
    for _, _, f in ids:
        (tmp_path / f"ISS030-E-{f}.jpg").write_bytes(b"x")
    paths = eol.download_images(str(tmp_path), ids, "jpg")
    assert [os.path.basename(p) for p in paths] == [
        "ISS030-E-7.jpg", "ISS030-E-8.jpg"]
    with pytest.raises(NotImplementedError):
        eol.download_images(str(tmp_path), ids, "raw")


def test_mask_by_l2():
    from auromat_tpu.mapping.themis import mask_by_l2

    img = np.arange(9, dtype=np.uint16).reshape(3, 3)
    mask = np.zeros((3, 3), dtype=np.int8)
    mask[1, 1] = 1
    out = mask_by_l2(mask, img)
    assert out.dtype == np.float32
    assert np.isnan(out[1, 1])
    assert out[0, 0] == 0 and out[2, 2] == 8
    assert img[1, 1] == 4  # input untouched


def test_download_resource_file_url(tmp_path):
    from auromat_tpu.util.url import DownloadError, download_resource

    p = tmp_path / "x.json"
    p.write_text('{"a": 3}')
    import json

    out = download_resource(p.as_uri(), lambda b: json.loads(b))
    assert out == {"a": 3}
    with pytest.raises(DownloadError):
        download_resource((tmp_path / "missing.json").as_uri(), lambda b: b)


def test_solve_single_image(tmp_path):
    """Single-image solve wrapper (reference solving/spacecraft.py:28-65)
    over the fake-solver flow: writes the wcs, stamps the NORAD id, and
    refuses to clobber without overwrite."""
    import stat

    from auromat_tpu.io import fits
    from auromat_tpu.solving.spacecraft import solve

    wcs_src = os.path.join(RES, "ISS029-E-8492.wcs")
    fake = tmp_path / "solve-field"
    fake.write_text(
        "#!/bin/sh\n"
        'img="$1"; shift\n'
        'dir=""\n'
        'while [ $# -gt 0 ]; do if [ "$1" = "--dir" ]; then dir="$2"; fi; shift; done\n'
        f'cp {wcs_src} "$dir/$(basename "${{img%.*}}").wcs"\n'
    )
    fake.chmod(fake.stat().st_mode | stat.S_IEXEC)
    out_wcs = tmp_path / "out.wcs"
    ok = solve(os.path.join(RES, "ISS029-E-8492.jpg"), str(out_wcs),
               solve_field=str(fake), work_dir=str(tmp_path))
    assert ok is True
    header = fits.read_header(str(out_wcs))
    assert fits.get_norad_id(header) == 25544
    with pytest.raises(FileExistsError):
        solve(os.path.join(RES, "ISS029-E-8492.jpg"), str(out_wcs),
              solve_field=str(fake), work_dir=str(tmp_path))


def test_image_to_mpl_masked_uint8_nan():
    """Masked uint8 pixels must come out NaN (reference converts to float
    BEFORE filling, util/image.py:74-94) — not 0/black."""
    import numpy.ma as ma

    from auromat_tpu.io.image import image_to_mpl

    img = ma.masked_array(
        np.full((2, 2, 3), 200, dtype=np.uint8),
        mask=np.zeros((2, 2, 3), dtype=bool))
    img.mask[0, 0] = True
    out = image_to_mpl(img)
    assert np.isnan(out[0, 0]).all()
    assert out[1, 1, 0] == pytest.approx(200 / 255)


def test_image_to_cv_grayscale_not_mirrored():
    from auromat_tpu.io.image import image_to_cv

    g = np.arange(6, dtype=np.uint8).reshape(2, 3)
    out = image_to_cv(g)
    assert out.tolist() == g.tolist()  # channel reversal must not mirror


def test_frame_iter_raw_sidecar():
    """RAW-order sidecars (rawFromFrame/rawToFrame/rawFrameGaps/pattern)
    written by download_image_sequence_raw must drive the iteration
    helpers too."""
    from auromat_tpu.solving import eol

    meta = {"mission": "ISS030", "roll": "E", "raw": True,
            "rawFromFrame": 5, "rawToFrame": 8, "rawFrameGaps": [6],
            "pattern": "iss030e00000{frame}.nef"}
    assert list(eol.frame_iter(meta)) == [5, 7, 8]
    assert eol.filename_of(5, meta) == "iss030e000005.nef"
    with pytest.raises(KeyError):
        list(eol.frame_iter({"mission": "x"}))


def test_pair_regex_tolerates_trailing_query_params(monkeypatch):
    """photo.pl links carrying extra query params after frame= must still
    pair up (the regex used to require the closing quote immediately
    after the digits, silently skipping the section)."""
    from auromat_tpu.solving import eol
    from auromat_tpu.util import url as url_mod

    page = (
        '<a name="seq1">Aurora</a>'
        '<a href="photo.pl?mission=ISS030&roll=E&frame=5&photo=x">A</a> to '
        '<a href="photo.pl?mission=ISS030&roll=E&frame=9&photo=y">B</a>'
    )
    monkeypatch.setattr(url_mod, "fetch_text", lambda u, timeout=60: page)
    seqs = eol.extract_aurora_sequences("http://x")
    assert len(seqs) == 1
    assert (seqs[0].from_frame, seqs[0].to_frame) == (5, 9)


def test_anchor_regex_rejects_classname(monkeypatch):
    from auromat_tpu.solving import eol
    from auromat_tpu.util import url as url_mod

    page = (
        '<a classname="bogus" href="x">not an anchor</a>'
        '<a href="photo.pl?mission=ISS030&roll=E&frame=5">A</a> to '
        '<a href="photo.pl?mission=ISS030&roll=E&frame=9">B</a>'
        '<A NAME="seq1">Real sequence</A>'
        '<a href="photo.pl?mission=ISS031&roll=E&frame=10">C</a> to '
        '<a href="photo.pl?mission=ISS031&roll=E&frame=20">D</a>'
    )
    monkeypatch.setattr(url_mod, "fetch_text", lambda u, timeout=60: page)
    monkeypatch.setattr(
        "auromat_tpu.solving.eol.AURORA_VIDEOS_URL", "http://x")
    import auromat_tpu.solving.eol as eol_mod
    # extract imports fetch_text inside the function from util.url
    seqs = eol_mod.extract_aurora_sequences("http://x")
    # the classname tag must NOT split the page: only seq1 is an anchor,
    # and its section holds the ISS031 pair
    assert len(seqs) == 1
    assert seqs[0].url_anchor == "seq1"
    assert (seqs[0].mission, seqs[0].from_frame, seqs[0].to_frame) == (
        "ISS031", 10, 20)


def test_save_image_masked_filled_black(tmp_path):
    import numpy.ma as ma

    from auromat_tpu.io.image import load_image, save_image

    img = ma.masked_array(np.full((4, 4, 3), 137, dtype=np.uint8),
                          mask=np.zeros((4, 4, 3), dtype=bool))
    img.mask[0, 0] = True
    p = tmp_path / "m.png"
    save_image(str(p), img)
    back = load_image(str(p))
    assert (back[0, 0] == 0).all()  # masked pixel written as 0
    assert (back[1, 1] == 137).all()


def test_image_to_cv_masked_black():
    import numpy.ma as ma

    from auromat_tpu.io.image import image_to_cv

    img = ma.masked_array(np.full((2, 2, 3), 99, dtype=np.uint8),
                          mask=np.zeros((2, 2, 3), dtype=bool))
    img.mask[0, 0] = True
    out = image_to_cv(img)
    assert (out[0, 0] == 0).all()  # NaN (masked) -> black, not junk
    assert (out[1, 1] == 99).all()


def test_contains_leap_second_mixed_tz():
    from datetime import datetime, timezone

    from auromat_tpu.timeutil import contains_leap_second

    naive = datetime(2015, 6, 1)
    aware = datetime(2015, 7, 15, tzinfo=timezone.utc)
    assert contains_leap_second(naive, aware)  # 2015-06-30 23:59:60
    assert contains_leap_second(aware, naive)  # reversed order too


def test_register_lens_keeps_crop_factor():
    from auromat_tpu.util import lensdistortion as ld

    cam = "TESTCAM UNIQUE"
    ld.register_lens(cam, "a", 24, "poly3", (-0.02,), crop_factor=1.5)
    ld.register_lens(cam, "b", 50, "poly3", (-0.01,))  # defaulted
    assert ld.CAMERA_CROP[cam.lower()] == 1.5
