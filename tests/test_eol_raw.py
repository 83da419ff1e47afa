"""EOL RAW ordering pipeline against a local fake archive server
(order -> staging delay -> poll -> download; reference eol.py:229-396),
plus the EXIF-driven lens-distortion lookup."""

import http.server
import threading

import numpy as np
import pytest

from auromat_tpu.solving.eol import download_image_sequence_raw


class FakeEOL(http.server.BaseHTTPRequestHandler):
    """Simulates the EOL archive: photo pages, frame probes, the RAW order
    endpoint, and files that stage only after the order + two polls."""

    state = None  # set per test: dict(orders={}, polls={}, gap_frames=set())

    def log_message(self, *a):
        pass

    def _reply(self, code, body=b""):
        self.send_response(code)
        self.send_header("Content-Length", str(len(body)))
        self.end_headers()
        self.wfile.write(body)

    def do_GET(self):
        s = self.state
        path = self.path
        if path.startswith("/photo"):
            frame = int(path.split("frame=")[1].split("&")[0])
            body = (f'<a href="/x/iss030e{frame:06d}.NEF">RAW</a>'
                    ).encode()
            self._reply(200, body)
        elif path.startswith("/jpg/"):
            frame = int(path.rsplit("-", 1)[1].split(".")[0])
            self._reply(404 if frame in s["gap_frames"] else 200, b"jpegish")
        elif path.startswith("/request"):
            fname = path.split("file=")[1]
            s["orders"][fname] = s["orders"].get(fname, 0) + 1
            self._reply(200, b"Your request may take 5 minutes or more")
        elif path.startswith("/aurora"):
            # aurora-videos index page: named anchors + photo.pl link pairs
            body = b"""<html><body>
<a name="iss030_aurora1">Aurora Australis <b>over</b> Indian Ocean</a>
<p>some text with a stray thumbnail link
<a href="/scripts/sseop/photo.pl?mission=ISS099&roll=X&frame=1" target="_blank">thumb</a>
that must NOT be paired into the frame range:
<a href="/scripts/sseop/photo.pl?mission=ISS030&roll=E&frame=100" target="_blank">
<nobr>ISS030-E-100</a> to
<a href="/scripts/sseop/photo.pl?mission=ISS030&roll=E&frame=104" target="_blank">
<nobr>ISS030-E-104</a></p>
<a name="iss029_seq">Aurora Borealis sequence</a>
<a href="/scripts/sseop/photo.pl?mission=ISS029&roll=E&frame=8000" target="_blank">
<nobr>ISS029-E-8000</a> to
<a href="/scripts/sseop/photo.pl?mission=ISS029&roll=E&frame=8050" target="_blank">
<nobr>ISS029-E-8050</a>
<a name="broken">No links in this one</a>
</body></html>"""
            self._reply(200, body)
        elif path.startswith("/raw/"):
            fname = path.split("/raw/")[1]
            if s["orders"].get(fname, 0) == 0:
                self._reply(404)
                return
            s["polls"][fname] = s["polls"].get(fname, 0) + 1
            if s["polls"][fname] >= 3:  # staged after two failed polls
                self._reply(200, b"NEFDATA" + fname.encode())
            else:
                self._reply(404)
        else:
            self._reply(404)


@pytest.fixture()
def fake_server():
    FakeEOL.state = {"orders": {}, "polls": {}, "gap_frames": {102}}
    srv = http.server.ThreadingHTTPServer(("127.0.0.1", 0), FakeEOL)
    t = threading.Thread(target=srv.serve_forever, daemon=True)
    t.start()
    yield f"http://127.0.0.1:{srv.server_address[1]}", FakeEOL.state
    srv.shutdown()


def _urls(base):
    return {
        "photo_page": base + "/photo?mission={mission}&roll={roll}&frame={frame}",
        "jpg": base + "/jpg/{mission}-{roll}-{frame}.JPG",
        "raw_request": base + "/request?frame={frame}&file={file}",
        "raw": base + "/raw/{file}",
    }


class TestRawOrderFlow:
    def test_order_poll_download(self, fake_server, tmp_path):
        base, state = fake_server
        meta, failures = download_image_sequence_raw(
            str(tmp_path), "ISS030", 100, 104, urls=_urls(base),
            poll_interval=0.01, stall_timeout=5.0, sleep=lambda s: None)
        assert failures == []
        assert meta is not None
        assert meta["rawFrameGaps"] == [102]
        # every existing frame was ordered exactly once and polled >= 3x
        for f in (100, 101, 103, 104):
            name = f"iss030e{f:06d}.NEF"
            assert state["orders"][name] == 1
            assert state["polls"][name] >= 3
            out = tmp_path / f"ISS030-E-{f}.nef"
            assert out.exists()
            assert out.read_bytes().startswith(b"NEFDATA")
        assert not (tmp_path / "in_progress").exists()
        # resume: a second call short-circuits on the metadata sidecar
        orders_before = dict(state["orders"])
        meta2, failures2 = download_image_sequence_raw(
            str(tmp_path), "ISS030", 100, 104, urls=_urls(base),
            sleep=lambda s: None)
        assert failures2 == [] and meta2["raw"]
        assert state["orders"] == orders_before

    def test_missing_end_frame_raises(self, fake_server, tmp_path):
        base, state = fake_server
        state["gap_frames"] = {104}
        with pytest.raises(ValueError):
            download_image_sequence_raw(
                str(tmp_path), "ISS030", 100, 104, urls=_urls(base),
                poll_interval=0.01, stall_timeout=2.0, sleep=lambda s: None)

    def test_stalled_staging_reports_failures(self, fake_server, tmp_path):
        base, state = fake_server
        # files never stage: polls never reach the threshold
        state["polls"] = {}
        orig = FakeEOL.do_GET

        def never_stage(self):
            if self.path.startswith("/raw/"):
                self._reply(404)
            else:
                orig(self)

        FakeEOL.do_GET = never_stage
        try:
            meta, failures = download_image_sequence_raw(
                str(tmp_path), "ISS030", 100, 101, urls=_urls(base),
                poll_interval=0.0, stall_timeout=0.05, sleep=lambda s: None)
        finally:
            FakeEOL.do_GET = orig
        assert meta is None
        assert len(failures) == 2


class TestExifLensLookup:
    def test_lookup_and_interpolation(self):
        from auromat_tpu.util.lensdistortion import lookup_from_exif

        info = lookup_from_exif({"Model": "NIKON D3S",
                                 "LensModel": "24.0 mm f/1.4",
                                 "FocalLength": "24.0 mm"})
        assert info["model"] == "poly3"
        assert info["params"][0] == pytest.approx(-0.019)

    def test_partial_lens_name_match(self):
        from auromat_tpu.util.lensdistortion import lookup_from_exif

        info = lookup_from_exif({"Model": "Nikon D3s",
                                 "Lens": "AF-S Nikkor 50.0 mm f/1.4G",
                                 "FocalLength": 50.0})
        assert info["params"][0] == pytest.approx(-0.007)

    def test_unknown_raises_and_register(self):
        from auromat_tpu.util.lensdistortion import (lookup_from_exif,
                                                     register_lens)

        exif = {"Model": "TESTCAM", "LensModel": "9.9 mm f/9",
                "FocalLength": 9.9}
        with pytest.raises(LookupError):
            lookup_from_exif(exif)
        register_lens("TESTCAM", "9.9 mm f/9", 9.9, "ptlens",
                      (0.01, -0.02, 0.0), crop_factor=1.5)
        info = lookup_from_exif(exif)
        assert info["model"] == "ptlens" and info["crop_factor"] == 1.5

    def test_exif_correct_roundtrip_shape(self):
        from auromat_tpu.util.lensdistortion import correct_lens_distortion_exif

        img = np.random.default_rng(0).integers(
            0, 255, (48, 64, 3)).astype(np.uint8)
        out = correct_lens_distortion_exif(
            img, {"Model": "NIKON D3S", "LensModel": "24.0 mm f/1.4",
                  "FocalLength": "24.0 mm"})
        assert np.asarray(out).shape == img.shape


class TestRawResumeExtension:
    def test_extending_the_range_downloads_new_frames(self, fake_server,
                                                      tmp_path):
        base, state = fake_server
        kw = dict(urls=_urls(base), poll_interval=0.01, stall_timeout=5.0,
                  sleep=lambda s: None)
        meta, failures = download_image_sequence_raw(
            str(tmp_path), "ISS030", 100, 101, **kw)
        assert failures == [] and meta["rawToFrame"] == 101
        # a wider request must NOT short-circuit on the old sidecar
        meta2, failures2 = download_image_sequence_raw(
            str(tmp_path), "ISS030", 100, 104, **kw)
        assert failures2 == []
        assert meta2["rawToFrame"] == 104
        assert (tmp_path / "ISS030-E-104.nef").exists()
        assert meta2["rawFrameGaps"] == [102]


class TestAuroraSequenceIndex:
    """extract_aurora_sequences against the fake archive's index page
    (reference eol.py:398-413)."""

    def test_parse_and_feed_download(self, fake_server, tmp_path):
        from auromat_tpu.solving.eol import (download_image_sequence,
                                             extract_aurora_sequences)

        base, state = fake_server
        seqs = extract_aurora_sequences(url=base + "/aurora.htm")
        assert len(seqs) == 2  # the anchor without links is skipped
        s0 = seqs[0]
        assert (s0.mission, s0.roll) == ("ISS030", "E")
        assert (s0.from_frame, s0.to_frame) == (100, 104)
        assert s0.url_anchor == "iss030_aurora1"
        assert s0.title == "Aurora Australis over Indian Ocean"  # tags stripped
        assert (seqs[1].mission, seqs[1].from_frame, seqs[1].to_frame) == (
            "ISS029", 8000, 8050)

        # the parsed range feeds the JPEG sequence downloader directly
        downloaded, missing = download_image_sequence(
            str(tmp_path), s0.mission, s0.from_frame, s0.to_frame,
            url_template=base + "/jpg/{mission}-E-{frame}.JPG")
        assert missing == [102]  # the fake's gap frame
        assert len(downloaded) == 4
