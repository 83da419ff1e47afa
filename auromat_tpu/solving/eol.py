"""NASA Earth Observation Laboratory (EOL) image sequence downloader.

Functional equivalent of auromat/solving/eol.py: downloads continuous
mission/frame sequences of ISS photographs (JPEG), tolerating small frame
gaps, and keeps a JSON metadata sidecar describing the sequence. RAW (NEF)
request/polling against the EOL order system is represented by the same
public entry points but requires network credentials not available in tests.
"""

import json
import os
from datetime import datetime

from auromat_tpu.util.url import DownloadError, download_file

LARGE_JPEG_URL = (
    "https://eol.jsc.nasa.gov/DatabaseImages/ESC/large/{mission}/{mission}-E-{frame}.JPG"
)

METADATA_FILENAME = "_metadata.json"


class SequenceMetadata:
    """JSON sidecar for a downloaded sequence (reference eol.py:57-78)."""

    def __init__(self, folder):
        self.path = os.path.join(folder, METADATA_FILENAME)
        self.data = {}
        if os.path.exists(self.path):
            with open(self.path) as f:
                self.data = json.load(f)

    def update(self, **kw):
        self.data.update(kw)
        self.data["updated"] = datetime.now().isoformat()
        with open(self.path, "w") as f:
            json.dump(self.data, f, indent=2, sort_keys=True)

    def __getitem__(self, key):
        return self.data[key]

    def get(self, key, default=None):
        return self.data.get(key, default)


def frame_id(mission, frame):
    return f"{mission}-E-{frame}"


def download_image_sequence(folder, mission, from_frame, to_frame,
                            max_gap=10, url_template=LARGE_JPEG_URL):
    """Download frames [from_frame, to_frame] of a mission into ``folder``.

    Missing frames are tolerated up to ``max_gap`` consecutive failures
    (reference eol.py:208-227 frame-gap tolerance). Already-present files are
    skipped (resume semantics).

    :returns: (downloaded paths, missing frame numbers)
    """
    os.makedirs(folder, exist_ok=True)
    meta = SequenceMetadata(folder)
    downloaded, missing = [], []
    gap = 0
    for frame in range(from_frame, to_frame + 1):
        name = frame_id(mission, frame) + ".jpg"
        path = os.path.join(folder, name)
        if os.path.exists(path):
            downloaded.append(path)
            gap = 0
            continue
        url = url_template.format(mission=mission, frame=frame)
        try:
            download_file(url, path)
            downloaded.append(path)
            gap = 0
        except DownloadError:
            missing.append(frame)
            gap += 1
            if gap > max_gap:
                break
    meta.update(
        mission=mission, fromFrame=from_frame, toFrame=to_frame,
        downloaded=len(downloaded), missing=missing,
    )
    return downloaded, missing


def correct_lens_distortion(folder, out_folder, **kw):
    """Undistort every image of a folder (reference eol.py:454-489)."""
    from auromat_tpu.io.image import load_image, save_image
    from auromat_tpu.util.lensdistortion import correct_lens_distortion as correct

    os.makedirs(out_folder, exist_ok=True)
    outputs = []
    for f in sorted(os.listdir(folder)):
        if os.path.splitext(f)[1].lower() not in (".jpg", ".jpeg", ".png", ".tif", ".tiff"):
            continue
        img = load_image(os.path.join(folder, f))
        corrected = correct(img, **kw)
        out = os.path.join(out_folder, f)
        save_image(out, corrected)
        outputs.append(out)
    return outputs
