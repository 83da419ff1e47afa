"""space-track.org TLE archive client.

Mirrors auromat/coordinates/spacetrack.py: downloads/appends TLEs per NORAD
id into a local archive file, with a minimum update interval and checksum
filtering. Network access is isolated here; everything else consumes plain
TLE files via auromat_tpu.coordinates.ephem.
"""

import os
import urllib.parse
import urllib.request
from datetime import datetime, timedelta

from auromat_tpu.coordinates.ephem import parse_tle_file, tle_checksum_ok
from auromat_tpu.util.url import DownloadError

BASE_URL = "https://www.space-track.org"
LOGIN_URL = BASE_URL + "/ajaxauth/login"
QUERY_URL = (
    BASE_URL + "/basicspacedata/query/class/tle/NORAD_CAT_ID/{norad}/"
    "EPOCH/{start}--{end}/orderby/EPOCH asc/format/tle"
)


class Spacetrack:
    """TLE downloader with a local per-satellite archive.

    :param tle_dir: folder for ``<norad>.tle`` archive files
    :param min_update_interval: re-query at most this often
    """

    def __init__(self, user, password, tle_dir,
                 min_update_interval=timedelta(hours=12)):
        self.user = user
        self.password = password
        self.tle_dir = tle_dir
        self.min_update_interval = min_update_interval
        self._cookie = None
        os.makedirs(tle_dir, exist_ok=True)

    def tle_path(self, norad_id):
        return os.path.join(self.tle_dir, f"{norad_id}.tle")

    def _login(self):
        if self._cookie is not None:
            return
        data = urllib.parse.urlencode(
            {"identity": self.user, "password": self.password}
        ).encode()
        req = urllib.request.Request(LOGIN_URL, data=data)
        try:
            with urllib.request.urlopen(req, timeout=60) as r:
                cookie = r.headers.get("Set-Cookie")
                if not cookie:
                    raise DownloadError("space-track login returned no cookie")
                self._cookie = cookie.split(";")[0]
        except Exception as e:
            raise DownloadError(f"space-track login failed: {e!r}")

    def query(self, norad_id, start: datetime, end: datetime) -> str:
        """Raw TLE text for the satellite in [start, end]."""
        self._login()
        url = QUERY_URL.format(
            norad=norad_id, start=start.strftime("%Y-%m-%d"),
            end=end.strftime("%Y-%m-%d"),
        )
        req = urllib.request.Request(url, headers={"Cookie": self._cookie})
        try:
            with urllib.request.urlopen(req, timeout=120) as r:
                return r.read().decode("ascii", "replace")
        except Exception as e:
            raise DownloadError(f"space-track query failed: {e!r}")

    def update_tles_for(self, norad_id, dates):
        """Ensure the archive covers all given dates (+- 2 days margin)."""
        if not dates:
            return self.tle_path(norad_id)
        return self.update_tles(norad_id, min(dates) - timedelta(days=2),
                                max(dates) + timedelta(days=2))

    # reference API aliases (spacetrack.py:44-92)
    updateTLEsFor = update_tles_for

    def update_tles(self, norad_id, start, end):
        path = self.tle_path(norad_id)
        stamp = path + ".stamp"
        if os.path.exists(stamp):
            mtime = datetime.fromtimestamp(os.path.getmtime(stamp))
            if datetime.now() - mtime < self.min_update_interval and os.path.exists(path):
                # check coverage before skipping
                try:
                    tles = parse_tle_file(path)
                    if tles and tles[0].epoch <= start and tles[-1].epoch >= end:
                        return path
                except Exception:
                    pass
        text = self.query(norad_id, start, end)
        lines = [l for l in text.splitlines() if l.strip()]
        good = [l for l in lines if tle_checksum_ok(l)]
        existing = set()
        if os.path.exists(path):
            with open(path) as f:
                existing = set(l.rstrip("\n") for l in f)
        new = [l for l in good if l not in existing]
        if new:
            with open(path, "a") as f:
                f.write("\n".join(new) + "\n")
        with open(stamp, "w") as f:
            f.write(datetime.now().isoformat())
        return path

    updateTLEs = update_tles
