"""Minimal FITS header reader/writer (no astropy dependency).

Only headers are needed: astrometry.net ``.wcs`` artifacts are header-only
FITS files (NAXIS=0). Covers the card grammar those files use: strings,
logicals, integers, floats, HISTORY/COMMENT, and the spacecraft-position
cards the reference defines (auromat/fits.py:347-466).
"""

import math
from datetime import datetime

BLOCK = 2880
CARD = 80


class FitsHeader(dict):
    """An ordered keyword->value mapping plus HISTORY/COMMENT lists."""

    def __init__(self, *args, **kw):
        super().__init__(*args, **kw)
        self.comments = {}
        self.history = []
        self.comment_cards = []

    def copy(self):
        h = FitsHeader(self)
        h.comments = dict(self.comments)
        h.history = list(self.history)
        h.comment_cards = list(self.comment_cards)
        return h


def _parse_value(raw: str):
    raw = raw.strip()
    if not raw:
        return None
    if raw.startswith("'"):
        # FITS string: ends at closing quote; '' is an escaped quote
        out = []
        i = 1
        while i < len(raw):
            c = raw[i]
            if c == "'":
                if i + 1 < len(raw) and raw[i + 1] == "'":
                    out.append("'")
                    i += 2
                    continue
                break
            out.append(c)
            i += 1
        return "".join(out).rstrip()
    if raw == "T":
        return True
    if raw == "F":
        return False
    try:
        return int(raw)
    except ValueError:
        pass
    try:
        return float(raw.replace("D", "E").replace("d", "e"))
    except ValueError:
        return raw


def parse_card(card: str):
    """Parse one 80-char card -> (keyword, value, comment) or None for blanks."""
    key = card[:8].rstrip()
    if not key:
        return None
    if key in ("HISTORY", "COMMENT"):
        return key, card[8:].rstrip(), None
    if key == "END":
        return "END", None, None
    if card[8:10] != "= ":
        # commentary-style card without value indicator
        return key, card[8:].rstrip(), None
    rest = card[10:]
    # split off comment: a '/' outside of a quoted string
    in_str = False
    slash = -1
    i = 0
    while i < len(rest):
        c = rest[i]
        if c == "'":
            if in_str and i + 1 < len(rest) and rest[i + 1] == "'":
                i += 2
                continue
            in_str = not in_str
        elif c == "/" and not in_str:
            slash = i
            break
        i += 1
    if slash >= 0:
        value_raw, comment = rest[:slash], rest[slash + 1 :].strip()
    else:
        value_raw, comment = rest, None
    return key, _parse_value(value_raw), comment


def read_header(path_or_bytes) -> FitsHeader:
    """Read the primary header of a FITS file into a :class:`FitsHeader`."""
    if isinstance(path_or_bytes, (bytes, bytearray)):
        data = bytes(path_or_bytes)
    else:
        with open(path_or_bytes, "rb") as f:
            data = f.read()
    header = FitsHeader()
    for off in range(0, len(data), CARD):
        card = data[off : off + CARD].decode("ascii", errors="replace")
        parsed = parse_card(card)
        if parsed is None:
            continue
        key, value, comment = parsed
        if key == "END":
            break
        if key == "HISTORY":
            header.history.append(value)
            continue
        if key == "COMMENT":
            header.comment_cards.append(value)
            continue
        header[key] = value
        if comment:
            header.comments[key] = comment
    return header


def _format_value(value) -> str:
    if isinstance(value, bool):
        return "T".rjust(20) if value else "F".rjust(20)
    if isinstance(value, int):
        return str(value).rjust(20)
    if isinstance(value, float):
        if math.isfinite(value):
            s = repr(value)
        else:
            raise ValueError("non-finite FITS value: %r" % value)
        return s.rjust(20)
    if isinstance(value, str):
        body = value.replace("'", "''")
        body = body.ljust(8)  # min 8 chars in a FITS string
        return ("'%s'" % body).ljust(20)
    raise TypeError("unsupported FITS value type: %r" % type(value))


def format_card(key: str, value, comment=None) -> str:
    if key in ("HISTORY", "COMMENT"):
        card = key.ljust(8) + str(value or "")
    elif value is None and comment is None:
        card = key.ljust(8)
    else:
        card = key.ljust(8) + "= " + _format_value(value)
        if comment:
            card += " / " + comment
    return card[:CARD].ljust(CARD)


def write_header(header: FitsHeader, path):
    """Write a header-only FITS file (NAXIS=0) with the given cards."""
    cards = []
    base = {"SIMPLE": (True, "conforms to FITS standard"),
            "BITPIX": (8, "array data type"),
            "NAXIS": (0, "number of array dimensions")}
    for key, (val, cmt) in base.items():
        cards.append(format_card(key, header.get(key, val), header.comments.get(key, cmt)))
    for key, value in header.items():
        if key in base:
            continue
        cards.append(format_card(key, value, header.comments.get(key)))
    for h in getattr(header, "history", []):
        cards.append(format_card("HISTORY", h))
    for c in getattr(header, "comment_cards", []):
        cards.append(format_card("COMMENT", c))
    cards.append(format_card("END", None))
    blob = "".join(cards).encode("ascii")
    pad = (-len(blob)) % BLOCK
    blob += b" " * pad
    with open(path, "wb") as f:
        f.write(blob)


# ---------------------------------------------------------------------------
# Spacecraft-position header cards (reference: auromat/fits.py:347-466)
# ---------------------------------------------------------------------------

_DATE_OBS_FORMATS = ("%Y-%m-%dT%H:%M:%S.%f", "%Y-%m-%dT%H:%M:%S")


def parse_date_obs(value: str) -> datetime:
    for fmt in _DATE_OBS_FORMATS:
        try:
            return datetime.strptime(value, fmt)
        except ValueError:
            continue
    raise ValueError("unparseable DATE-OBS: %r" % value)


def get_photo_time(header):
    value = header.get("DATE-OBS")
    return parse_date_obs(value) if value else None


def get_spacecraft_position(header):
    """(x, y, z) GCRS km at DATE-OBS, or None."""
    x = header.get("POSX")
    if x is None:
        return None
    return (x, header["POSY"], header["POSZ"])


def set_spacecraft_position(header, xyz, date: datetime):
    if header.get("POSX") is None:
        header.history.append("POS* & DATE-OBS added by auromat_tpu")
    header["POSX"] = float(xyz[0])
    header["POSY"] = float(xyz[1])
    header["POSZ"] = float(xyz[2])
    header.comments["POSX"] = "X coordinate of spacecraft in GCRS at DATE-OBS"
    header.comments["POSY"] = "Y coordinate of spacecraft in GCRS at DATE-OBS"
    header.comments["POSZ"] = "Z coordinate of spacecraft in GCRS at DATE-OBS"
    header["DATE-OBS"] = date.isoformat()
    header.comments["DATE-OBS"] = "EXIF timestamp of the photograph"


def get_shifted_spacecraft_position(header):
    """(x, y, z, shift_seconds) for the time-shift-corrected position, or None.

    Reference: auromat/fits.py:427-445.
    """
    x = header.get("POSXSHIF")
    if x is None or header.get("DATESHIF") is None:
        return None
    return (x, header["POSYSHIF"], header["POSZSHIF"], header["DATESHIF"])


def set_shifted_spacecraft_position(header, xyz, delta_seconds: float):
    if header.get("POSXSHIF") is None:
        header.history.append("POS*SHIF & DATESHIF added by auromat_tpu")
    header["POSXSHIF"] = float(xyz[0])
    header["POSYSHIF"] = float(xyz[1])
    header["POSZSHIF"] = float(xyz[2])
    header["DATESHIF"] = float(delta_seconds)
    header.comments["POSXSHIF"] = "X coordinate of spacecraft in GCRS at DATESHIF"
    header.comments["POSYSHIF"] = "Y coordinate of spacecraft in GCRS at DATESHIF"
    header.comments["POSZSHIF"] = "Z coordinate of spacecraft in GCRS at DATESHIF"
    header.comments["DATESHIF"] = "DATE-OBS shift in seconds"


def get_norad_id(header):
    v = header.get("NORADID")
    return int(v) if v is not None else None


def set_norad_id(header, norad_id: int):
    if header.get("NORADID") is None:
        header.history.append("NORADID added by auromat_tpu")
    header["NORADID"] = str(norad_id)
    header.comments["NORADID"] = "NORAD ID of spacecraft"


def get_cd_matrix(header):
    return (
        (header["CD1_1"], header["CD1_2"]),
        (header["CD2_1"], header["CD2_2"]),
    )


def get_pixel_scale_deg(header):
    """Pixel scale in deg/px from the CD matrix determinant."""
    cd = get_cd_matrix(header)
    det = cd[0][0] * cd[1][1] - cd[0][1] * cd[1][0]
    return math.sqrt(abs(det))


def get_center_radec(header):
    return header["CRVAL1"], header["CRVAL2"]
