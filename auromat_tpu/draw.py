"""Map and diagnostic plotting.

Covers the drawing surface of the reference (auromat/draw.py) with plain
matplotlib — no basemap dependency. The stereographic projection is computed
directly (it is a three-line formula); coastlines are optional (supply a
(n, 2) lat/lon polyline file — basemap's bundled datasets are not shipped).

Main entry points:
  draw_plot                  lat/lon plate-carree polygon plot
  draw_stereographic         stereographic projection plot (geo or MLat/MLT)
  draw_mlat_mlt_polar        polar MLat/MLT dial plot
  draw_kml_image             Google-Earth KML + ground overlay
  draw_scanlines_co          keogram-style sequence coroutine
  draw_parallels_meridians   graticule in image space
  draw_horizon               Earth horizon overlay in image space
  draw_histogram             simple histogram plot (masking diagnostics)
  draw_astrometry_pixel_scales  pixel-scale diagnostic
All ``draw_*`` functions return a matplotlib Figure; use
:func:`auromat_tpu.draw_helpers.save_fig` to write it out.
"""

import numpy as np
import numpy.ma as ma

from auromat_tpu.draw_helpers import (
    mlt_formatter,
    overlap_polygons,
    polygons_from_mapping_or_collection,
    save_fig,  # noqa: F401  (re-export, reference draw.saveFig)
)
from auromat_tpu.coordinates.transform import mlt_to_sm_lon


def _new_axes(figsize=(10, 8), facecolor="white"):
    import matplotlib

    matplotlib.use("Agg", force=False)
    import matplotlib.pyplot as plt

    fig, ax = plt.subplots(figsize=figsize, facecolor=facecolor)
    return fig, ax


def _poly_collection(ax, verts, colors, rasterized=True):
    from matplotlib.collections import PolyCollection

    coll = PolyCollection(
        overlap_polygons(verts, 0.12), facecolors=colors, edgecolors="none",
        rasterized=rasterized,
    )
    ax.add_collection(coll)
    return coll


def draw_plot(mapping, figsize=(10, 8)):
    """Pixel polygons in raw lat/lon coordinates (reference draw.py:67)."""
    verts, colors = polygons_from_mapping_or_collection(mapping)
    fig, ax = _new_axes(figsize)
    _poly_collection(ax, verts, colors)
    ax.set_xlim(np.nanmin(verts[..., 0]), np.nanmax(verts[..., 0]))
    ax.set_ylim(np.nanmin(verts[..., 1]), np.nanmax(verts[..., 1]))
    ax.set_xlabel("Longitude [deg]")
    ax.set_ylabel("Latitude [deg]")
    ax.set_aspect("auto")
    return fig


def stereographic_project(lats_deg, lons_deg, lat0, lon0, radius=6371.0):
    """Stereographic projection about (lat0, lon0), km in the tangent plane."""
    lat = np.deg2rad(np.asarray(lats_deg, dtype=np.float64))
    lon = np.deg2rad(np.asarray(lons_deg, dtype=np.float64))
    lat0r, lon0r = np.deg2rad(lat0), np.deg2rad(lon0)
    cosc = (
        np.sin(lat0r) * np.sin(lat)
        + np.cos(lat0r) * np.cos(lat) * np.cos(lon - lon0r)
    )
    with np.errstate(divide="ignore", invalid="ignore"):
        k = 2.0 * radius / (1.0 + cosc)
    x = k * np.cos(lat) * np.sin(lon - lon0r)
    y = k * (
        np.cos(lat0r) * np.sin(lat)
        - np.sin(lat0r) * np.cos(lat) * np.cos(lon - lon0r)
    )
    return x, y


def _graticule(ax, lat0, lon0, width_km, height_km, mlt_labels=False):
    lat_lines = np.arange(-80, 81, 5)
    lon_lines = np.arange(-180, 180, 10)
    for lat in lat_lines:
        lons = np.linspace(-180, 180, 361)
        x, y = stereographic_project(np.full_like(lons, float(lat)), lons, lat0, lon0)
        ax.plot(x, y, color="gray", lw=0.4, alpha=0.6, zorder=1)
    for lon in lon_lines:
        lats = np.linspace(-80, 80, 161)
        x, y = stereographic_project(lats, np.full_like(lats, float(lon)), lat0, lon0)
        ax.plot(x, y, color="gray", lw=0.4, alpha=0.6, zorder=1)


def draw_stereographic(mapping_or_collection, mlatmlt=False, coastlines=None,
                       figsize=(10, 10), bgcolor="black"):
    """Stereographic plot centred on the data (reference draw.py:140-222).

    :param mlatmlt: plot in the MLat/MLT system (drawStereographicMLatMLT)
    :param coastlines: optional (n, 2) lat/lon polyline array (NaN-separated)
    """
    verts, colors = polygons_from_mapping_or_collection(
        mapping_or_collection, mlatmlt=mlatmlt
    )
    if mlatmlt:
        # verts currently hold (mlt, mlat); convert mlt -> SM longitude
        verts = verts.copy()
        verts[..., 0] = mlt_to_sm_lon(verts[..., 0])
    bb = mapping_or_collection.boundingBox
    center = bb.center
    size = bb.size
    lat0, lon0 = center.lat, center.lon
    if mlatmlt:
        # centre in magnetic coordinates: use mean of vertices
        lat0 = float(np.nanmean(verts[..., 1]))
        lon0 = float(np.nanmean(verts[..., 0]))

    px, py = stereographic_project(verts[..., 1], verts[..., 0], lat0, lon0)
    pverts = np.stack([px, py], axis=-1)

    fig, ax = _new_axes(figsize, facecolor=bgcolor)
    ax.set_facecolor(bgcolor)
    _graticule(ax, lat0, lon0, size.width, size.height)
    if coastlines is not None:
        cx, cy = stereographic_project(coastlines[:, 0], coastlines[:, 1], lat0, lon0)
        ax.plot(cx, cy, color="#888888", lw=0.6, zorder=2)
    _poly_collection(ax, pverts, colors)
    half_w = max(size.width, 100) * 0.75
    half_h = max(size.height, 100) * 0.75
    ax.set_xlim(-half_w, half_w)
    ax.set_ylim(-half_h, half_h)
    ax.set_aspect("equal")
    ax.set_xticks([])
    ax.set_yticks([])
    return fig


def draw_stereographic_mlat_mlt(mapping_or_collection, **kw):
    """Reference drawStereographicMLatMLT (draw.py:224)."""
    return draw_stereographic(mapping_or_collection, mlatmlt=True, **kw)


def draw_mlat_mlt_polar(mapping_or_collection, min_mlat=40, figsize=(10, 10)):
    """Polar dial: radius = 90-MLat, angle = MLT (reference draw.py:242)."""
    import matplotlib.pyplot as plt

    verts, colors = polygons_from_mapping_or_collection(
        mapping_or_collection, mlatmlt=True
    )
    # verts: (mlt hours, mlat deg) -> polar (theta, r)
    theta = verts[..., 0] * (2 * np.pi / 24.0) - np.pi / 2  # midnight at bottom
    r = 90.0 - verts[..., 1]
    pverts = np.stack([theta, r], axis=-1)

    fig = plt.figure(figsize=figsize)
    ax = fig.add_subplot(projection="polar")
    from matplotlib.collections import PolyCollection

    ax.add_collection(PolyCollection(pverts, facecolors=colors, edgecolors="none"))
    ax.set_rmax(90 - min_mlat)
    ax.set_theta_zero_location("S")
    ax.set_xticks(np.arange(0, 2 * np.pi, np.pi / 4))
    ax.set_xticklabels([mlt_formatter(h) for h in range(0, 24, 3)])
    yticks = np.arange(10, 90 - min_mlat + 1, 10)
    ax.set_yticks(yticks)
    ax.set_yticklabels([f"{90 - t:.0f}" for t in yticks])
    return fig


def draw_kml_image(kml_path, mapping, resample_arcsec=100):
    """Google-Earth KML with a plate-carree ground overlay PNG.

    Reference drawKmlImage (draw.py:103). The mapping is resampled to a
    regular grid; the PNG + .kml file pair is written next to each other.
    """
    import os

    from auromat_tpu.mapping.mapping import is_plate_carree
    from auromat_tpu.resample import resample

    m = mapping
    if not is_plate_carree(m.lats, m.lons):
        m = resample(mapping, arcsec_per_px=resample_arcsec, method="mean")
    rgb = np.asarray(m.rgb.filled(0))
    alpha = (~m.center_mask * 255).astype(np.uint8)
    rgba = np.dstack([rgb, alpha])
    png_path = os.path.splitext(kml_path)[0] + ".png"
    from PIL import Image

    Image.fromarray(rgba).save(png_path)
    bb = m.boundingBox
    name = m.identifier or "mapping"
    kml = f"""<?xml version="1.0" encoding="UTF-8"?>
<kml xmlns="http://www.opengis.net/kml/2.2">
  <GroundOverlay>
    <name>{name}</name>
    <Icon><href>{os.path.basename(png_path)}</href></Icon>
    <LatLonBox>
      <north>{bb.latNorth}</north>
      <south>{bb.latSouth}</south>
      <east>{bb.lonEast}</east>
      <west>{bb.lonWest}</west>
    </LatLonBox>
  </GroundOverlay>
</kml>
"""
    with open(kml_path, "w") as f:
        f.write(kml)
    return kml_path, png_path


def draw_parallels_meridians(mapping, lat_step=2.0, lon_step=5.0,
                             figsize=(12, 8)):
    """Graticule drawn in image space over the photograph.

    Contours of the per-pixel latitude/longitude grids (simpler and exact
    compared to the reference's resample-pixel-coordinates trick,
    draw.py:1482-1609).
    """
    fig, ax = _new_axes(figsize)
    ax.imshow(np.asarray(mapping.rgb_unmasked))
    lats = np.asarray(mapping.latsCenter.filled(np.nan))
    lons = np.asarray(mapping.lonsCenter.filled(np.nan))
    lat_levels = np.arange(np.floor(np.nanmin(lats)), np.ceil(np.nanmax(lats)), lat_step)
    lon_levels = np.arange(np.floor(np.nanmin(lons)), np.ceil(np.nanmax(lons)), lon_step)
    cs1 = ax.contour(lats, levels=lat_levels, colors="yellow", linewidths=0.6)
    cs2 = ax.contour(lons, levels=lon_levels, colors="cyan", linewidths=0.6)
    ax.clabel(cs1, inline=True, fontsize=7, fmt="%.0f°")
    ax.clabel(cs2, inline=True, fontsize=7, fmt="%.0f°")
    ax.set_xticks([])
    ax.set_yticks([])
    return fig


def draw_horizon(mapping, figsize=(12, 8), color="red"):
    """Earth-horizon line overlaid on the photograph (reference draw.py:446).

    The horizon is the boundary of the set of pixels whose rays hit the
    (non-inflated) Earth.
    """
    from auromat_tpu.coordinates.wcs import TanWcs
    from auromat_tpu.ops.georef import GeorefParams, georeference_points

    fig, ax = _new_axes(figsize)
    ax.imshow(np.asarray(mapping.rgb_unmasked))
    h, w = mapping.img.shape[:2]
    params = GeorefParams.from_wcs(
        _wcs_from_mapping(mapping, w, h), mapping.cameraPosGCRS,
        mapping.photoTime, altitude=0.0,
    )
    stride = max(1, w // 512)
    px, py = np.meshgrid(np.arange(0, w, stride, dtype=float),
                         np.arange(0, h, stride, dtype=float))
    lat, _ = georeference_points(params, px, py)
    hit = np.isfinite(np.asarray(lat)).astype(float)
    ax.contour(px, py, hit, levels=[0.5], colors=color, linewidths=1.2)
    ax.set_xticks([])
    ax.set_yticks([])
    return fig


def _wcs_from_mapping(mapping, w, h):
    wcs_header = getattr(mapping, "wcs_header", None)
    if wcs_header is None:
        raise ValueError(
            "mapping has no WCS header attached; draw_horizon needs an "
            "astrometric mapping"
        )
    from auromat_tpu.coordinates.wcs import TanWcs

    return TanWcs(wcs_header)


def draw_scanlines_co(out, column=None, mlatmlt=False, figsize=(14, 6)):
    """Keogram-style coroutine: send mappings, receive a figure at close.

    Mirrors the drawScanLinesCo/drawScanLinesMLatMLTCo coroutines
    (reference draw.py:589-856): one column (default: centre) is extracted
    per mapping and stacked on a time axis.

    Usage::

        result = {}
        co = draw_scanlines_co(result)
        for m in provider.getSequence(...):
            co.send(m)
        co.close()
        fig = result["figure"]
    """
    from auromat_tpu.util.coroutine import coroutine

    @coroutine
    def _co():
        slices, lats, times = [], [], []
        try:
            while True:
                m = yield
                rgb = np.asarray(m.rgb.filled(0))
                col = column if column is not None else rgb.shape[1] // 2
                slices.append(rgb[:, col])
                if mlatmlt:
                    mlat, _ = m.mLatMltCenter
                    lats.append(np.asarray(mlat.filled(np.nan))[:, col])
                else:
                    lats.append(np.asarray(m.latsCenter.filled(np.nan))[:, col])
                times.append(m.photoTime)
        except GeneratorExit:
            if not slices:
                return
            img = np.stack(slices, axis=1)  # (h, t, 3)
            fig, ax = _new_axes(figsize)
            ax.imshow(img, aspect="auto")
            ax.set_xlabel("Frame")
            lat_axis = np.nanmean(np.stack(lats), axis=0)
            step = max(1, len(lat_axis) // 8)
            ax.set_yticks(np.arange(0, len(lat_axis), step))
            ax.set_yticklabels(
                [f"{v:.1f}" for v in lat_axis[::step]]
            )
            ax.set_ylabel("MLat [deg]" if mlatmlt else "Latitude [deg]")
            out["figure"] = fig
            out["times"] = times

    return _co()


def draw_histogram(hist, vlines=(), xlabel=None, ylabel=None, linecolor="black",
                   figsize=(8, 5)):
    """Histogram curve with optional marked positions (masking diagnostics,
    reference draw.py:531-586)."""
    fig, ax = _new_axes(figsize)
    ax.plot(np.arange(len(hist)), hist, color=linecolor, lw=1.0)
    for pos, color in vlines:
        ax.axvline(pos, color=color, lw=1.0)
    if xlabel:
        ax.set_xlabel(xlabel)
    if ylabel:
        ax.set_ylabel(ylabel)
    return fig


def draw_astrometry_pixel_scales(mapping, figsize=(8, 5)):
    """Distribution of per-pixel angular sizes (reference draw.py:1825+)."""
    scales = mapping.arcSecPerPx
    fig, ax = _new_axes(figsize)
    names = ["width", "height", "diagonal"]
    means = [scales.width.mean, scales.height.mean, scales.diagonal.mean]
    mins = [scales.width.min, scales.height.min, scales.diagonal.min]
    maxs = [scales.width.max, scales.height.max, scales.diagonal.max]
    x = np.arange(3)
    ax.errorbar(
        x, means,
        yerr=[np.array(means) - mins, np.array(maxs) - np.array(means)],
        fmt="o", capsize=4,
    )
    ax.set_xticks(x)
    ax.set_xticklabels(names)
    ax.set_ylabel("arcsec / px")
    return fig


def draw_ra_dec(mapping, stride=64, figsize=(10, 8)):
    """RA/Dec of the frame's pixel grid (astrometry diagnostic,
    reference draw.py:1901-1935)."""
    from auromat_tpu.coordinates.wcs import TanWcs, tan_pix2world

    wcs = _wcs_from_mapping(mapping, *mapping.img.shape[1::-1])
    px, py = np.meshgrid(np.arange(0, wcs.width, stride, dtype=float),
                         np.arange(0, wcs.height, stride, dtype=float))
    ra, dec = tan_pix2world(wcs, px, py)
    fig, ax = _new_axes(figsize)
    ax.scatter(np.asarray(ra).ravel(), np.asarray(dec).ravel(), s=1)
    ax.set_xlabel("RA [deg]")
    ax.set_ylabel("Dec [deg]")
    return fig


def draw_reference_stars(image, xy_lists, colors=("lime", "red", "cyan"),
                         radius=8, figsize=(12, 8)):
    """Detected / reference star positions over the photograph.

    Reference: auromat/draw.py:1193-1290 (drawReferenceStars) — circles at
    the star-list pixel positions of one or more astrometry.net artifacts.

    :param image: (h, w[, 3]) array (or None for positions-only plot)
    :param xy_lists: one (x, y) pair or a sequence of them (e.g. the .axy
        detections and the .xyls reference stars from
        :func:`auromat_tpu.io.fits.read_xy`)
    """
    fig, ax = _new_axes(figsize)
    if image is not None:
        ax.imshow(np.asarray(image), cmap="gray", origin="upper")
    if isinstance(xy_lists, tuple) and len(xy_lists) == 2 and \
            np.ndim(xy_lists[0]) == 1:
        xy_lists = [xy_lists]
    for (x, y), color in zip(xy_lists, colors):
        ax.scatter(np.asarray(x), np.asarray(y), s=radius ** 2,
                   facecolors="none", edgecolors=color, linewidths=1.0)
    ax.set_xlabel("x [px]")
    ax.set_ylabel("y [px]")
    return fig


def draw_indx_plot(image, quadpix, color="yellow", figsize=(12, 8)):
    """The matched astrometry.net quad drawn over the photograph.

    Reference: auromat/draw.py:1292-1360 (drawIndxPlot); quad pixel
    coordinates come from :func:`auromat_tpu.io.fits.read_quad_match`.
    """
    fig, ax = _new_axes(figsize)
    if image is not None:
        ax.imshow(np.asarray(image), cmap="gray", origin="upper")
    q = np.asarray(quadpix, dtype=float)
    loop = np.vstack([q, q[:1]])
    ax.plot(loop[:, 0] - 1, loop[:, 1] - 1, color=color, linewidth=1.5)
    ax.scatter(q[:, 0] - 1, q[:, 1] - 1, color=color, s=30)
    return fig


def draw_corr_plot(corr, image=None, figsize=(12, 8)):
    """Field->index star correspondence residuals (solver diagnostic).

    Reference: auromat/draw.py:1660-1737 (drawCorrPlot). Draws a segment
    from each detected (field) position to its matched catalog (index)
    position; long segments reveal a bad fit region.

    :param corr: (field_x, field_y, index_x, index_y) from
        :func:`auromat_tpu.io.fits.read_corr`
    """
    fx, fy, ix, iy = (np.asarray(v, dtype=float) for v in corr)
    fig, ax = _new_axes(figsize)
    if image is not None:
        ax.imshow(np.asarray(image), cmap="gray", origin="upper")
    ax.scatter(fx - 1, fy - 1, s=25, facecolors="none", edgecolors="lime",
               label="field")
    ax.scatter(ix - 1, iy - 1, s=10, color="red", label="index")
    for a, b, c, d in zip(fx, fy, ix, iy):
        ax.plot([a - 1, c - 1], [b - 1, d - 1], color="orange",
                linewidth=0.8)
    ax.legend()
    return fig


def draw_constellations(wcs_or_mapping, data, color="white", figsize=(12, 8),
                        image=None):
    """Constellation stick figures over the frame.

    Reference: auromat/draw.py:1399-1480 (drawConstellations). The reference
    vendors xephem's constellation dataset (coordinates/constellations.py);
    that dataset is not bundled here — supply ``data`` as a mapping of
    ``name -> [((ra1, dec1), (ra2, dec2)), ...]`` line segments in degrees.
    """
    from auromat_tpu.coordinates.wcs import TanWcs, tan_world2pix

    wcs = (wcs_or_mapping if isinstance(wcs_or_mapping, TanWcs)
           else _wcs_from_mapping(wcs_or_mapping,
                                  *wcs_or_mapping.img.shape[1::-1]))
    fig, ax = _new_axes(figsize)
    if image is not None:
        ax.imshow(np.asarray(image), cmap="gray", origin="upper")
    for name, segments in data.items():
        pts = []
        for (ra1, dec1), (ra2, dec2) in segments:
            x1, y1 = tan_world2pix(wcs, ra1, dec1)
            x2, y2 = tan_world2pix(wcs, ra2, dec2)
            x1, y1, x2, y2 = (float(np.asarray(v)) for v in (x1, y1, x2, y2))
            if (0 <= x1 <= wcs.width and 0 <= y1 <= wcs.height) or \
               (0 <= x2 <= wcs.width and 0 <= y2 <= wcs.height):
                ax.plot([x1, x2], [y1, y2], color=color, linewidth=0.8)
                pts.append((x1, y1))
        if pts:
            cx, cy = np.mean(pts, axis=0)
            ax.annotate(name, (cx, cy), color=color, fontsize=8)
    ax.set_xlim(0, wcs.width)
    ax.set_ylim(wcs.height, 0)
    return fig


def draw_heatmap(lats, lons, bins=100, figsize=(10, 8)):
    """Coverage heatmap of one or many mappings (reference draw.py:531-586).

    :param lats, lons: flat arrays (NaN entries ignored)
    """
    lats = np.asarray(lats, dtype=float).ravel()
    lons = np.asarray(lons, dtype=float).ravel()
    m = ~np.isnan(lats) & ~np.isnan(lons)
    fig, ax = _new_axes(figsize)
    h, xe, ye = np.histogram2d(lons[m], lats[m], bins=bins)
    ax.pcolormesh(xe, ye, h.T, cmap="viridis")
    ax.set_xlabel("longitude [deg]")
    ax.set_ylabel("latitude [deg]")
    return fig


def draw_distortion_displacement(shape=(2832, 4256), model="ptlens",
                                 params=(0.0, 0.0, 0.0), figsize=(10, 7)):
    """Lens-distortion displacement magnitude field.

    Reference: auromat/draw.py:1075-1094 (drawLensDistortionDisplacement);
    the field comes from
    :func:`auromat_tpu.util.lensdistortion.distortion_displacement`.
    """
    from auromat_tpu.util.lensdistortion import distortion_displacement

    dx, dy = distortion_displacement(shape, model, params)
    mag = np.hypot(np.asarray(dx), np.asarray(dy))
    fig, ax = _new_axes(figsize)
    im = ax.imshow(mag, origin="upper")
    fig.colorbar(im, ax=ax, label="displacement [px]")
    return fig
