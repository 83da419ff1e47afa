"""Ad-hoc debug entry points (reference auromat/debug.py:22-95):
quick horizon/graticule checks from an image + wcs pair, batch masking."""

import os


def check_horizon(image_path, wcs_path, out_path=None, altitude=110.0):
    """Overlay the computed Earth horizon on the photo; returns the PNG path."""
    from auromat_tpu.draw import draw_horizon
    from auromat_tpu.draw_helpers import save_fig
    from auromat_tpu.mapping.spacecraft import get_mapping

    m = get_mapping(image_path, wcs_path, altitude=altitude, fast_center=True)
    fig = draw_horizon(m)
    out_path = out_path or os.path.splitext(image_path)[0] + "_horizon.png"
    return save_fig(out_path, fig)


def check_graticule(image_path, wcs_path, out_path=None, altitude=110.0):
    """Overlay parallels/meridians on the photo; returns the PNG path."""
    from auromat_tpu.draw import draw_parallels_meridians
    from auromat_tpu.draw_helpers import save_fig
    from auromat_tpu.mapping.spacecraft import get_mapping

    m = get_mapping(image_path, wcs_path, altitude=altitude, fast_center=True)
    fig = draw_parallels_meridians(m)
    out_path = out_path or os.path.splitext(image_path)[0] + "_grid.png"
    return save_fig(out_path, fig)


def batch_mask(image_folder, out_folder):
    """Run star-field masking over a folder, writing masked previews."""

    from auromat_tpu.io.image import load_image, save_image
    from auromat_tpu.solving.masking import mask_starfield

    os.makedirs(out_folder, exist_ok=True)
    results = {}
    for f in sorted(os.listdir(image_folder)):
        if os.path.splitext(f)[1].lower() not in (".jpg", ".jpeg", ".png"):
            continue
        img = load_image(os.path.join(image_folder, f))
        mask, sigma = mask_starfield(img)
        preview = img.copy()
        preview[~mask] = 0
        out = os.path.join(out_folder, f)
        save_image(out, preview)
        results[f] = (out, sigma)
    return results
