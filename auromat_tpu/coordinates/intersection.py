"""Ray/sphere and ray/ellipsoid intersection as pure jax.numpy device code.

Semantics match the reference exactly (auromat/coordinates/intersection.py):

* the quadratic is solved in ellipsoid-scaled space,
* ``directed=True`` returns the first hit along the ray; origins inside the
  body return the forward exit point; hits behind the origin become NaN,
* ``directed=False`` returns the hit closest (by |distance|) to the origin,
* misses are NaN.

NaN propagation is the masking mechanism of the whole framework, so the
miss/behind-origin NaN behaviour here is load-bearing.
"""

import jax.numpy as jnp


def _is_inside_ellipsoid(point, a, b):
    x, y, z = point[..., 0], point[..., 1], point[..., 2]
    return (x / a) ** 2 + (y / a) ** 2 + (z / b) ** 2 < 1.0


def ellipsoid_line_intersection(a, b, line_origin, line_direction, directed=True):
    """Intersection points of rays with an origin-centred ellipsoid of revolution.

    :param a: equatorial semi-axis
    :param b: polar semi-axis
    :param line_origin: (3,) single origin shared by all rays
    :param line_direction: (..., 3) direction vectors (need not be unit)
    :returns: (..., 3) intersection points; NaN where there is no (forward) hit
    """
    origin = jnp.asarray(line_origin)
    direction = jnp.asarray(line_direction)

    inv = jnp.array([1.0 / a, 1.0 / a, 1.0 / b], dtype=direction.dtype)
    ds = direction * inv  # scaled direction
    os_ = -origin * inv  # scaled (negated) origin, matching reference's sign use

    dir_dot_ori = jnp.sum(ds * os_, axis=-1)
    dir_dot_dir = jnp.sum(ds * ds, axis=-1)
    ori_dot_ori = jnp.sum(os_ * os_, axis=-1)

    root_term = dir_dot_ori * dir_dot_ori - ori_dot_ori * dir_dot_dir + dir_dot_dir
    root = jnp.sqrt(root_term)  # NaN when no intersection

    d1 = dir_dot_ori - root
    d2 = dir_dot_ori + root
    if directed:
        inside = _is_inside_ellipsoid(origin, a, b)
        d_min = jnp.where(inside, d2, d1)
        d_min = jnp.where(d_min < 0, jnp.nan, d_min)
    else:
        d_min = jnp.where(jnp.abs(d1) < jnp.abs(d2), d1, d2)

    d_min = d_min / dir_dot_dir
    return direction * d_min[..., None] + origin


def ellipsoid_line_intersects(a, b, line_origin, line_direction, directed=True):
    """Boolean variant of :func:`ellipsoid_line_intersection`.

    Reference: auromat/coordinates/intersection.py:165-237.
    """
    origin = jnp.asarray(line_origin)
    direction = jnp.asarray(line_direction)
    inv = jnp.array([1.0 / a, 1.0 / a, 1.0 / b], dtype=direction.dtype)
    ds = direction * inv
    os_ = -origin * inv
    dir_dot_ori = jnp.sum(ds * os_, axis=-1)
    dir_dot_dir = jnp.sum(ds * ds, axis=-1)
    ori_dot_ori = jnp.sum(os_ * os_, axis=-1)
    root_term = dir_dot_ori * dir_dot_ori - ori_dot_ori * dir_dot_dir + dir_dot_dir
    if directed:
        root = jnp.sqrt(root_term)
        inside = _is_inside_ellipsoid(origin, a, b)
        d_min = jnp.where(inside, dir_dot_ori + root, dir_dot_ori - root)
        return d_min >= 0
    return root_term >= 0


def sphere_line_intersection(radius, line_origin, line_direction, directed=True):
    """Intersection of rays with an origin-centred sphere.

    ``line_direction`` must be unit vectors (matching the reference contract,
    auromat/coordinates/intersection.py:12-48).
    """
    origin = jnp.asarray(line_origin)
    direction = jnp.asarray(line_direction)
    dir_pos_dot = jnp.sum(direction * origin, axis=-1)
    root_term = dir_pos_dot * dir_pos_dot - jnp.sum(origin * origin, axis=-1) + radius * radius
    root = jnp.sqrt(root_term)
    neg = -dir_pos_dot
    d1 = neg - root
    d2 = neg + root
    if directed:
        inside = jnp.linalg.norm(origin, axis=-1) < radius
        d_min = jnp.where(inside, d2, d1)
        d_min = jnp.where(d_min < 0, jnp.nan, d_min)
    else:
        d_min = jnp.where(jnp.abs(d1) < jnp.abs(d2), d1, d2)
    return origin + d_min[..., None] * direction
