"""Triangle utilities, device-side.

Vectorized equivalent of Meshing::Utility (reference:
Source/Meshing/Utility.cpp:5-97 -- Ericson RTCD 5.1.5 closest point on
triangle, returning WHICH simplex (vertex/edge/face) is closest, which the
sign test needs to pick the right pseudo-normal).

Feature codes: 0,1,2 = vertices a,b,c; 3,4,5 = edges ab,bc,ca; 6 = face.
All ops are branch-free where-cascades over arbitrary leading batch shapes.
"""

from __future__ import annotations

import jax.numpy as jnp

FEAT_A, FEAT_B, FEAT_C = 0, 1, 2
FEAT_AB, FEAT_BC, FEAT_CA = 3, 4, 5
FEAT_FACE = 6


def closest_point_triangle(p, a, b, c):
    """Closest point on triangle (a, b, c) to p, plus the feature code.

    p, a, b, c: (..., 3). Returns (closest (..., 3), feature (...,) i32).
    """
    ab = b - a
    ac = c - a
    ap = p - a
    d1 = jnp.sum(ab * ap, axis=-1)
    d2 = jnp.sum(ac * ap, axis=-1)

    bp = p - b
    d3 = jnp.sum(ab * bp, axis=-1)
    d4 = jnp.sum(ac * bp, axis=-1)

    cp = p - c
    d5 = jnp.sum(ab * cp, axis=-1)
    d6 = jnp.sum(ac * cp, axis=-1)

    va = d3 * d6 - d5 * d4
    vb = d5 * d2 - d1 * d6
    vc = d1 * d4 - d3 * d2

    eps = 1e-30
    # region predicates, in Ericson's order
    in_a = (d1 <= 0) & (d2 <= 0)
    in_b = (d3 >= 0) & (d4 <= d3)
    in_c = (d6 >= 0) & (d5 <= d6)
    in_ab = (vc <= 0) & (d1 >= 0) & (d3 <= 0)
    in_ca = (vb <= 0) & (d2 >= 0) & (d6 <= 0)
    in_bc = (va <= 0) & (d4 - d3 >= 0) & (d5 - d6 >= 0)

    t_ab = d1 / jnp.where(jnp.abs(d1 - d3) > eps, d1 - d3, eps)
    t_ca = d2 / jnp.where(jnp.abs(d2 - d6) > eps, d2 - d6, eps)
    den_bc = (d4 - d3) + (d5 - d6)
    t_bc = (d4 - d3) / jnp.where(jnp.abs(den_bc) > eps, den_bc, eps)

    denom = va + vb + vc
    denom = jnp.where(jnp.abs(denom) > eps, denom, eps)
    v = vb / denom
    w = vc / denom
    face_pt = a + ab * v[..., None] + ac * w[..., None]

    # priority cascade (first true wins)
    feature = jnp.where(
        in_a, FEAT_A,
        jnp.where(in_b, FEAT_B,
                  jnp.where(in_c, FEAT_C,
                            jnp.where(in_ab, FEAT_AB,
                                      jnp.where(in_ca, FEAT_CA,
                                                jnp.where(in_bc, FEAT_BC,
                                                          FEAT_FACE))))))
    feature = feature.astype(jnp.int32)

    pt = face_pt
    pt = jnp.where((feature == FEAT_BC)[..., None],
                   b + (c - b) * t_bc[..., None], pt)
    pt = jnp.where((feature == FEAT_CA)[..., None],
                   a + ac * t_ca[..., None], pt)
    pt = jnp.where((feature == FEAT_AB)[..., None],
                   a + ab * t_ab[..., None], pt)
    pt = jnp.where((feature == FEAT_C)[..., None], c, pt)
    pt = jnp.where((feature == FEAT_B)[..., None], b, pt)
    pt = jnp.where((feature == FEAT_A)[..., None], a, pt)
    return pt, feature


def aabb_dist2(p, box_min, box_max):
    """Squared distance from points to AABBs (ClosestPtOnAABB,
    reference: Source/Meshing/Utility.cpp:100-139). Shapes (..., 3)."""
    d = jnp.maximum(box_min - p, 0.0) + jnp.maximum(p - box_max, 0.0)
    return jnp.sum(d * d, axis=-1)


def triangle_aabbs(tris):
    """(T, 3, 3) triangle vertices -> (T, 3) min, (T, 3) max."""
    return tris.min(axis=1), tris.max(axis=1)
