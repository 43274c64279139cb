"""Shared analytic SDF oracles for tests (the reference's dominant oracle
pattern: closed-form SDF + dense random sampling, SURVEY.md section 4)."""

import numpy as np
import jax.numpy as jnp


def sphere_sdf(centre=(0.0, 0.0, 0.0), radius=0.25):
    c = jnp.asarray(centre, jnp.float64)

    def F(p):
        return jnp.linalg.norm(p - c, axis=-1) - radius

    return F


def box_sdf(centre=(0.0, 0.0, 0.0), half=(0.2, 0.2, 0.2)):
    c = jnp.asarray(centre, jnp.float64)
    h = jnp.asarray(half, jnp.float64)

    def F(p):
        q = jnp.abs(p - c) - h
        outside = jnp.linalg.norm(jnp.maximum(q, 0.0), axis=-1)
        inside = jnp.minimum(jnp.max(q, axis=-1), 0.0)
        return outside + inside

    return F


def torus_sdf(centre=(0.0, 0.0, 0.0), R=0.25, r=0.08):
    c = jnp.asarray(centre, jnp.float64)

    def F(p):
        q = p - c
        qx = jnp.sqrt(q[..., 0] ** 2 + q[..., 1] ** 2) - R
        return jnp.sqrt(qx**2 + q[..., 2] ** 2) - r

    return F


def uniform_pts(n, lo=-0.5, hi=0.5, seed=0):
    rng = np.random.default_rng(seed)
    return rng.uniform(lo, hi, (n, 3)).astype(np.float64)


# -- procedural watertight meshes (the reference's large .obj assets are in
#    .MISSING_LARGE_BLOBS and not present) ----------------------------------

def cube_mesh(centre=(0.0, 0.0, 0.0), half=0.2):
    """12-triangle axis-aligned cube, outward-oriented."""
    c = np.asarray(centre, np.float64)
    s = np.asarray(
        [[x, y, z] for x in (-1, 1) for y in (-1, 1) for z in (-1, 1)],
        np.float64)
    v = c + half * s
    quads = [  # (4 verts, CCW seen from outside)
        (0, 1, 3, 2),   # -x
        (4, 6, 7, 5),   # +x
        (0, 4, 5, 1),   # -y
        (2, 3, 7, 6),   # +y
        (0, 2, 6, 4),   # -z
        (1, 5, 7, 3),   # +z
    ]
    f = []
    for a, b, cc, d in quads:
        f.append((a, b, cc))
        f.append((a, cc, d))
    return v, np.asarray(f, np.int32)


def icosphere_mesh(radius=0.3, subdivisions=3, centre=(0.0, 0.0, 0.0)):
    """Subdivided icosahedron (watertight, 20*4^s triangles) -- delegates to
    the package generator (hpsdf_tpu/mesh/gen.py)."""
    from hpsdf_tpu.mesh import gen
    return gen.icosphere(radius, subdivisions, centre)
