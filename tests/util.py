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
