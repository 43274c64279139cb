"""Batched differentiable sphere tracing.

TPU-native generalization of the reference's scalar ``Octree::QueryRay``
(Source/HP/Octree.cpp:705-746, marked "Untested" at Include/HP/Octree.h:73)
and ``SDF::Ray`` slab intersection (Source/HP/Ray.cpp:17-65):

  * ``intersect_aabb``  <- Ray::IntersectAABB (slab method), vectorized.
  * ``trace``           <- QueryRay: march <= MAX_STEPS with the same step
    rule ``t += 0.95*v + 1e-4`` and hit test ``v < 1e-4``, but over a whole
    ray batch as one ``lax.while_loop`` (converged lanes are masked out, the
    loop ends when every lane has settled).
  * ``render``          <- builds a pinhole-camera ray grid, traces, and
    shades with analytic normals (the reference has no renderer; this is the
    framework's flagship forward pass).

Differentiability: the march itself is a while_loop (not reverse-mode
differentiable), so ``trace`` carries a custom VJP w.r.t. the coefficient
array using implicit-function differentiation at the hit point:

    f(c, t) = 0  at the surface  =>  dt/dc = - (df/dc) / (df/dt),
    df/dt = grad_x f . dir.

This is the "custom VJP through the march" requirement from SURVEY.md
section 7 -- gradients flow through hit *positions*, not just the final
distance evaluation.

The whole path runs in f32: the fitted f64 coefficients are cast once inside
the jitted program (render accuracy is bounded by hit_eps=1e-4 >> f32 eps).
"""

from __future__ import annotations

import dataclasses
import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp

from . import basis
from .tree import Octree
from .query import descend

# March constants (reference: Source/HP/Octree.cpp:725-743).
MAX_STEPS = 200          # step cap               (:725)
HIT_EPS = 1e-4           # |v| < eps  => surface  (:733)
STEP_SCALE = 0.95        # 5% SDF-error safety    (:739)
MIN_STEP = 1e-4          # minimum advance        (:739)


class TraceResult(NamedTuple):
    t: jax.Array        # (B,) ray parameter at hit (or last march position)
    hit: jax.Array      # (B,) bool
    steps: jax.Array    # () int32, march rounds actually executed


# --------------------------------------------------------------------------
# Ray / AABB intersection (slab method)
# --------------------------------------------------------------------------

def intersect_aabb(origins: jax.Array, dirs: jax.Array,
                   aabb_min, aabb_max):
    """Batched slab-method ray/AABB intersection.

    Equivalent of Ray::IntersectAABB (Source/HP/Ray.cpp:17-65) without the
    precomputed sign tables -- min/max over the reciprocal-direction slabs is
    branch-free and vectorizes directly.

    origins, dirs: (B, 3). Returns (t_near, t_far, hits) with hits a bool
    mask; for rays starting inside the box t_near <= 0 <= t_far.
    """
    inv = 1.0 / dirs                       # inf on zero components is fine
    lo = (jnp.asarray(aabb_min, origins.dtype) - origins) * inv
    hi = (jnp.asarray(aabb_max, origins.dtype) - origins) * inv
    t0 = jnp.min(jnp.maximum(lo, hi), axis=-1)
    t1 = jnp.max(jnp.minimum(lo, hi), axis=-1)
    t_near = jnp.max(jnp.minimum(lo, hi), axis=-1)
    t_far = jnp.min(jnp.maximum(lo, hi), axis=-1)
    del t0, t1
    return t_near, t_far, (t_far >= jnp.maximum(t_near, 0.0))


# --------------------------------------------------------------------------
# Core march
# --------------------------------------------------------------------------

def _tree_f32(tree: Octree) -> Octree:
    return dataclasses.replace(
        tree,
        centre=tree.centre.astype(jnp.float32),
        coeffs=tree.coeffs.astype(jnp.float32))


def _values_at(tree: Octree, pts: jax.Array) -> jax.Array:
    """f32 SDF values at world points, boundary-clamped (no outside
    sentinel -- marching clamps t into the AABB interval instead)."""
    centre = jnp.asarray(tree.config.root_centre, pts.dtype)
    inv = jnp.asarray(1.0 / tree.config.root_sizes, pts.dtype)
    unit = jnp.clip((pts - centre) * inv, -0.5, 0.5)
    leaf = descend(tree, unit)
    depth = tree.depth[leaf]
    scale = jnp.exp2((depth + 1).astype(pts.dtype))
    local = (unit - tree.centre[leaf]) * scale[..., None]
    return basis.eval_basis(tree.coeffs[leaf], local, depth, tree.deg_used)


def _march(tree32: Octree, origins, dirs, t_max, hit_eps, max_steps):
    """The while_loop march over a ray batch; all f32."""
    lo, hi = tree32.root_aabb
    t_near, t_far, hits_box = intersect_aabb(origins, dirs, lo, hi)
    # Clamp the start to the AABB entry point (reference: Octree.cpp:714-721).
    t = jnp.maximum(t_near, 0.0)
    t_end = jnp.minimum(t_far, t_max)
    active0 = hits_box & (t <= t_end)
    hit0 = jnp.zeros_like(active0)

    def cond(state):
        _, _, active, k = state
        return jnp.logical_and(jnp.any(active), k < max_steps)

    def body(state):
        t, hit, active, k = state
        p = origins + t[..., None] * dirs
        v = _values_at(tree32, p)
        now_hit = active & (v < hit_eps)
        step = STEP_SCALE * v + MIN_STEP                     # (:739)
        t_new = jnp.where(active & ~now_hit, t + step, t)
        escaped = t_new > t_end
        return (t_new, hit | now_hit, active & ~now_hit & ~escaped, k + 1)

    t, hit, _, k = jax.lax.while_loop(
        cond, body, (t, hit0, active0, jnp.int32(0)))
    return t, hit, k


# --------------------------------------------------------------------------
# Differentiable trace (custom VJP w.r.t. coefficients)
# --------------------------------------------------------------------------

# ``static`` must stay hashable (custom_vjp nondiff args cannot hold
# tracers), so the tree's device arrays travel as explicit arguments and the
# Octree is rebuilt inside. Only ``coeffs`` carries a nonzero cotangent.

def _rebuild(static, child_idx, centre, depth, coeffs) -> Octree:
    n_nodes, deg_used, depth_used, config = static[:4]
    return Octree(child_idx=child_idx, centre=centre, depth=depth,
                  degree=depth,  # unused on the read path; any i32[N] works
                  coeffs=coeffs, n_nodes=n_nodes, deg_used=deg_used,
                  depth_used=depth_used, config=config)


@functools.partial(jax.custom_vjp, nondiff_argnums=(0,))
def _trace_core(static, child_idx, centre, depth, coeffs, origins, dirs,
                t_max):
    hit_eps, max_steps = static[4:]
    tree32 = _rebuild(static, child_idx, centre, depth, coeffs)
    return _march(tree32, origins, dirs, t_max, hit_eps, max_steps)


def _trace_fwd(static, child_idx, centre, depth, coeffs, origins, dirs,
               t_max):
    out = _trace_core(static, child_idx, centre, depth, coeffs, origins,
                      dirs, t_max)
    t, hit, _ = out
    return out, (child_idx, centre, depth, coeffs, origins, dirs, t, hit)


def _trace_bwd(static, res, cts):
    child_idx, centre, depth, coeffs, origins, dirs, t, hit = res
    dt = cts[0]
    p = origins + t[..., None] * dirs

    def f_of_c(c):
        return _values_at(_rebuild(static, child_idx, centre, depth, c), p)

    # df/dt = grad_x f . dir via forward-mode along the ray direction.
    def f_of_t(tv):
        return _values_at(_rebuild(static, child_idx, centre, depth, coeffs),
                          origins + tv[..., None] * dirs)

    _, dfdt = jax.jvp(f_of_t, (t,), (jnp.ones_like(t),))
    # Implicit function theorem at f = 0: dt = -(df/dc)/(df/dt).
    safe = jnp.where(jnp.abs(dfdt) > 1e-6, dfdt, 1e-6)
    w = jnp.where(hit, -dt / safe, 0.0)
    _, pull = jax.vjp(f_of_c, coeffs)
    (dcoeffs,) = pull(w)

    def zct(x):  # int-dtype primals take float0 cotangents
        if jnp.issubdtype(x.dtype, jnp.integer):
            return jnp.zeros(x.shape, dtype=jax.dtypes.float0)
        return jnp.zeros_like(x)

    return (zct(child_idx), zct(centre), zct(depth), dcoeffs, zct(origins),
            zct(dirs), jnp.zeros((), origins.dtype))


_trace_core.defvjp(_trace_fwd, _trace_bwd)


def _static_of(tree32: Octree, hit_eps, max_steps):
    return (tree32.n_nodes, tree32.deg_used, tree32.depth_used, tree32.config,
            hit_eps, max_steps)


def trace(tree: Octree, origins: jax.Array, dirs: jax.Array,
          t_max: float = 10.0, hit_eps: float = HIT_EPS,
          max_steps: int = MAX_STEPS) -> TraceResult:
    """Sphere-trace a ray batch against the fitted octree.

    origins, dirs: (B, 3) world-space (dirs need not be exactly unit-norm but
    step sizing assumes it). Returns TraceResult(t, hit, steps). The ``t``
    output is differentiable w.r.t. ``tree.coeffs`` (implicit-function VJP).

    Batched equivalent of Octree::QueryRay (Source/HP/Octree.cpp:705-746).
    """
    tree32 = _tree_f32(tree)
    origins = jnp.asarray(origins, jnp.float32)
    dirs = jnp.asarray(dirs, jnp.float32)
    t, hit, steps = _trace_core(
        _static_of(tree32, hit_eps, max_steps), tree32.child_idx,
        tree32.centre, tree32.depth, tree32.coeffs, origins, dirs,
        jnp.float32(t_max))
    return TraceResult(t, hit, steps)


# --------------------------------------------------------------------------
# Camera + shading
# --------------------------------------------------------------------------

def camera_rays(eye, look_at, up=(0.0, 1.0, 0.0), fov_deg: float = 40.0,
                width: int = 256, height: int = 256):
    """Pinhole camera ray grid. Returns (origins (H*W, 3), dirs (H*W, 3))."""
    eye = jnp.asarray(eye, jnp.float32)
    fwd = jnp.asarray(look_at, jnp.float32) - eye
    fwd = fwd / jnp.linalg.norm(fwd)
    right = jnp.cross(fwd, jnp.asarray(up, jnp.float32))
    right = right / jnp.linalg.norm(right)
    cam_up = jnp.cross(right, fwd)
    tan = jnp.tan(jnp.deg2rad(jnp.float32(fov_deg)) * 0.5)
    xs = (jnp.arange(width, dtype=jnp.float32) + 0.5) / width * 2.0 - 1.0
    ys = 1.0 - (jnp.arange(height, dtype=jnp.float32) + 0.5) / height * 2.0
    aspect = width / height
    px, py = jnp.meshgrid(xs * tan * aspect, ys * tan, indexing="xy")
    d = (px[..., None] * right + py[..., None] * cam_up + fwd)
    d = d / jnp.linalg.norm(d, axis=-1, keepdims=True)
    origins = jnp.broadcast_to(eye, d.shape).reshape(-1, 3)
    return origins, d.reshape(-1, 3)


@functools.partial(jax.jit, static_argnames=("width", "height", "max_steps"))
def _render_impl(tree32: Octree, origins, dirs, t_max, width, height,
                 max_steps):
    t, hit, _ = _trace_core(
        _static_of(tree32, HIT_EPS, max_steps), tree32.child_idx,
        tree32.centre, tree32.depth, tree32.coeffs, origins, dirs, t_max)
    p = origins + t[..., None] * dirs
    # analytic normal = unit gradient at the hit point
    grad = jax.grad(lambda q: _values_at(tree32, q[None, :])[0])
    normals = jax.vmap(grad)(p)
    normals = normals / jnp.maximum(
        jnp.linalg.norm(normals, axis=-1, keepdims=True), 1e-12)
    # headlight Lambertian + small ambient
    lam = jnp.maximum(-jnp.sum(normals * dirs, axis=-1), 0.0)
    shade = jnp.where(hit, 0.15 + 0.85 * lam, 0.0)
    img = jnp.stack([shade, shade, shade], axis=-1)
    depth = jnp.where(hit, t, jnp.inf)
    return (img.reshape(height, width, 3), depth.reshape(height, width),
            hit.reshape(height, width))


def render(tree: Octree, eye, look_at, up=(0.0, 1.0, 0.0),
           fov_deg: float = 40.0, width: int = 256, height: int = 256,
           t_max: float = 10.0, max_steps: int = MAX_STEPS):
    """Render the octree SDF with sphere tracing + normal shading.

    Returns (image (H, W, 3) f32 in [0,1], depth (H, W), hit (H, W) bool).
    """
    origins, dirs = camera_rays(eye, look_at, up, fov_deg, width, height)
    return _render_impl(_tree_f32(tree), origins, dirs, jnp.float32(t_max),
                        width, height, max_steps)
