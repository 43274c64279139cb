"""Build configuration.

TPU-native equivalent of ``SDF::Config`` (reference: Include/HP/Config.h:12-43,
Source/HP/Config.cpp:5-32). Differences from the reference, by design:

  * ``thread_count`` is gone -- parallelism comes from batched device ops and
    ``jax.sharding`` meshes, not std::thread pools.
  * ``max_degree``/``max_depth`` are per-build knobs (the reference hard-codes
    BASIS_MAX_DEGREE=12 / TREE_MAX_DEPTH=10 at compile time); they bound the
    static shapes of the compiled kernels.
  * ``node_capacity`` preallocates the flat SoA arrays (XLA needs static
    shapes; the reference grows a std::vector).
"""

from __future__ import annotations

import dataclasses
import enum

import numpy as np

from . import consts


class NearnessWeighting(enum.Enum):
    """Nearness-weighting modes for the per-node error (paper eqs (11)/(12);
    reference: Include/HP/Config.h:17-27)."""
    NONE = 0
    POLYNOMIAL = 1
    EXPONENTIAL = 2


@dataclasses.dataclass(frozen=True)
class Config:
    # Refinement stops when the summed node error drops below this
    # (reference: Config.h:36, default 1e-10 at Config.cpp:5-14).
    target_error: float = 1e-10

    nearness_weighting: NearnessWeighting = NearnessWeighting.NONE
    nearness_strength: float = 0.0

    continuity: bool = True
    continuity_strength: float = 8.0

    # Root AABB in world space: (min, max) corners.
    # Default unit cube centered at origin (reference: Config.cpp:12-13).
    root_min: tuple[float, float, float] = (-0.5, -0.5, -0.5)
    root_max: tuple[float, float, float] = (0.5, 0.5, 0.5)

    max_degree: int = consts.BASIS_MAX_DEGREE
    max_depth: int = consts.TREE_MAX_DEPTH

    # Static capacity of the SoA node arrays. Builds abort (with a clear
    # error) if refinement would exceed it.
    node_capacity: int = 200_000

    # Working dtype of the quadrature-projection fits. The reference fits in
    # f64 (Source/HP/Octree.cpp:1007-1093); "float64" reproduces that but
    # TPUs have no f64 datapath (f64 arrays silently truncate to f32), so
    # f64 builds run on the host CPU backend. "compensated" is the
    # TPU-resident equivalent: double-float (two-f32, ~4e-15 relative)
    # accumulation in the quadrature projection via error-free transforms
    # (df64.py), f64-equivalent within fit-parity tolerances while running
    # entirely in native f32 device ops -- the default choice on TPU. Pass a
    # df64.DF64Fn (e.g. df64.Sphere) as F to also evaluate the FIELD at
    # double-float precision; a plain F is sampled in f32 (~1e-7 relative
    # field noise), which bounds achievable target_error around ~1e-9.
    # "float32" is the cheapest: plain f32 projection, fine whenever the
    # serving path is f32 anyway and target_error >= ~1e-6.
    fit_dtype: str = "float64"

    enable_logging: bool = False

    def validate(self) -> None:
        """Mirror of Config::IsValid (reference: Source/HP/Config.cpp:17-32)."""
        if not (self.target_error > 0.0):
            raise ValueError("target_error must be > 0")
        if self.nearness_weighting != NearnessWeighting.NONE:
            if not (self.nearness_strength > 0.0):
                raise ValueError("nearness_strength must be > 0")
        if self.continuity and not (self.continuity_strength > 0.0):
            raise ValueError("continuity_strength must be > 0")
        rmin = np.asarray(self.root_min, dtype=np.float64)
        rmax = np.asarray(self.root_max, dtype=np.float64)
        if not np.all(rmax > rmin):
            raise ValueError("root AABB must have positive volume")
        if not (1 <= self.max_degree <= consts.BASIS_MAX_DEGREE):
            raise ValueError("max_degree out of range")
        if not (consts.COARSE_DEPTH <= self.max_depth <= consts.TREE_MAX_DEPTH):
            raise ValueError("max_depth out of range")
        if self.fit_dtype not in ("float32", "float64", "compensated"):
            raise ValueError(
                "fit_dtype must be 'float32', 'float64' or 'compensated'")

    # -- world <-> internal unit-cube transform -----------------------------
    # The build normalizes the domain so the tree always spans [-0.5, 0.5]^3
    # internally (reference: Source/HP/Octree.cpp:321-328).

    @property
    def root_centre(self) -> np.ndarray:
        return (np.asarray(self.root_min, np.float64)
                + np.asarray(self.root_max, np.float64)) * 0.5

    @property
    def root_sizes(self) -> np.ndarray:
        return (np.asarray(self.root_max, np.float64)
                - np.asarray(self.root_min, np.float64))
