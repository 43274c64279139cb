"""Reference-faithful greedy build oracle (serial host numpy).

A scalar re-execution of the reference implementation's build algorithm,
used as a DIFFERENTIAL oracle against this package's level-synchronous
device build (build.py). The reference C++ cannot be compiled in this
environment (vendored Eigen, no egress), so this module re-implements its
exact build semantics -- the greedy max-error-first priority queue, the
per-node h/p refinement decision, and the incremental polynomial fits --
in plain f64 numpy, following the reference line by line:

  * greedy loop + merge:        Source/HP/Octree.cpp:194-309
  * worker decision:            Source/HP/Octree.cpp:558-659
      refineP = degree < MAX-1 and (depth == MAX or pImp > hImp)
      refineH = depth < MAX and not refineP           (:598-601)
  * EstimateHImprovement eq (9) Source/HP/Octree.cpp:804-826
  * EstimatePImprovement eq (8) Source/HP/Octree.cpp:829-856
      (coarse nodes return the raw degree-2 fit error, hImp = 0)
  * FitPolynomial               Source/HP/Octree.cpp:1007-1093
      (4d+1)^3 tensor Gauss-Legendre projection; incremental coefficient
      reuse (:1011-1012); eq (6) error = sum of squared top-degree coeffs
  * nearness weighting          Source/HP/Octree.cpp:1209-1247
      (closed-form cell mean |c_000| * 2**(1.5*depth) replaces the
      reference's 100-sample Monte-Carlo estimate of the same quantity --
      the only deliberate deviation, noted in build.py as well)
  * UniformlyRefine             Source/HP/Octree.cpp:112-191
      coarse depth-4 stage, INITIAL_NODE_ERR = 100 per leaf (:171-177)
  * stop rule                   Source/HP/Octree.cpp:216
      totalCoeffError < threshold or queue empty, checked before each pop

The result converts to a regular Octree pytree so the differential tests
(tests/test_reference_oracle.py) compare the two BUILDS through the same
query/render serving path: any disagreement isolates the build schedule.

The oracle is deliberately slow (one fit per queue pop, no batching); use
small configs (depth <= 5, a few thousand nodes).
"""

from __future__ import annotations

import heapq
import itertools
import math
from typing import Callable

import numpy as np

from . import basis, consts
from .config import Config, NearnessWeighting
from .tree import Octree, pack

INITIAL_NODE_ERR = 100.0          # Source/HP/Octree.cpp:171-177


class _Nodes:
    """Growable host SoA of the oracle tree."""

    def __init__(self):
        self.child: list[int] = []
        self.centre: list[np.ndarray] = []
        self.depth: list[int] = []
        self.degree: list[int] = []
        self.coeffs: list[np.ndarray | None] = []

    def add(self, centre, depth) -> int:
        self.child.append(consts.NO_CHILD)
        self.centre.append(np.asarray(centre, np.float64))
        self.depth.append(int(depth))
        self.degree.append(consts.NO_BASIS)
        self.coeffs.append(None)
        return len(self.child) - 1

    def subdivide(self, i: int) -> int:
        """Block-allocate 8 children (Octree.cpp:1115-1128); returns the
        first child index. Child k offsets: x = bit0, y = bit1, z = bit2."""
        base = len(self.child)
        q = 2.0 ** -(self.depth[i] + 2.0)
        for k in range(8):
            sgn = np.array([(k & 1), (k >> 1) & 1, (k >> 2) & 1],
                           np.float64) * 2.0 - 1.0
            self.add(self.centre[i] + q * sgn, self.depth[i] + 1)
        self.child[i] = base
        return base


def _fit(F, centre, depth: int, degree: int,
         prev: np.ndarray | None, cfg: Config):
    """FitPolynomial (Octree.cpp:1007-1093): (4d+1)^3 tensor-product
    Gauss-Legendre projection onto the degree-``degree`` basis of the cell
    at ``centre``/``depth`` (internal unit-cube coords), reusing ``prev``
    coefficients bit-exactly (:1011-1012,1043). Returns (coeffs, err)."""
    Q = basis.fit_rule_size(degree)
    x, _ = basis.leggauss(Q)
    half = 2.0 ** -(depth + 1.0)
    gx = centre[0] + half * x
    gy = centre[1] + half * x
    gz = centre[2] + half * x
    px, py, pz = np.meshgrid(gx, gy, gz, indexing="ij")
    Fv = np.asarray(
        F(np.stack([px, py, pz], axis=-1).reshape(-1, 3)),
        np.float64).reshape(Q, Q, Q)

    A = basis.quadrature_matrix(degree)                     # (P+1, Q) w*L
    T = np.einsum("ijk,pi->pjk", Fv, A)
    T = np.einsum("pjk,qj->pqk", T, A)
    T = np.einsum("pqk,rk->pqr", T, A)
    idx = basis.basis_indices(degree)                       # (C, 3)
    raw = T[idx[:, 0], idx[:, 1], idx[:, 2]]
    coeffs = raw * basis.coeff_norms(degree)[depth] * half ** 3
    if prev is not None:
        coeffs[: prev.size] = prev                          # bit-exact reuse

    top = idx.sum(axis=1) == degree
    err = float(np.sum(coeffs[top] ** 2))                   # eq (6)

    nw = cfg.nearness_weighting
    if nw != NearnessWeighting.NONE:
        # exact cell mean of the approximation (see build.py._fit_impl)
        fbar = abs(coeffs[0]) * 2.0 ** (1.5 * depth)
        d3 = math.sqrt(3.0)
        if nw == NearnessWeighting.POLYNOMIAL:
            k = min(max((1.0 - fbar / d3) ** cfg.nearness_strength, 0.0), 1.0)
        else:
            k = math.exp(-cfg.nearness_strength * fbar / d3)
        err *= k
    return coeffs, err


def greedy_build(config: Config, F: Callable[[np.ndarray], np.ndarray],
                 max_pops: int = 200_000) -> Octree:
    """Build an octree with the reference's exact greedy serial schedule.

    ``F``: numpy callable, world points (K, 3) f64 -> (K,) f64.
    Returns a regular Octree pytree (tree.pack), queryable/renderable
    through the normal serving paths.
    """
    config.validate()
    rc = np.asarray(config.root_centre, np.float64)
    rs = np.asarray(config.root_sizes, np.float64)

    def F_int(pts):                       # domain normalization (:321-328)
        return F(pts * rs + rc)

    nd = _Nodes()
    nd.add(np.zeros(3), 0)
    # UniformlyRefine: full subdivision to the coarse depth (:112-191)
    frontier = [0]
    for _ in range(consts.COARSE_DEPTH):
        nxt = []
        for i in frontier:
            base = nd.subdivide(i)
            nxt.extend(range(base, base + 8))
        frontier = nxt

    heap: list[tuple[float, int, int]] = []      # (-err, seq, node)
    seq = itertools.count()
    for i in frontier:
        nd.degree[i] = 0                  # coarse marker (UniformlyRefine)
        heapq.heappush(heap, (-INITIAL_NODE_ERR, next(seq), i))
    total = len(frontier) * INITIAL_NODE_ERR

    max_deg, max_dep = config.max_degree, config.max_depth
    pops = 0
    # stop rule (:216): checked before each pop
    while total >= config.target_error and heap and pops < max_pops:
        pops += 1
        neg_err, _, i = heapq.heappop(heap)
        err = -neg_err
        d, dep = nd.degree[i], nd.depth[i]

        if err == INITIAL_NODE_ERR:
            # coarse node: degree-2 fit; pImp = raw fit error, hImp = 0
            # (EstimatePImprovement isCoarse branch, :829-843)
            c2, e2 = _fit(F_int, nd.centre[i], dep, consts.COARSE_DEGREE,
                          None, config)
            refine_p = d < max_deg - 1 and (dep == max_dep or e2 > 0.0)
            if refine_p:
                nd.coeffs[i] = c2
                nd.degree[i] = consts.COARSE_DEGREE
                total += e2 - err
                heapq.heappush(heap, (-e2, next(seq), i))
                continue
            # else fall through to the h path below with the coarse basis
            nd.coeffs[i] = c2
            nd.degree[i] = d = consts.COARSE_DEGREE

        # p candidate: incremental fit at degree d+1 (eq 8)
        p_ok = d < max_deg - 1
        p_imp = -np.inf
        pc = pe = None
        if p_ok:
            pc, pe = _fit(F_int, nd.centre[i], dep, d + 1, nd.coeffs[i],
                          config)
            cd, cd1 = consts.coeff_count(d), consts.coeff_count(d + 1)
            p_imp = (err - 8.0 * pe) / (cd1 - cd)

        # h candidate: 8 same-degree child fits (eq 9)
        h_imp = -np.inf
        h_fits = None
        if dep < max_dep:
            q = 2.0 ** -(dep + 2.0)
            h_fits = []
            max_child = 0.0
            for k in range(8):
                sgn = np.array([(k & 1), (k >> 1) & 1, (k >> 2) & 1],
                               np.float64) * 2.0 - 1.0
                ck, ek = _fit(F_int, nd.centre[i] + q * sgn, dep + 1, d,
                              None, config)
                h_fits.append((ck, ek))
                max_child = max(max_child, ek)
            h_imp = (err - 8.0 * max_child) / (7.0 * consts.coeff_count(d))

        refine_p = p_ok and (dep == max_dep or p_imp > h_imp)
        refine_h = dep < max_dep and not refine_p
        if refine_p:
            nd.coeffs[i] = pc
            nd.degree[i] = d + 1
            total += pe - err
            heapq.heappush(heap, (-pe, next(seq), i))
        elif refine_h:
            base = nd.subdivide(i)
            nd.degree[i] = consts.NO_BASIS          # interior (:262-279)
            nd.coeffs[i] = None
            total -= err
            for k in range(8):
                ck, ek = h_fits[k]
                nd.coeffs[base + k] = ck
                nd.degree[base + k] = d
                total += ek
                heapq.heappush(heap, (-ek, next(seq), base + k))
        # else: unrefinable node is dropped from the queue, its error
        # stays in the total (silent drop, Octree.cpp:643-655)

    # convert to the packed Octree layout
    return _to_octree(nd, config)


def _to_octree(nd: _Nodes, config: Config) -> Octree:
    n = len(nd.child)
    cw = consts.coeff_count(config.max_degree)
    child_idx = np.asarray(nd.child, np.int32)
    centre = np.stack(nd.centre)
    depth = np.asarray(nd.depth, np.int32)
    degree = np.asarray(nd.degree, np.int32)
    coeffs = np.zeros((n, cw), np.float64)
    for i, c in enumerate(nd.coeffs):
        if c is not None:
            coeffs[i, : c.size] = c
    return pack(child_idx, centre, depth, degree, coeffs, n, config)


# --------------------------------------------------------------------------
# Continuity oracle: brute-force assembly + scipy CG
# --------------------------------------------------------------------------

def _leaf_basis_at(centre, depth: int, degree: int, pts: np.ndarray):
    """Normalized basis functions of one leaf evaluated at unit-cube points:
    (len(pts), C). Mirrors FApprox's evaluation frame (Octree.cpp:859-901):
    local = (pt - centre) * 2**(depth+1), values = prod_axis L_p(local) *
    NormalisedLengths[p][depth]."""
    local = (pts - centre) * 2.0 ** (depth + 1.0)
    idx = basis.basis_indices(degree)
    L = basis.legendre_all_np(local.T, max(int(degree), 0))
    # L: (P+1, 3, N)
    nt = basis.norm_table()
    vals = (L[idx[:, 0], 0, :] * L[idx[:, 1], 1, :] * L[idx[:, 2], 2, :])
    norms = (nt[idx[:, 0], depth] * nt[idx[:, 1], depth]
             * nt[idx[:, 2], depth])
    return (vals * norms[:, None]).T                       # (N, C)


def scipy_continuity(tree: Octree, strength: float) -> Octree:
    """Reference-faithful continuity post-process, assembled by brute force
    and solved with scipy's CG -- an INDEPENDENT oracle for
    continuity.enforce_continuity.

    * adjacency: O(L^2) geometric test on leaf AABBs (no FaceProc
      recursion, no SharedFaceLookup tables)
    * entries: direct 2-D tensor Gauss-Legendre quadrature of
      integral_face (u_a - u_b)^2 dA per adjacent pair -- the jump Gram
      matrix M of PerformContinuityPostProcess (Octree.cpp:1717-1762)
    * solve: scipy.sparse CG on (M + s I) c = s c0, tol 1e-6, warm-started
      at c0 (Eigen CG settings, :1749-1755)
    """
    import scipy.sparse as sp
    import scipy.sparse.linalg as spla

    child = np.asarray(tree.child_idx)[: tree.n_nodes]
    centre = np.asarray(tree.centre)[: tree.n_nodes]
    depth = np.asarray(tree.depth)[: tree.n_nodes].astype(np.int64)
    degree = np.asarray(tree.degree)[: tree.n_nodes].astype(np.int64)
    coeffs = np.asarray(tree.coeffs)[: tree.n_nodes]

    leaves = np.flatnonzero((child < 0) & (degree >= 0))
    half = 2.0 ** -(depth + 1.0)

    # flat coefficient offsets, leaf order (ReallocCoeffs layout)
    widths = np.array([consts.coeff_count(int(degree[i])) for i in leaves])
    starts = np.concatenate([[0], np.cumsum(widths)])
    n_coeffs = int(starts[-1])
    offset = {int(i): int(starts[k]) for k, i in enumerate(leaves)}

    c0 = np.zeros(n_coeffs)
    for k, i in enumerate(leaves):
        c0[starts[k]: starts[k] + widths[k]] = coeffs[i, : widths[k]]

    # brute-force face adjacency, vectorized: for each axis, pairs (a, b)
    # with a's +dim face on b's -dim plane and strictly positive overlap
    # (no FaceProc recursion, no SharedFaceLookup -- an independent
    # geometric enumeration)
    rows, cols, vals = [], [], []
    eps = 1e-12
    ca, ha = centre[leaves], half[leaves]
    pairs = []
    for dim in range(3):
        plane_a = ca[:, dim] + ha                   # + face coordinate
        plane_b = ca[:, dim] - ha                   # - face coordinate
        touch = np.abs(plane_a[:, None] - plane_b[None, :]) <= eps
        t1, t2 = (dim + 1) % 3, (dim + 2) % 3
        for t in (t1, t2):
            lo = np.maximum((ca[:, t] - ha)[:, None],
                            (ca[:, t] - ha)[None, :])
            hi = np.minimum((ca[:, t] + ha)[:, None],
                            (ca[:, t] + ha)[None, :])
            touch &= (hi - lo) > eps
        ka, kb = np.nonzero(touch)
        pairs.extend((int(leaves[x]), int(leaves[y]), dim)
                     for x, y in zip(ka, kb))

    for ia, ib, dim in pairs:
        t1, t2 = (dim + 1) % 3, (dim + 2) % 3
        lo1 = max(centre[ia, t1] - half[ia], centre[ib, t1] - half[ib])
        hi1 = min(centre[ia, t1] + half[ia], centre[ib, t1] + half[ib])
        lo2 = max(centre[ia, t2] - half[ia], centre[ib, t2] - half[ib])
        hi2 = min(centre[ia, t2] + half[ia], centre[ib, t2] + half[ib])
        # 2-D tensor quadrature over the shared rectangle
        D = max(int(degree[ia]), int(degree[ib]))
        x, w = basis.leggauss(basis.face_rule_size(D))
        m1 = 0.5 * (lo1 + hi1) + 0.5 * (hi1 - lo1) * x
        m2 = 0.5 * (lo2 + hi2) + 0.5 * (hi2 - lo2) * x
        g1, g2 = np.meshgrid(m1, m2, indexing="ij")
        pts = np.zeros((g1.size, 3))
        pts[:, dim] = centre[ia, dim] + half[ia]
        pts[:, t1] = g1.ravel()
        pts[:, t2] = g2.ravel()
        ww = (np.outer(w, w).ravel()
              * (0.25 * (hi1 - lo1) * (hi2 - lo2)))
        Pa = _leaf_basis_at(centre[ia], int(depth[ia]),
                            int(degree[ia]), pts)
        Pb = _leaf_basis_at(centre[ib], int(depth[ib]),
                            int(degree[ib]), pts)
        G = np.concatenate([Pa, -Pb], axis=1)       # (N, Ca+Cb)
        blk = G.T @ (G * ww[:, None])
        off = np.concatenate(
            [offset[int(ia)] + np.arange(Pa.shape[1]),
             offset[int(ib)] + np.arange(Pb.shape[1])])
        rows.append(np.repeat(off, off.size))
        cols.append(np.tile(off, off.size))
        vals.append(blk.ravel())

    if rows:
        M = sp.coo_matrix(
            (np.concatenate(vals),
             (np.concatenate(rows), np.concatenate(cols))),
            shape=(n_coeffs, n_coeffs)).tocsr()
    else:
        M = sp.csr_matrix((n_coeffs, n_coeffs))
    A = M + strength * sp.identity(n_coeffs, format="csr")
    b = strength * c0
    sol, info = spla.cg(A, b, x0=c0, rtol=1e-6, maxiter=2000)
    assert info == 0, f"scipy CG did not converge (info={info})"

    new_coeffs = np.array(np.asarray(tree.coeffs))
    for k, i in enumerate(leaves):
        new_coeffs[i, : widths[k]] = sol[starts[k]: starts[k] + widths[k]]
    return pack(np.asarray(tree.child_idx), np.asarray(tree.centre),
                np.asarray(tree.depth), np.asarray(tree.degree),
                new_coeffs, tree.n_nodes, tree.config)
