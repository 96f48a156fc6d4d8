import jax
import jax.numpy as jnp
import numpy as np

from laser_slam_tpu.core import se2
from laser_slam_tpu.graph.solve import (
    PoseGraph,
    chi2,
    edge_jacobians,
    edge_residuals,
    optimize,
)


def build_graph(poses, edges, meas, info_scale=50.0):
    v = len(poses)
    e = len(edges)
    i = jnp.asarray([a for a, _ in edges], jnp.int32)
    j = jnp.asarray([b for _, b in edges], jnp.int32)
    return PoseGraph(
        poses=jnp.asarray(poses, jnp.float32),
        v_active=jnp.ones(v, bool),
        i=i,
        j=j,
        meas=jnp.asarray(meas, jnp.float32),
        info=jnp.tile(jnp.eye(3) * info_scale, (e, 1, 1)).astype(jnp.float32),
        e_active=jnp.ones(e, bool),
    )


def test_residual_zero_at_truth():
    poses = [[0, 0, 0], [1, 0, 0.5], [1.5, 1.0, 1.2]]
    edges = [(0, 1), (1, 2)]
    meas = [
        np.asarray(se2.relative(jnp.asarray(poses[a], jnp.float32),
                                jnp.asarray(poses[b], jnp.float32)))
        for a, b in edges
    ]
    g = build_graph(poses, edges, meas)
    r = edge_residuals(g)
    assert np.allclose(np.asarray(r), 0.0, atol=1e-6)


def test_jacobians_match_autodiff():
    rng = np.random.default_rng(0)
    poses = rng.normal(size=(4, 3)).astype(np.float32)
    edges = [(0, 1), (1, 2), (2, 3), (0, 3)]
    meas = rng.normal(size=(4, 3)).astype(np.float32)
    g = build_graph(poses, edges, meas)
    Ji, Jj = edge_jacobians(g)

    def res_fn(flat):
        g2 = g._replace(poses=flat.reshape(4, 3))
        return edge_residuals(g2)

    J_full = jax.jacobian(res_fn)(g.poses.reshape(-1))  # [E, 3, 12]
    J_full = np.asarray(J_full).reshape(4, 3, 4, 3)
    for e, (a, b) in enumerate(edges):
        assert np.allclose(np.asarray(Ji)[e], J_full[e, :, a], atol=1e-4), e
        assert np.allclose(np.asarray(Jj)[e], J_full[e, :, b], atol=1e-4), e


def test_optimize_recovers_noisy_chain():
    # Ground-truth square loop; odometry edges noisy, loop edge exact.
    rng = np.random.default_rng(1)
    gt = np.array(
        [[0, 0, 0], [2, 0, np.pi / 2], [2, 2, np.pi], [0, 2, -np.pi / 2]],
        dtype=np.float32,
    )
    edges = [(0, 1), (1, 2), (2, 3), (3, 0)]
    meas = [
        np.asarray(
            se2.relative(jnp.asarray(gt[a]), jnp.asarray(gt[b]))
        )
        for a, b in edges
    ]
    # Perturb initial poses (except the anchor).
    init = gt.copy()
    init[1:] += rng.normal(0, 0.3, size=(3, 3)).astype(np.float32)
    g = build_graph(init, edges, meas)
    chi_before = float(chi2(g))
    g_opt, chi_after = jax.jit(optimize)(g)
    assert float(chi_after) < 1e-3
    assert float(chi_after) < chi_before
    out = np.asarray(g_opt.poses)
    # Anchor stays put; others converge to GT.
    assert np.allclose(out[0], gt[0], atol=1e-3)
    assert np.allclose(out[1:, :2], gt[1:, :2], atol=1e-2)
    ang_err = np.abs(np.asarray(se2.normalize_angle(jnp.asarray(out[:, 2] - gt[:, 2]))))
    assert ang_err.max() < 1e-2


def test_optimize_pulls_loop_closure():
    # Drifted chain + loop closure back to start: optimization distributes
    # the error (the reference's addMapNodeCov → optimizeGraph behavior).
    n = 12
    gt = np.zeros((n, 3), dtype=np.float32)
    for k in range(1, n):
        gt[k] = np.asarray(
            se2.compose(jnp.asarray(gt[k - 1]), jnp.asarray([1.0, 0.0, np.pi / 6]))
        )
    rng = np.random.default_rng(2)
    edges = [(k, k + 1) for k in range(n - 1)]
    meas = []
    for a, b in edges:
        true_rel = np.asarray(se2.relative(jnp.asarray(gt[a]), jnp.asarray(gt[b])))
        meas.append(true_rel + rng.normal(0, 0.03, 3).astype(np.float32))
    # integrate noisy odometry for the initial guess
    init = np.zeros_like(gt)
    for k, (a, b) in enumerate(edges):
        init[b] = np.asarray(se2.compose(jnp.asarray(init[a]), jnp.asarray(meas[k])))
    # exact loop edge n-1 → 0
    edges.append((n - 1, 0))
    meas.append(np.asarray(se2.relative(jnp.asarray(gt[n - 1]), jnp.asarray(gt[0]))))
    g = build_graph(init, edges, meas)
    g_opt, _ = jax.jit(optimize)(g)
    out = np.asarray(g_opt.poses)
    err_before = np.linalg.norm(init[:, :2] - gt[:, :2], axis=1).max()
    err_after = np.linalg.norm(out[:, :2] - gt[:, :2], axis=1).max()
    assert err_after < err_before * 0.7


def test_inactive_slots_ignored():
    # Preallocated capacity: extra vertices/edges masked out must not
    # affect the solution.
    gt = np.array([[0, 0, 0], [1, 0, 0]], dtype=np.float32)
    g = PoseGraph(
        poses=jnp.asarray(np.vstack([gt, np.full((2, 3), 777.0)]), jnp.float32),
        v_active=jnp.asarray([True, True, False, False]),
        i=jnp.asarray([0, 2], jnp.int32),
        j=jnp.asarray([1, 3], jnp.int32),
        meas=jnp.asarray([[1.1, 0, 0], [5, 5, 1]], jnp.float32),
        info=jnp.tile(jnp.eye(3) * 10, (2, 1, 1)).astype(jnp.float32),
        e_active=jnp.asarray([True, False]),
    )
    g_opt, chi = optimize(g)
    out = np.asarray(g_opt.poses)
    assert np.allclose(out[1], [1.1, 0, 0], atol=1e-3)
    assert np.allclose(out[2:], 777.0)  # untouched


def test_cg_matches_dense_solver():
    # CG and dense Cholesky must agree on a modest noisy chain + loop.
    from laser_slam_tpu.graph.solve import _cg_solve_normal, _solve_normal

    rng = np.random.default_rng(3)
    n = 40
    gt = np.stack(
        [np.linspace(0, 10, n), np.sin(np.linspace(0, 3, n)),
         np.zeros(n)], axis=1
    ).astype(np.float32)
    edges = [(k, k + 1) for k in range(n - 1)] + [(0, n - 1)]
    meas = [
        np.asarray(se2.relative(jnp.asarray(gt[a]), jnp.asarray(gt[b])))
        + rng.normal(0, 0.01, 3).astype(np.float32)
        for a, b in edges
    ]
    init = gt + rng.normal(0, 0.3, gt.shape).astype(np.float32)
    init[0] = gt[0]
    g = build_graph(init, edges, meas)
    lam = jnp.asarray(1e-3, jnp.float32)
    dx_chol, _ = _solve_normal(g, lam)
    dx_cg, _ = _cg_solve_normal(g, lam, cg_iters=300, tol=1e-9)
    np.testing.assert_allclose(
        np.asarray(dx_cg), np.asarray(dx_chol), rtol=1e-3, atol=1e-4
    )


def test_cg_large_chain_2k_vertices():
    # The large-V path the dense factor can't afford: a 2000-vertex
    # noisy chain with loop edges every 200 vertices; optimize() must
    # auto-select CG and reduce the error.
    rng = np.random.default_rng(7)
    n = 2000
    t = np.linspace(0, 4 * np.pi, n)
    gt = np.stack(
        [10 * np.cos(t), 10 * np.sin(t), np.zeros(n)], axis=1
    ).astype(np.float32)
    edges = [(k, k + 1) for k in range(n - 1)]
    meas = [
        np.asarray(se2.relative(jnp.asarray(gt[a]), jnp.asarray(gt[b])))
        + rng.normal(0, 0.005, 3).astype(np.float32)
        for a, b in edges
    ]
    init = [gt[0]]
    for m in meas:
        init.append(np.asarray(se2.compose(jnp.asarray(init[-1]), jnp.asarray(m))))
    init = np.asarray(init, np.float32)
    # exact loop closures between the two laps
    half = n // 2
    for k in range(50, half, 100):
        edges.append((k, k + half))
        meas.append(
            np.asarray(se2.relative(jnp.asarray(gt[k]), jnp.asarray(gt[k + half])))
        )
    g = build_graph(init, edges, meas)
    g_opt, _ = optimize(g, 25)  # auto → CG at V=2000
    err_before = np.linalg.norm(init[:, :2] - gt[:, :2], axis=1).mean()
    err_after = np.linalg.norm(
        np.asarray(g_opt.poses)[:, :2] - gt[:, :2], axis=1
    ).mean()
    assert err_after < err_before * 0.5
