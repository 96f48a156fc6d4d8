"""Distributed SLAM compute: sharded matching + distributed graph solve.

Replaces the reference's TCP client/server split (SURVEY §3.3; frontends
on separate machines, one backend) with SPMD:

- :func:`sharded_batch_match` — loop-candidate verification and particle
  scoring are embarrassingly parallel over pairs; shard the pair batch
  over the mesh's data axis and let each chip run its slice of the
  vmapped matcher (the reference verifies candidates serially,
  MapGraph.cpp:1342-1433).

- :func:`distributed_gn_step` — pose-graph Gauss-Newton with edges
  sharded across chips: each chip computes its edges' residuals,
  Jacobians and normal-equation contributions, XLA all-reduces the
  assembled ``H``/``b`` (the scatter-add from sharded edge indices into
  the replicated dense system lowers to psum over ICI), and every chip
  solves the small reduced system redundantly — the standard trick when
  V is small (submap graphs are ~N/10, MapGraph.cpp:725).

Everything is expressed with ``jit`` + ``NamedSharding`` constraints so
the same program runs single-chip, on a virtual CPU mesh, or on a pod
slice; no hand-written collectives.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..core.scan import LaserModel, Scan
from ..graph.solve import PoseGraph, assemble_normal_system, optimize
from ..ops.icp import match_icp
from ..ops.plicp import match_plicp
from ..ops.psm import MatchResult, match_psm
from .mesh import DATA_AXIS

MATCHERS = {"psm": match_psm, "icp": match_icp, "plicp": match_plicp}


def sharded_batch_match(
    mesh: Mesh,
    model: LaserModel,
    ref_batch: Scan,
    cur_batch: Scan,
    init_poses: jnp.ndarray | None = None,
    matcher: str = "psm",
):
    """Match ``B`` scan pairs with the batch sharded across the mesh.

    ``B`` must be divisible by the mesh size (use
    :func:`..parallel.mesh.pad_to_multiple`).
    """
    fn = MATCHERS[matcher]
    shard = NamedSharding(mesh, P(DATA_AXIS))

    if init_poses is None:
        init_poses = jnp.zeros((cur_batch.ranges.shape[0], 3), cur_batch.ranges.dtype)

    @partial(jax.jit, out_shardings=shard)
    def run(ref_b, cur_b, init_b):
        ref_b = jax.lax.with_sharding_constraint(ref_b, shard)
        cur_b = jax.lax.with_sharding_constraint(cur_b, shard)
        return jax.vmap(lambda r, c, p: fn(model, r, c, p))(ref_b, cur_b, init_b)

    return run(ref_batch, cur_batch, init_poses)


def distributed_optimize(mesh: Mesh, graph: PoseGraph, max_iters: int = 20):
    """Pose-graph optimization with edge arrays sharded over the mesh and
    poses replicated; the dense normal system is psum-assembled by XLA."""
    edge_shard = NamedSharding(mesh, P(DATA_AXIS))
    repl = NamedSharding(mesh, P())

    def place(g: PoseGraph) -> PoseGraph:
        return PoseGraph(
            poses=jax.device_put(g.poses, repl),
            v_active=jax.device_put(g.v_active, repl),
            i=jax.device_put(g.i, edge_shard),
            j=jax.device_put(g.j, edge_shard),
            meas=jax.device_put(g.meas, edge_shard),
            info=jax.device_put(g.info, edge_shard),
            e_active=jax.device_put(g.e_active, edge_shard),
        )

    @partial(jax.jit, static_argnums=1)
    def run(g, iters):
        return optimize(g, iters)

    return run(place(graph), max_iters)


def training_step(
    mesh: Mesh,
    model: LaserModel,
    ref_batch: Scan,
    cur_batch: Scan,
    graph: PoseGraph,
):
    """One full distributed SLAM backend step, jitted end to end:
    sharded loop-candidate verification → edge measurement update →
    distributed graph solve. This is the framework's "training step"
    analog used by the multi-chip dry run.
    """
    shard = NamedSharding(mesh, P(DATA_AXIS))
    repl = NamedSharding(mesh, P())

    @jax.jit
    def step(ref_b: Scan, cur_b: Scan, g: PoseGraph):
        ref_b = jax.lax.with_sharding_constraint(ref_b, shard)
        cur_b = jax.lax.with_sharding_constraint(cur_b, shard)
        res: MatchResult = jax.vmap(lambda r, c: match_psm(model, r, c))(ref_b, cur_b)
        # Refresh the first B loop-edge measurements with verified matches
        # (the dry-run graph is laid out so edges [0, B) are loop edges).
        b = res.pose.shape[0]
        meas = g.meas.at[:b].set(
            jnp.where(res.fail[:, None], g.meas[:b], res.pose)
        )
        g = g._replace(meas=jax.lax.with_sharding_constraint(meas, shard))
        g_opt, chi = optimize(g, 5)
        return (
            jax.lax.with_sharding_constraint(g_opt.poses, repl),
            chi,
            res.fail,
        )

    return step(ref_batch, cur_batch, graph)
