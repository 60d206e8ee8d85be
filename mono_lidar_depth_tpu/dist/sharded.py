"""Sharded execution: frame-parallel depth association and
landmark-sharded distributed bundle adjustment.

Both are GSPMD programs over a named Mesh (mesh.py): XLA inserts the
collectives; the only explicit communication is the psum of the reduced
camera system inside the distributed Schur iteration
(vo.ba.ba_iteration with axis_name), which rides ICI within a slice.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax import shard_map
from jax.sharding import NamedSharding, PartitionSpec as P

from ..core.depth_estimator import estimate_depths
from ..core.ransac import fit_ground_plane_ransac
from ..vo.ba import BAProblem, BAResult, ba_cost, ba_iteration
from ..vo.pose_graph import PoseGraph, optimize_pose_graph
from .mesh import FRAME_AXIS, LANDMARK_AXIS


def sharded_depth_association(cfg, camera, lidar_to_cam, mesh):
    """Build a jitted frame-batch depth-association step whose batch
    axis is sharded over the mesh's frame axis.

    Returns fn(clouds [B,P,3], cvalids, feats [B,N,2], fvalids, keys)
    → (depths [B,N], codes [B,N], counters [21] — psum'd across the
    batch).  B must be divisible by the frame-axis size.
    """
    fsh = NamedSharding(mesh, P(FRAME_AXIS))

    @jax.jit
    def step(clouds, cvalids, feats, fvalids, keys):
        clouds = jax.lax.with_sharding_constraint(clouds, fsh)
        feats = jax.lax.with_sharding_constraint(feats, fsh)

        def per_frame(cloud, cvalid, uv, uvv, key):
            gp = fit_ground_plane_ransac(
                cloud, cvalid, key,
                distance_threshold=cfg.ransac_plane_distance_treshold,
                num_hypotheses=cfg.ransac_num_hypotheses,
                subsample=cfg.ransac_subsample_points,
                use_refinement=cfg.ransac_plane_use_refinement,
                refinement_threshold=cfg.ransac_plane_refinement_treshold)
            out = estimate_depths(cfg, camera, lidar_to_cam, cloud, cvalid,
                                  uv, uvv, gp)
            return out.depths, out.codes, out.counters

        depths, codes, counters = jax.vmap(per_frame)(
            clouds, cvalids, feats, fvalids, keys)
        return depths, codes, jnp.sum(counters, axis=0)

    return step


def distributed_ba(camera, mesh, iters: int = 8, huber_px: float = 2.0,
                   depth_weight: float = 1.0, huber_depth: float = 0.5,
                   damping: float = 1e-4):
    """Build a landmark-sharded BA solver over `mesh`'s landmark axis.

    The returned fn(problem) runs the same Gauss-Newton/Schur algorithm
    as vo.ba.run_ba, but with the landmark dimension L split across
    devices: each device assembles Hll/Hpl/W for its shard, the
    [K,K,6,6] reduced camera system is psum'd, the (tiny) solve is
    replicated, and landmark updates stay local.  L must be divisible
    by the landmark-axis size.

    Problem leaves with a landmark dimension: landmarks [L,3],
    obs_uv [K,L,2], obs_mask, depth_prior, depth_mask, lm_valid.
    Pose leaves (R, t, fixed) are replicated.
    """
    lm1 = P(LANDMARK_AXIS)
    specs = BAProblem(
        R=P(), t=P(), landmarks=lm1,
        obs_uv=P(None, LANDMARK_AXIS), obs_mask=P(None, LANDMARK_AXIS),
        depth_prior=P(None, LANDMARK_AXIS),
        depth_mask=P(None, LANDMARK_AXIS),
        fixed=P(), lm_valid=lm1)

    @partial(shard_map, mesh=mesh, in_specs=(specs,),
             out_specs=BAResult(problem=specs, initial_cost=P(),
                                final_cost=P()),
             check_vma=False)
    def solve(problem: BAProblem) -> BAResult:
        def iteration(_, pb):
            return ba_iteration(camera, pb, huber_px, depth_weight,
                                huber_depth, damping,
                                axis_name=LANDMARK_AXIS)

        c0 = ba_cost(camera, problem, huber_px, depth_weight, huber_depth,
                     axis_name=LANDMARK_AXIS)
        out = jax.lax.fori_loop(0, iters, iteration, problem)
        c1 = ba_cost(camera, out, huber_px, depth_weight, huber_depth,
                     axis_name=LANDMARK_AXIS)
        return BAResult(problem=out, initial_cost=c0, final_cost=c1)

    return jax.jit(solve)


def distributed_pose_graph(mesh, gn_iters: int = 8, cg_iters: int = 60,
                           huber: float = 0.5, damping: float = 1e-6,
                           axis: str = FRAME_AXIS):
    """Build an edge-sharded pose-graph solver over `mesh`'s `axis`.

    The returned fn(graph) runs the same Gauss-Newton/CG algorithm as
    vo.pose_graph.optimize_pose_graph, but with the EDGE list split
    across devices: each device linearizes its edge shard (autodiff
    Jacobians included), and the per-pose gradient / CG-matvec
    scatter-adds are psum'd over the axis — O(N·6) communication per CG
    step, the "distributed map blocks" of BASELINE.json config 4.
    Poses (R, t, fixed) are replicated; E must be divisible by the axis
    size (pad with edge_valid=False edges pointing at pose 0).

    Verified equal to the single-device solver at KITTI scale
    (N≈4500 poses) on the virtual 8-device mesh (tests/test_dist.py).
    """
    esh = P(axis)
    specs = PoseGraph(
        R=P(), t=P(),
        edge_i=esh, edge_j=esh, Z_R=esh, Z_t=esh,
        edge_weight=esh, edge_valid=esh, fixed=P())

    @partial(shard_map, mesh=mesh, in_specs=(specs,), out_specs=specs,
             check_vma=False)
    def solve(graph: PoseGraph) -> PoseGraph:
        return optimize_pose_graph(graph, gn_iters=gn_iters,
                                   cg_iters=cg_iters, huber=huber,
                                   damping=damping, axis_name=axis)

    return jax.jit(solve)
