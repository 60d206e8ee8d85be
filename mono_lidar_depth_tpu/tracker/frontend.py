"""Stateful tracking frontend: persistent track ids over a KLT stream.

Produces exactly the interface the tracklet-depth pipeline consumes
(ids / uv_new / uv_prev / valid per frame) — the role the external viso
tracker plays for the reference.  A track is emitted once it has been
observed in >= 2 consecutive frames, matching the reference's
assumption that incoming tracklets always carry at least two feature
points for unseen ids (tracklet_depth_module.cpp:36-46).

Lane model: a fixed [N] array of track lanes.  Lanes whose feature is
lost are freed and immediately replenished with fresh detections (one
per spatial cell, harris.detect_features); new lanes get sequential ids
from a device counter.  Everything jits; the pyramid lives in the state
pytree so consecutive frames reuse it.
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp
from ..precision import f32_matmuls

from .harris import detect_features
from .klt import build_pyramid, track_features


class TrackerState(NamedTuple):
    pyramid: tuple  # previous frame pyramid (tuple of [H/2^l, W/2^l])
    uv: jnp.ndarray  # [N, 2] lane position in the previous frame
    ids: jnp.ndarray  # [N] int32 track id (-1 free)
    age: jnp.ndarray  # [N] frames observed
    valid: jnp.ndarray  # [N]
    next_id: jnp.ndarray  # scalar int32
    flow: jnp.ndarray  # [N, 2] last frame's image flow (motion prior)


class TrackerOutput(NamedTuple):
    ids: jnp.ndarray  # [N]
    valid: jnp.ndarray  # [N] emit mask (age >= 2 this frame)
    uv_new: jnp.ndarray  # [N, 2] position in the current frame
    uv_prev: jnp.ndarray  # [N, 2] position in the previous frame


@f32_matmuls
def init_tracker(img: jnp.ndarray, max_features: int, levels: int = 3,
                 cell_size: int = 16) -> TrackerState:
    pyr = tuple(build_pyramid(img, levels))
    uv, ok = detect_features(img, max_features, cell_size=cell_size)
    ids = jnp.where(ok, jnp.arange(max_features, dtype=jnp.int32), -1)
    return TrackerState(
        pyramid=pyr, uv=uv, ids=ids,
        age=jnp.where(ok, 1, 0).astype(jnp.int32),
        valid=ok, next_id=jnp.int32(max_features),
        flow=jnp.zeros((max_features, 2), jnp.float32))


@partial(jax.jit, static_argnames=("cell_size", "patch", "iters"))
@f32_matmuls
def track_frame(state: TrackerState, img: jnp.ndarray,
                cell_size: int = 16, patch: int = 9, iters: int = 8
                ) -> tuple[TrackerState, TrackerOutput]:
    """Advance the tracker by one frame."""
    N = state.uv.shape[0]
    pyr_next = tuple(build_pyramid(img, len(state.pyramid)))
    # constant-velocity warm start: last frame's flow (plus the median
    # flow for lanes with no history — fresh detections during fast
    # motion inherit the camera's dominant image motion)
    has_hist = state.valid & (jnp.sum(jnp.abs(state.flow), axis=1) > 0)
    med_flow = jnp.nanmedian(
        jnp.where(has_hist[:, None], state.flow, jnp.nan), axis=0)
    med_flow = jnp.nan_to_num(med_flow)
    lane_flow = jnp.where(has_hist[:, None], state.flow, med_flow[None, :])
    uv_t, ok = track_features(state.pyramid, pyr_next, state.uv, state.valid,
                              patch=patch, iters=iters,
                              uv_guess=state.uv + lane_flow)
    survived = ok & state.valid

    # Replenish: detect in cells not already occupied by survivors.
    det_uv, det_ok = detect_features(
        img, N, cell_size=cell_size,
        occupied_uv=uv_t, occupied_valid=survived)

    # Allocate detections (in detection order) to free lanes (in lane
    # order) — same rank-matching scheme as tracks.table.update_tracks.
    free = ~survived
    free_rank = jnp.cumsum(free.astype(jnp.int32)) - 1
    free_list = jnp.full((N,), -1, jnp.int32).at[
        jnp.where(free, free_rank, N)].set(
        jnp.arange(N, dtype=jnp.int32), mode="drop")
    det_rank = jnp.cumsum(det_ok.astype(jnp.int32)) - 1
    num_free = jnp.sum(free.astype(jnp.int32))
    alloc = det_ok & (det_rank < num_free)
    lane = jnp.where(alloc, free_list[jnp.clip(det_rank, 0, N - 1)], N)

    uv_out = jnp.where(survived[:, None], uv_t, 0.0)
    uv_out = uv_out.at[lane].set(det_uv, mode="drop")
    new_ids = state.next_id + det_rank
    ids = jnp.where(survived, state.ids, -1)
    ids = ids.at[lane].set(new_ids, mode="drop")
    age = jnp.where(survived, state.age + 1, 0)
    age = age.at[lane].set(1, mode="drop")
    valid = survived
    valid = valid.at[lane].set(True, mode="drop")
    next_id = state.next_id + jnp.sum(alloc.astype(jnp.int32))

    out = TrackerOutput(
        ids=state.ids,
        valid=survived & (age >= 2),
        uv_new=uv_t,
        uv_prev=state.uv,
    )
    flow = jnp.where(survived[:, None], uv_t - state.uv, 0.0)
    flow = flow.at[lane].set(0.0, mode="drop")  # fresh lanes: no history
    new_state = TrackerState(pyramid=pyr_next, uv=uv_out, ids=ids,
                             age=age, valid=valid, next_id=next_id,
                             flow=flow)
    return new_state, out
