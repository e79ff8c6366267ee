"""Batched parallel SLAM over many sequences (data parallel).

BASELINE.json config 5: "batched parallel SLAM over many videos +
500-marker synthetic map". Independent sequences are pure data
parallelism: the fused MEKF scan is vmapped over a leading sequence
axis and the batch is sharded over the mesh — XLA runs each shard on
its device with zero cross-device traffic during filtering.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from aruco_slam_tpu.filters import (
    FrameObservations, MekfConfig, MekfState, mekf_scan)


@functools.partial(jax.jit, static_argnums=0)
def _vmapped_scan(cfg: MekfConfig, states: MekfState,
                  obs: FrameObservations):
    return jax.vmap(lambda s, o: mekf_scan(cfg, s, o))(states, obs)


def batched_mekf_scan(cfg: MekfConfig, states: MekfState,
                      obs: FrameObservations, mesh: Mesh | None = None,
                      axis: str | None = None):
    """Run S independent MEKF sequences at once.

    ``states``: MekfState with leading axis S (stack of init_state
    results); ``obs``: FrameObservations with leading axes (S, T, ...).
    With a mesh, the S axis is sharded across devices.
    Returns (final states (S, ...), trajectories (S, T, 7)).
    """
    if mesh is not None:
        shard = NamedSharding(mesh, P(axis or mesh.axis_names[0]))
        states = jax.device_put(states, shard)
        obs = jax.device_put(obs, shard)
    return _vmapped_scan(cfg, states, obs)


def stack_states(states: list[MekfState]) -> MekfState:
    return jax.tree.map(lambda *xs: jnp.stack(xs), *states)


@functools.partial(jax.jit, static_argnums=(0, 1, 3))
def _vmapped_image_pipeline(dcfg, fcfg: MekfConfig, cam,
                            marker_size: float, images: jnp.ndarray,
                            states: MekfState):
    from aruco_slam_tpu.ops import detect, pnp

    def one(ims, state):
        det = detect.detect_markers_batch(ims, dcfg)
        res = pnp.solve_square_pnp(cam, det.corners, marker_size)
        obs = FrameObservations(
            t_cl=res.t_cl, q_cl=res.q_cl,
            mask=det.mask & (res.err < 3.0))
        return mekf_scan(fcfg, state, obs)

    return jax.vmap(one)(images, states)


def batched_image_slam(dcfg, fcfg: MekfConfig, cam,
                       marker_size: float, images: jnp.ndarray,
                       states: MekfState, mesh: Mesh | None = None,
                       axis: str | None = None):
    """The FULL image->pose pipeline (detection + IPPE PnP + fused
    MEKF) over S independent video streams at once — BASELINE config 5
    end to end from pixels, not from pre-extracted observations.

    ``images``: (S, T, H, W) grayscale; ``states``: MekfState stacked
    over S. With a mesh the stream axis is sharded across devices —
    streams are independent, so filtering runs with zero cross-device
    traffic and scaling is linear in devices (camera intrinsics and
    detector tables are replicated by XLA).
    Returns (final states (S, ...), trajectories (S, T, 7)).

    Size ``fcfg.max_obs`` to the densest frame you expect: frames
    observing more slots drop the extras, counted per stream in the
    returned ``states.dropped_obs`` — check it after a run (the
    run_slam driver auto-sizes max_obs from the data; this library
    path cannot, since the observation density is only known after
    detection).
    """
    if mesh is not None:
        shard = NamedSharding(mesh, P(axis or mesh.axis_names[0]))
        images = jax.device_put(images, shard)
        states = jax.device_put(states, shard)
    return _vmapped_image_pipeline(dcfg, fcfg, cam, marker_size,
                                   images, states)
