"""Offline two-pass SLAM driver (batch smoothing).

TPU-native equivalent of the reference's main/run_offline.py: pass 1
ingests every frame into the factor graph, then a full-batch LM solve
smooths the whole trajectory; pass 2 replays for outputs using the
smoothed per-iteration estimates (reference main/run_offline.py:86-142,
filters/factor_graph.py:327-345).

    python -m aruco_slam_tpu.apps.run_offline --input seq.npz

Distributed modes (the reference is single-threaded; this is the
product surface of parallel/dist.py + parallel/sharded_ba.py):

    # one machine, N OS processes joined over Gloo/ICI — the solve
    # runs landmark-sharded over the global mesh, process 0 writes
    python -m aruco_slam_tpu.apps.run_offline --input seq.npz \
        --processes 2 --local-devices 2 --platform cpu

    # TPU pod: the pod runtime starts one process per host; each
    # calls this with --distributed (jax.distributed autodetects)
    python -m aruco_slam_tpu.apps.run_offline --input seq.npz \
        --distributed

    # fleet of sequences on a 2-D ('data','kf') mesh: each sequence's
    # landmarks shard over kf, sequences are data-parallel
    python -m aruco_slam_tpu.apps.run_offline \
        --input a.npz,b.npz,c.npz,d.npz --fleet 4x2
"""

from __future__ import annotations

import argparse
import time

import numpy as np
import jax
import jax.numpy as jnp

from aruco_slam_tpu.config import SlamAppConfig
from aruco_slam_tpu.graph import (
    GraphConfig, add_frame, batch_optimize, init_graph,
    landmark_covariances, optimize_window)
from aruco_slam_tpu.io import TrajectoryWriter, save_map
from aruco_slam_tpu.io.sources import NpzSource
from aruco_slam_tpu.apps.run_slam import (
    load_observations, load_video_observations)
from aruco_slam_tpu.io.sources import is_video


def main(argv=None) -> None:
    p = argparse.ArgumentParser(
        description="Offline two-pass marker SLAM (batch smoothing)")
    p.add_argument("--input", required=True)
    p.add_argument("--platform", default=None,
                   help="JAX platform override (cpu | axon | tpu)")
    p.add_argument("--trajectory", default="outputs/trajectory.txt")
    p.add_argument("--map", dest="map_file", default="outputs/map.txt")
    p.add_argument("--iters", type=int, default=50)
    p.add_argument("--calib", default=None,
                   help="directory with camera_matrix.npy + "
                        "dist_coeffs.npy (video input)")
    p.add_argument("--ba-rotations", action="store_true",
                   help="6-dof landmarks: smooth marker ORIENTATIONS "
                        "too (graph/ba.py with_rotations; map records "
                        "gain quaternion columns like the reference's "
                        "rotation filter, reference "
                        "filters/ekf_with_rotations.py:33-40)")
    p.add_argument("--viz-2d", action="store_true",
                   help="pass-2 replay through the 2D overlay with the "
                        "smoothed poses (reference "
                        "main/run_offline.py:124-142)")
    p.add_argument("--viz-3d", action="store_true")
    p.add_argument("--viz-dir", default="outputs/images")
    p.add_argument("--export-video", action="store_true")
    dflt = SlamAppConfig(input="")
    p.add_argument("--meas-sigma-t", type=float, default=dflt.meas_sigma_t)
    p.add_argument("--odom-sigma-t", type=float, default=dflt.odom_sigma_t)
    p.add_argument("--odom-sigma-rot", type=float,
                   default=dflt.odom_sigma_rot)
    p.add_argument("--track-every", type=int, default=dflt.track_every,
                   metavar="K",
                   help="streaming detection for image/video input "
                        "(see run_slam --track-every); 0 = full "
                        "detection every frame")
    p.add_argument("--detector", default=dflt.detector,
                   choices=["robust", "fast"],
                   help="full-sweep preset (see run_slam --detector)")
    p.add_argument("--profile", default=None, metavar="DIR",
                   help="write a jax.profiler device trace of the "
                        "solve to DIR (view with XProf/TensorBoard)")
    p.add_argument("--checkpoint-every", type=int, default=0,
                   metavar="N",
                   help="persist the graph + ingest index every N "
                        "pass-1 frames (0 = off); a killed run "
                        "resumes instead of re-ingesting everything")
    p.add_argument("--checkpoint", default="outputs/checkpoint.npz",
                   help="checkpoint file path")
    p.add_argument("--resume", default=None,
                   help="resume pass 1 from a checkpoint (bit-exact, "
                        "tests/test_io_apps.py); a checkpoint taken "
                        "after ingest completed skips straight to the "
                        "batch solve")
    args = p.parse_args(argv)
    if args.track_every and args.track_every < 3:
        p.error("--track-every needs K >= 3")
    if args.platform:
        jax.config.update("jax_platforms", args.platform)

    cfg = SlamAppConfig(input=args.input,
                        trajectory_file=args.trajectory,
                        map_file=args.map_file, batch_iters=args.iters,
                        meas_sigma_t=args.meas_sigma_t,
                        odom_sigma_t=args.odom_sigma_t,
                        odom_sigma_rot=args.odom_sigma_rot,
                        viz_2d=args.viz_2d, viz_3d=args.viz_3d,
                        viz_dir=args.viz_dir,
                        export_video=args.export_video,
                        track_every=args.track_every,
                        detector=args.detector)
    if is_video(cfg.input):
        src = None
        times, t_cl, q_cl, mask, cam, _amb, slot_ids = \
            load_video_observations(cfg, args.calib)
    else:
        src = NpzSource(cfg.input)
        times, t_cl, q_cl, mask, cam, _amb, slot_ids = \
            load_observations(src, cfg)

    t = len(times)
    gcfg = GraphConfig(max_poses=t + 2, max_landmarks=t_cl.shape[1],
                       max_factors=int(mask.sum()) + 8,
                       pixel_sigma=cfg.pixel_sigma,
                       focal_px=float(cam.fx),
                       marker_size=cfg.marker_size,
                       huber_delta=cfg.huber_delta,
                       meas_sigma_t=cfg.meas_sigma_t,
                       odom_sigma_t=cfg.odom_sigma_t,
                       odom_sigma_rot=cfg.odom_sigma_rot,
                       with_rotations=args.ba_rotations)
    from aruco_slam_tpu.utils.profiling import device_trace
    state = init_graph(gcfg)
    start = 0
    if args.resume:
        from aruco_slam_tpu.utils.checkpoint import load_checkpoint
        state, fdone = load_checkpoint(args.resume,
                                       (state, np.int64(0)))
        start = int(fdone)
        print(f"resumed from {args.resume} at ingest frame {start}")
    t0 = time.perf_counter()
    with device_trace(args.profile):
        for i in range(start, t):
            # pass 1: ingest with a cheap incremental window solve —
            # the warm start the reference gets from running ISAM2
            # during its first pass (reference
            # main/run_offline.py:86-94); batch LM from the raw
            # zero-motion init stalls far from the optimum
            state = add_frame(gcfg, state, jnp.asarray(t_cl[i]),
                              jnp.asarray(mask[i]),
                              jnp.asarray(q_cl[i])
                              if args.ba_rotations else None)
            state, _ = optimize_window(gcfg, state, window=cfg.window,
                                       iters=cfg.window_iters)
            if args.checkpoint_every and i + 1 < t \
                    and (i + 1) % args.checkpoint_every == 0:
                from aruco_slam_tpu.utils.checkpoint import \
                    save_checkpoint
                save_checkpoint(args.checkpoint,
                                (state, np.int64(i + 1)))
        state, cost = batch_optimize(gcfg, state,
                                     iters=cfg.batch_iters)
        # sync INSIDE the trace (and before reading the clock): the
        # solve dispatches asynchronously, so without this the trace
        # stops and dt is read while the device is still solving
        jax.block_until_ready(cost)
    dt = time.perf_counter() - t0
    print(f"batch solve: {t} poses, {int(state.f_count)} factors, "
          f"{cfg.batch_iters} LM iters in {dt:.2f}s "
          f"(final cost {float(cost):.3f})")

    # pass 2: emit smoothed estimates per iteration
    cam_traj = np.concatenate([np.asarray(state.pose_t),
                               np.asarray(state.pose_q)], axis=1)[:t]
    with TrajectoryWriter(cfg.trajectory_file) as w:
        for i in range(t):
            w.write(float(times[i]), cam_traj[i])
    if cfg.viz_2d or cfg.viz_3d:
        from aruco_slam_tpu.apps import sinks
        viewers = sinks.build_viewers(cfg, cam, src)
        sinks.replay(viewers, times, cam_traj, state.lm,
                     state.lm_active, t_cl, q_cl, mask)

    active = np.asarray(state.lm_active)
    slots = np.where(active)[0]
    # id->slot table inputs record TRUE marker ids in the map file
    ids = slot_ids[slots] if slot_ids is not None else slots
    cov = np.asarray(landmark_covariances(gcfg, state))
    unc = np.diagonal(cov, axis1=-2, axis2=-1)
    lm_out = np.asarray(state.lm)
    if args.ba_rotations:
        # 7-column records [xyz, quat wxyz] — the layout the
        # reference's rotation filter persists (its 10-dim landmark
        # block, reference filters/ekf_with_rotations.py:38)
        lm_out = np.concatenate([lm_out, np.asarray(state.lm_q)], 1)
    save_map(cfg.map_file, ids, lm_out[slots], unc[slots])
    print(f"wrote {cfg.trajectory_file} ({t} poses), "
          f"{cfg.map_file} ({len(ids)} landmarks)")
    if src is not None and src.has("gt_cam_t"):
        from aruco_slam_tpu.bench import ate
        est = np.asarray(state.pose_t)[:t]
        print(f"ATE vs ground truth: "
              f"{ate.ate_rmse(est, src['gt_cam_t']):.4f} m")


if __name__ == "__main__":
    main()
