"""Large-map throughput benchmark — BASELINE.json config 5 at scale.

"Multi-sequence throughput run: batched parallel SLAM over many videos
+ 500-marker synthetic map": a 512-marker wall surveyed by a raster
sweep, filtered by a 512-capacity constant-velocity MEKF (error-state
dim 9 + 512*3 = 1545, so the per-frame covariance update is a real
MXU workload), and S independent sequences vmapped/sharded over the
chip(s) at once.

The reference cannot represent this run at all: its EKF grows a dense
numpy state per landmark in Python (reference
extended_kalman_filter.py:239-290) and processes one sequence,
one frame, one marker at a time (reference main/run_slam.py:111-141).

    python -m aruco_slam_tpu.bench.large_map            # real TPU
    python -m aruco_slam_tpu.bench.large_map --platform cpu \
        --markers 96 --frames 64 --batch 2              # dev box

Prints one JSON line.
"""

from __future__ import annotations

import argparse
import json
import time

import numpy as np


def main(argv=None) -> None:
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--markers", type=int, default=512)
    p.add_argument("--frames", type=int, default=512)
    p.add_argument("--batch", type=int, default=8)
    p.add_argument("--max-obs", type=int, default=48)
    p.add_argument("--reps", type=int, default=3)
    p.add_argument("--precision", default="mixed",
                   choices=["highest", "high", "mixed"],
                   help="update-chain matmul precision (filters/mekf "
                        "matmul_precision). The serving default is "
                        "'mixed': bf16 bulk covariance products with "
                        "the gain chain pinned f32 — measured ATE "
                        "0.073 vs 0.067 m at 'highest' on this bench, "
                        "+14%% throughput")
    p.add_argument("--cov-dtype", default="f32",
                   choices=["f32", "bf16"],
                   help="covariance STORAGE dtype (MekfConfig."
                        "cov_dtype): bf16 halves the bandwidth the "
                        "dim-1545 step is bound on (measured 559 -> "
                        "810 fps batch 8) at an ATE cost this bench "
                        "reports honestly (0.127 vs 0.073 m)")
    p.add_argument("--platform", default=None)
    args = p.parse_args(argv)
    if args.platform:
        import jax
        jax.config.update("jax_platforms", args.platform)
    import jax
    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache_tpu")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    import jax.numpy as jnp

    from aruco_slam_tpu.bench import synthetic
    from aruco_slam_tpu.bench.ate import ate_rmse
    from aruco_slam_tpu.core import camera as cam_mod
    from aruco_slam_tpu.filters import MekfConfig, init_state
    from aruco_slam_tpu.ops import pnp

    k = np.array([[1414.9, 0.0, 967.0], [0.0, 1414.9, 544.3],
                  [0.0, 0.0, 1.0]])
    d = np.array([0.0614, -0.2951, 0.0005, 0.0029, 0.4387])
    cam = cam_mod.CameraModel.from_matrix(jnp.asarray(k, jnp.float32),
                                          jnp.asarray(d, jnp.float32))

    # wall wide enough that the raster sweep sees a bounded strip
    # (~33 of 512 markers) per frame, with vertical overlap between
    # passes (FOV height ~3.4 m at 4.5 m depth vs ~2.2 m row spacing)
    # so successive rows share landmarks — like a real survey flight
    extent = 11.0 * np.sqrt(args.markers / 512.0)
    scene = synthetic.make_wall_scene(
        num_markers=args.markers, seed=0, extent=float(extent),
        depth=4.5)
    traj = synthetic.make_raster_trajectory(
        num_frames=args.frames, rows=4,
        extent_x=float(extent - 2.0), extent_y=float(0.4 * extent))
    corners, mask = synthetic.observe_corners(
        scene, traj, cam, args.markers, noise_px=0.3, seed=1)
    visible = mask.sum(1)

    fcfg = MekfConfig(capacity=args.markers, max_obs=args.max_obs,
                      pallas_update=False, s_solver="ns",
                      pixel_sigma=0.3, gate_distance=1.5,
                      motion_model="cv", vel_decay=0.99,
                      matmul_precision=args.precision,
                      cov_dtype=jnp.bfloat16
                      if args.cov_dtype == "bf16" else None)
    state0 = init_state(fcfg)
    marker_size = scene.marker_size

    from aruco_slam_tpu.bench.pipeline import make_pipeline
    pipeline = make_pipeline(cam, marker_size, fcfg, chunk=16)

    single = jax.jit(pipeline)

    corners_d = jnp.asarray(corners, jnp.float32)
    mask_d = jnp.asarray(mask)
    rng = np.random.default_rng(7)
    corners_b = jnp.asarray(
        corners[None] + rng.normal(0, 0.3, (args.batch,) + corners.shape),
        jnp.float32)
    mask_b = jnp.broadcast_to(mask_d, (args.batch,) + mask.shape)

    _, est = jax.block_until_ready(single(state0, corners_d, mask_d))
    ate = ate_rmse(np.asarray(est[:, :3]), traj.cam_t)

    from aruco_slam_tpu.bench.pipeline import (
        flops_metrics, flops_of, time_on_device)
    dt = time_on_device(pipeline, state0, corners_d, mask_d,
                        reps=args.reps)
    single_fps = args.frames / dt
    batched = jax.vmap(pipeline, in_axes=(None, 0, 0))
    dt = time_on_device(batched, state0, corners_b, mask_b,
                        reps=max(1, args.reps - 1))
    fps = args.batch * args.frames / dt
    flop_row = flops_metrics(
        flops_of(batched, state0, corners_b, mask_b), dt)

    # offline smoothing at the same scale (north-star config 3): full
    # batch LM with Schur-eliminated landmarks over every pose/factor
    from aruco_slam_tpu.graph import (
        GraphConfig, add_frame, batch_optimize, init_graph)
    res = jax.vmap(
        lambda c: pnp.solve_square_pnp(cam, c, marker_size))(corners_d)
    t_cl_h = np.asarray(res.t_cl)
    mask_h = np.asarray(mask) & (np.asarray(res.err) < 3.0)
    nfac = int(mask_h.sum()) + args.frames
    gcfg = GraphConfig(max_poses=args.frames + 2,
                       max_landmarks=args.markers,
                       max_factors=nfac + 64,
                       pixel_sigma=0.3, huber_delta=2.0)
    gstate = init_graph(gcfg)
    for i in range(args.frames):
        gstate = add_frame(gcfg, gstate, jnp.asarray(t_cl_h[i]),
                           jnp.asarray(mask_h[i]))
    gout, _ = batch_optimize(gcfg, gstate, iters=40)  # compile
    jax.block_until_ready(gout.pose_t)
    t0 = time.perf_counter()
    gout, _ = batch_optimize(gcfg, gstate, iters=40)
    jax.block_until_ready(gout.pose_t)
    ba_s = time.perf_counter() - t0
    ba_ate = ate_rmse(np.asarray(gout.pose_t)[:args.frames], traj.cam_t)
    # BA MFU (VERDICT r4 #7): the Schur system is real GEMM content
    ba_flops = flops_of(lambda s: batch_optimize(gcfg, s, iters=40),
                        gstate)
    ba_flop_row = {f"ba_{k}": v for k, v in
                   flops_metrics(ba_flops, ba_s).items()}

    print(json.dumps({
        "metric": "large_map_fps_per_chip",
        "value": round(fps, 1),
        "unit": f"frames/s ({args.markers}-marker map, "
                f"batch {args.batch}, {args.precision} precision, "
                f"{args.cov_dtype} covariance)",
        "single_stream_fps": round(single_fps, 1),
        "ate_m": round(float(ate), 4),
        "offline_ba_ate_m": round(float(ba_ate), 4),
        "offline_ba_s": round(ba_s, 2),
        "n_factors": nfac,
        "mean_visible": round(float(visible.mean()), 1),
        "state_dim": fcfg.err_dim,
        **flop_row,
        **ba_flop_row,
    }))


if __name__ == "__main__":
    main()
