"""Multi-device scaling-efficiency harness for the sharded BA solver.

Measures `parallel.sharded_batch_optimize` wall time across mesh sizes
and reports strong-scaling efficiency — the harness behind the north
star's >=70% multi-host target. On real multi-chip hardware run it
as-is; on a single-chip/dev box run it on virtual CPU devices first:

    XLA_FLAGS=--xla_force_host_platform_device_count=8 \
        python -m aruco_slam_tpu.bench.scaling --platform cpu

(virtual devices share host cores, so CPU efficiency numbers validate
the mechanics and the collective layout, not real ICI speedup).
Prints one JSON line per mesh size.
"""

from __future__ import annotations

import argparse
import json
import time

import numpy as np


def run(mesh_sizes, frames=256, markers=32, iters=10, reps=3):
    import jax
    import jax.numpy as jnp

    from aruco_slam_tpu.bench import synthetic
    from aruco_slam_tpu.graph import GraphConfig, add_frame, init_graph
    from aruco_slam_tpu.parallel import make_mesh, sharded_batch_optimize

    cfg = GraphConfig(max_poses=frames + 2, max_landmarks=markers,
                      max_factors=frames * (markers // 2),
                      meas_sigma_t=0.01, odom_sigma_t=1.0,
                      odom_sigma_rot=1.0)
    scene = synthetic.make_wall_scene(num_markers=markers, seed=0)
    traj = synthetic.make_orbit_trajectory(num_frames=frames)
    obs = synthetic.observe_poses(scene, traj, cfg.max_landmarks,
                                  noise_t=0.005, fov_limit=0.9)
    state = init_graph(cfg)
    for i in range(frames):
        state = add_frame(cfg, state, jnp.asarray(obs.t_cl[i]),
                          jnp.asarray(obs.mask[i]))

    results = []
    base_dt = None
    for n in mesh_sizes:
        if n > jax.device_count():
            break
        mesh = make_mesh(n)
        out, _ = sharded_batch_optimize(cfg, state, mesh, iters=iters)
        jax.block_until_ready(out.pose_t)  # compile + warm
        t0 = time.perf_counter()
        for _ in range(reps):
            out, _ = sharded_batch_optimize(cfg, state, mesh,
                                            iters=iters)
            jax.block_until_ready(out.pose_t)
        dt = (time.perf_counter() - t0) / reps
        if base_dt is None:
            base_dt = dt
        eff = base_dt / (dt * n)
        row = {"devices": n, "seconds": round(dt, 4),
               "speedup": round(base_dt / dt, 3),
               "efficiency": round(eff, 3)}
        if jax.default_backend() == "cpu":
            # virtual devices time-share the same host cores, so the
            # "speedup" column is meaningless there by construction
            row["note"] = ("virtual CPU devices share host cores: "
                           "validates collective layout/mechanics, "
                           "NOT speedup — run on a real multi-chip "
                           "slice for efficiency numbers")
        results.append(row)
        print(json.dumps(row))
    return results


def main(argv=None) -> None:
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--platform", default=None)
    p.add_argument("--sizes", default="1,2,4,8")
    p.add_argument("--frames", type=int, default=256)
    p.add_argument("--iters", type=int, default=10)
    args = p.parse_args(argv)
    if args.platform:
        import jax
        jax.config.update("jax_platforms", args.platform)
    sizes = [int(s) for s in args.sizes.split(",")]
    run(sizes, frames=args.frames, iters=args.iters)


if __name__ == "__main__":
    main()
