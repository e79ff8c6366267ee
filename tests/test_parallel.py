"""Multi-device paths on the virtual 8-device CPU mesh."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from aruco_slam_tpu.bench import ate, synthetic
from aruco_slam_tpu.filters import (
    FrameObservations, MekfConfig, init_state)
from aruco_slam_tpu.graph import (
    GraphConfig, add_frame, batch_optimize, init_graph)
from aruco_slam_tpu.parallel import (
    batched_mekf_scan, make_mesh, sharded_batch_optimize)
from aruco_slam_tpu.parallel.multi_slam import stack_states


@pytest.fixture(scope="module")
def mesh():
    assert jax.device_count() >= 8, "conftest must provide 8 devices"
    return make_mesh(8)


def build_graph(frames=40, seed=0, dtype=jnp.float64):
    cfg = GraphConfig(max_poses=frames + 2, max_landmarks=16,
                      max_factors=frames * 10, dtype=dtype,
                      meas_sigma_t=0.01, odom_sigma_t=1.0,
                      odom_sigma_rot=1.0)
    scene = synthetic.make_wall_scene(num_markers=8, seed=seed)
    traj = synthetic.make_orbit_trajectory(num_frames=frames)
    obs = synthetic.observe_poses(scene, traj, cfg.max_landmarks,
                                  noise_t=0.005, fov_limit=0.75)
    state = init_graph(cfg)
    for i in range(frames):
        state = add_frame(cfg, state, jnp.asarray(obs.t_cl[i]),
                          jnp.asarray(obs.mask[i]))
    return cfg, state, traj


def test_sharded_ba_matches_single_device(mesh):
    frames = 40
    cfg, state, traj = build_graph(frames)
    single, cost_s = batch_optimize(cfg, state, iters=15)
    multi, cost_m = sharded_batch_optimize(cfg, state, mesh, iters=15)
    # identical math; only float reduction order differs
    np.testing.assert_allclose(float(cost_m), float(cost_s), rtol=1e-8)
    np.testing.assert_allclose(
        np.asarray(multi.pose_t)[:frames],
        np.asarray(single.pose_t)[:frames], atol=1e-7)
    err = ate.ate_rmse(np.asarray(multi.pose_t)[:frames],
                       traj.cam_t[:frames])
    assert err < 0.02


def test_sharded_ba_f32(mesh):
    frames = 30
    cfg, state, traj = build_graph(frames, seed=1, dtype=jnp.float32)
    multi, cost = sharded_batch_optimize(cfg, state, mesh, iters=10)
    assert np.isfinite(float(cost))
    err = ate.ate_rmse(np.asarray(multi.pose_t)[:frames],
                       traj.cam_t[:frames])
    assert err < 0.05


def test_batched_multi_sequence_mekf(mesh):
    cfg = MekfConfig(capacity=16, r_uncertainty=1e-3,
                     q_uncertainty_cam=0.05,
                     q_error_uncertainty_cam=0.05, q_uncertainty_lm=1e-5)
    n_seq, frames = 8, 60
    obs_list, trajs = [], []
    for s in range(n_seq):
        scene = synthetic.make_wall_scene(num_markers=8, seed=s)
        traj = synthetic.make_orbit_trajectory(num_frames=frames,
                                               seed=100 + s)
        o = synthetic.observe_poses(scene, traj, cfg.capacity,
                                    noise_t=0.005, fov_limit=0.75,
                                    seed=200 + s)
        obs_list.append(o)
        trajs.append(traj)
    obs = FrameObservations(
        t_cl=jnp.asarray(np.stack([o.t_cl for o in obs_list])),
        q_cl=jnp.asarray(np.stack([o.q_cl for o in obs_list])),
        mask=jnp.asarray(np.stack([o.mask for o in obs_list])))
    states = stack_states([init_state(cfg) for _ in range(n_seq)])
    finals, cam_trajs = batched_mekf_scan(cfg, states, obs, mesh=mesh)
    cam_trajs = np.asarray(cam_trajs)
    assert cam_trajs.shape == (n_seq, frames, 7)
    for s in range(n_seq):
        err = ate.ate_rmse(cam_trajs[s, :, :3], trajs[s].cam_t)
        assert err < 0.1, f"seq {s}: ATE {err}"


def test_batched_matches_individual(mesh):
    """Sharded batch result == per-sequence sequential result."""
    from aruco_slam_tpu.filters import mekf_scan
    cfg = MekfConfig(capacity=8)
    frames, n_seq = 20, 8
    rng = np.random.default_rng(0)
    t_cl = rng.normal(size=(n_seq, frames, 8, 3)) + np.array([0, 0, 3.0])
    q_cl = np.zeros((n_seq, frames, 8, 4)); q_cl[..., 1] = 1.0
    mask = rng.random((n_seq, frames, 8)) < 0.6
    obs = FrameObservations(jnp.asarray(t_cl, jnp.float32),
                            jnp.asarray(q_cl, jnp.float32),
                            jnp.asarray(mask))
    states = stack_states([init_state(cfg) for _ in range(n_seq)])
    _, batched = batched_mekf_scan(cfg, states, obs, mesh=mesh)
    for s in [0, 3, 7]:
        _, solo = mekf_scan(cfg, init_state(cfg), FrameObservations(
            obs.t_cl[s], obs.q_cl[s], obs.mask[s]))
        np.testing.assert_allclose(np.asarray(batched[s]),
                                   np.asarray(solo), atol=2e-5)


def test_large_map_survey():
    """BASELINE.json config 5 shape at dev scale: capacity > 64
    landmarks surveyed by the smooth raster sweep, corner-level PnP
    front end, compacted MEKF update. Exercises the >64-slot state
    layout (err_dim 6 + 3C) end to end."""
    import json

    from aruco_slam_tpu.bench import large_map

    import io
    from contextlib import redirect_stdout

    buf = io.StringIO()
    with redirect_stdout(buf):
        large_map.main(["--markers", "96", "--frames", "160",
                        "--batch", "2", "--reps", "1"])
    out = json.loads(buf.getvalue().strip().splitlines()[-1])
    assert out["state_dim"] == 9 + 96 * 3  # cv model: [dt, dth, dv]
    assert out["mean_visible"] > 4
    assert out["ate_m"] < 0.4, out


def test_sharded_image_pipeline_fleet(mesh):
    """BASELINE config 5 from PIXELS: the full detect -> PnP -> MEKF
    pipeline vmapped over 8 video streams sharded across the mesh must
    match the unsharded single-stream pipeline exactly."""
    from aruco_slam_tpu.bench import render
    from aruco_slam_tpu.core import camera as cam_mod
    from aruco_slam_tpu.ops import detect
    from aruco_slam_tpu.parallel.multi_slam import batched_image_slam

    k = np.array([[700.0, 0.0, 240.0], [0.0, 700.0, 135.0],
                  [0.0, 0.0, 1.0]])
    cam = cam_mod.CameraModel.from_matrix(jnp.asarray(k),
                                          jnp.asarray(np.zeros(5)))
    scene = synthetic.make_wall_scene(num_markers=6, seed=4)
    traj = jax.tree.map(lambda a: a[:4],
                        synthetic.make_orbit_trajectory(num_frames=40))
    frames = render.render_sequence(scene, traj, cam,
                                    image_size=(480, 270))
    s = 8
    images = jnp.asarray(np.broadcast_to(
        frames, (s,) + frames.shape).copy())
    dcfg = detect.DetectorConfig(capacity=16, downscale=2,
                                 passes=((9, 2),), min_area=12)
    fcfg = MekfConfig(capacity=16, max_obs=8)
    states = stack_states([init_state(fcfg)] * s)
    finals, trajs = batched_image_slam(
        dcfg, fcfg, cam, scene.marker_size, images, states, mesh)
    assert trajs.shape == (s, 4, 7)
    assert np.isfinite(np.asarray(trajs)).all()
    # identical streams -> identical outputs across shards
    np.testing.assert_array_equal(np.asarray(trajs[0]),
                                  np.asarray(trajs[5]))
    # and the sharded fleet matches the plain single pipeline
    from aruco_slam_tpu.filters import mekf_scan
    from aruco_slam_tpu.ops import pnp
    det = detect.detect_markers_batch(jnp.asarray(frames), dcfg)
    res = pnp.solve_square_pnp(cam, det.corners, scene.marker_size)
    obs = FrameObservations(t_cl=res.t_cl, q_cl=res.q_cl,
                            mask=det.mask & (res.err < 3.0))
    assert bool(obs.mask.any()), "scene produced no detections"
    _, traj_single = mekf_scan(fcfg, init_state(fcfg), obs)
    np.testing.assert_allclose(np.asarray(trajs[0]),
                               np.asarray(traj_single), atol=1e-6)
