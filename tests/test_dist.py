"""Multi-process distributed execution (the real multi-host path).

Two layers of proof:

* `test_fleet_2d_mesh` — the 2-D ('data', 'kf') mesh in one process on
  the 8 virtual devices: a fleet of independent BA problems, each
  landmark-sharded, must match per-problem single-device solves.
* `test_multiprocess_sharded_ba` — TWO OS processes joined with
  `jax.distributed.initialize` (Gloo collectives on CPU), a global
  4-device mesh spanning them, and the landmark-sharded BA running
  SPMD across the process boundary. This is the same launch shape as
  one-process-per-host on a TPU pod; only the transport differs.
"""

import json
import os
import subprocess
import sys
import textwrap

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from aruco_slam_tpu.bench import synthetic
from aruco_slam_tpu.graph import (
    GraphConfig, add_frame, batch_optimize, init_graph)
from aruco_slam_tpu.parallel import (
    make_mesh2d, sharded_fleet_optimize, stack_graphs)


def build_graph(frames=30, seed=0, dtype=jnp.float64, markers=8):
    cfg = GraphConfig(max_poses=frames + 2, max_landmarks=16,
                      max_factors=frames * 10, dtype=dtype,
                      meas_sigma_t=0.01, odom_sigma_t=1.0,
                      odom_sigma_rot=1.0)
    scene = synthetic.make_wall_scene(num_markers=markers, seed=seed)
    traj = synthetic.make_orbit_trajectory(num_frames=frames)
    obs = synthetic.observe_poses(scene, traj, cfg.max_landmarks,
                                  noise_t=0.005, fov_limit=0.75,
                                  seed=seed)
    state = init_graph(cfg)
    for i in range(frames):
        state = add_frame(cfg, state, jnp.asarray(obs.t_cl[i]),
                          jnp.asarray(obs.mask[i]))
    return cfg, state


def test_fleet_2d_mesh():
    assert jax.device_count() >= 8
    mesh = make_mesh2d(n_data=4, n_kf=2)
    assert mesh.shape == {"data": 4, "kf": 2}
    frames = 24
    cfg = None
    problems = []
    for s in range(4):
        cfg, st = build_graph(frames=frames, seed=s)
        problems.append(st)
    fleet = stack_graphs(problems)
    out, costs = sharded_fleet_optimize(cfg, fleet, mesh, iters=12)
    assert costs.shape == (4,)
    for s in range(4):
        single, cost_s = batch_optimize(cfg, problems[s], iters=12)
        np.testing.assert_allclose(float(costs[s]), float(cost_s),
                                   rtol=1e-8)
        np.testing.assert_allclose(
            np.asarray(out.pose_t[s])[:frames],
            np.asarray(single.pose_t)[:frames], atol=1e-7)
        np.testing.assert_allclose(
            np.asarray(out.lm[s]), np.asarray(single.lm), atol=1e-7)


_WORKER = textwrap.dedent("""
    import json, os, sys
    pid = int(sys.argv[1]); nproc = int(sys.argv[2]); port = sys.argv[3]
    sys.path.insert(0, {repo!r})
    # platform must be pinned through the config API before the
    # backend initializes (the environment's site hook pins a
    # tunneled-TPU platform via env var)
    import jax
    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_enable_x64", True)
    from aruco_slam_tpu.parallel import dist
    dist.initialize(coordinator_address="127.0.0.1:" + port,
                    num_processes=nproc, process_id=pid,
                    local_devices=2)
    import numpy as np, jax.numpy as jnp
    assert jax.process_count() == nproc
    assert jax.device_count() == 2 * nproc, jax.devices()

    sys.path.insert(0, {testdir!r})
    from test_dist import build_graph
    from aruco_slam_tpu.parallel import make_mesh, sharded_batch_optimize
    cfg, state = build_graph(frames=24, seed=3)
    mesh = make_mesh()          # global: 4 devices across 2 processes
    out, cost = sharded_batch_optimize(cfg, state, mesh, iters=10)
    res = {{"cost": float(cost),
            "pose_t": np.asarray(out.pose_t).tolist(),
            "lm": np.asarray(out.lm).tolist()}}
    if pid == 0:
        print("RESULT" + json.dumps(res))
""")


@pytest.fixture(scope="module")
def seq_files(tmp_path_factory):
    """Four small synthetic sequences for the product-CLI fleet and
    multi-process tests."""
    from aruco_slam_tpu.apps import make_synthetic
    d = tmp_path_factory.mktemp("dist_seqs")
    paths = []
    for s in range(4):
        path = d / f"seq{s}.npz"
        make_synthetic.main(["--out", str(path), "--frames", "24",
                             "--markers", "6", "--seed", str(s),
                             "--noise-px", "0.3"])
        paths.append(path)
    return paths


def test_offline_fleet_cli(seq_files, tmp_path):
    """`run_offline --fleet 4x2` (product CLI for the 2-D mesh): four
    sequences solved data-parallel, each landmark-sharded over 2
    devices, must write per-sequence trajectories matching the
    single-sequence solve (VERDICT r2 #1: the distributed runtime must
    be reachable from the product drivers, not only from tests)."""
    from aruco_slam_tpu.apps import run_offline
    from aruco_slam_tpu.io import read_trajectory
    traj = tmp_path / "traj.txt"
    run_offline.main(["--input", ",".join(str(p) for p in seq_files),
                      "--fleet", "4x2", "--f64", "--iters", "10",
                      "--trajectory", str(traj),
                      "--map", str(tmp_path / "map.txt")])
    # single-sequence reference run for sequence 2
    t_single = tmp_path / "single.txt"
    run_offline.main(["--input", str(seq_files[2]), "--f64",
                      "--iters", "10", "--trajectory", str(t_single),
                      "--map", str(tmp_path / "map_s.txt")])
    for i in range(4):
        times, poses = read_trajectory(tmp_path / f"traj_seq{i}.txt")
        assert len(times) == 24 and np.isfinite(poses).all()
    _, fleet2 = read_trajectory(tmp_path / "traj_seq2.txt")
    _, single2 = read_trajectory(t_single)
    # sharded fleet solve == single-device solve (f64), up to the
    # trajectory file's 1e-6 rounding
    np.testing.assert_allclose(fleet2, single2, atol=1e-5)


@pytest.mark.slow
def test_offline_multiprocess_cli(seq_files, tmp_path, monkeypatch):
    """`run_offline --processes 2` (the pod launch shape as a product
    flag): two OS processes joined over jax.distributed solve the
    batch landmark-sharded across the process boundary, process 0
    writes — and the trajectory file matches the single-process run
    (VERDICT r2 #1 'done' condition)."""
    from aruco_slam_tpu.apps import run_offline
    from aruco_slam_tpu.io import read_trajectory
    # children inherit the env: give them the persistent compile cache
    # the in-process suite uses (conftest sets it via jax.config only)
    monkeypatch.setenv("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache")
    t_multi = tmp_path / "multi.txt"
    run_offline.main(["--input", str(seq_files[0]), "--f64",
                      "--iters", "10",
                      "--processes", "2", "--local-devices", "2",
                      "--platform", "cpu",
                      "--coordinator", "127.0.0.1:29793",
                      "--trajectory", str(t_multi),
                      "--map", str(tmp_path / "map_m.txt")])
    t_single = tmp_path / "single.txt"
    run_offline.main(["--input", str(seq_files[0]), "--f64",
                      "--iters", "10", "--trajectory", str(t_single),
                      "--map", str(tmp_path / "map_s.txt")])
    _, multi = read_trajectory(t_multi)
    _, single = read_trajectory(t_single)
    assert multi.shape == (24, 7)
    np.testing.assert_allclose(multi, single, atol=1e-5)


@pytest.mark.slow
def test_offline_multiprocess_image_ingest(tmp_path, monkeypatch):
    """Sharded IMAGE ingest under --processes 2 (VERDICT r3 #5): the
    per-frame candidate pipeline runs round-robin across the two
    processes (each detects only its own chunks), the slot scan + PnP
    replicate, and the final trajectory matches the single-process
    run of the same image sequence."""
    from aruco_slam_tpu.apps import make_synthetic, run_offline
    from aruco_slam_tpu.io import read_trajectory, sources
    k = np.array([[530.0, 0.0, 360.0], [0.0, 530.0, 202.0],
                  [0.0, 0.0, 1.0]])
    bundle = make_synthetic.build(
        frames=10, markers=6, capacity=16, noise_px=0.2, seed=0,
        camera_matrix=k, dist_coeffs=np.zeros(5), with_images=True,
        image_size=(720, 405))
    seq = tmp_path / "img.npz"
    sources.save_npz(seq, **bundle)
    monkeypatch.setenv("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache")
    t_multi = tmp_path / "multi.txt"
    run_offline.main(["--input", str(seq), "--f64", "--iters", "10",
                      "--processes", "2", "--local-devices", "2",
                      "--platform", "cpu",
                      "--coordinator", "127.0.0.1:29795",
                      "--trajectory", str(t_multi),
                      "--map", str(tmp_path / "map_m.txt")])
    t_single = tmp_path / "single.txt"
    run_offline.main(["--input", str(seq), "--f64", "--iters", "10",
                      "--trajectory", str(t_single),
                      "--map", str(tmp_path / "map_s.txt")])
    _, multi = read_trajectory(t_multi)
    _, single = read_trajectory(t_single)
    assert multi.shape == (10, 7)
    np.testing.assert_allclose(multi, single, atol=1e-5)


@pytest.mark.slow
def test_multiprocess_sharded_ba(tmp_path):
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    testdir = os.path.join(repo, "tests")
    worker = tmp_path / "worker.py"
    worker.write_text(_WORKER.format(repo=repo, testdir=testdir))
    port = "29765"
    env = {k: v for k, v in os.environ.items() if k != "XLA_FLAGS"}
    env["JAX_PLATFORMS"] = ""  # dist.initialize sets the platform
    procs = [subprocess.Popen(
        [sys.executable, str(worker), str(i), "2", port],
        stdout=subprocess.PIPE, stderr=subprocess.PIPE,
        text=True, env=env) for i in range(2)]
    outs = []
    for p in procs:
        try:
            out, err = p.communicate(timeout=420)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            pytest.fail("multi-process workers hung")
        outs.append((p.returncode, out, err))
    for rc, out, err in outs:
        assert rc == 0, f"worker failed:\n{out}\n{err}"
    line = next(ln for ln in outs[0][1].splitlines()
                if ln.startswith("RESULT"))
    res = json.loads(line[len("RESULT"):])

    # reference: same problem solved in THIS process on one device
    cfg, state = build_graph(frames=24, seed=3)
    single, cost_s = batch_optimize(cfg, state, iters=10)
    np.testing.assert_allclose(res["cost"], float(cost_s), rtol=1e-8)
    np.testing.assert_allclose(np.asarray(res["pose_t"]),
                               np.asarray(single.pose_t), atol=1e-7)
    np.testing.assert_allclose(np.asarray(res["lm"]),
                               np.asarray(single.lm), atol=1e-7)
