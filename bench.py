"""Headline benchmark: fused marker-SLAM frame pipeline, fps per chip.

Runs the flagship path — batched IPPE-square PnP from pixel corners +
the fused MEKF update — on the default device (the real TPU under the
driver) in two shapes:

* single-stream: one video, one `lax.scan` over 512 frames (latency-
  bound; the shape the reference's sequential CPU loop runs), and
* batched serving: 256 independent sequences vmapped over the same
  pipeline (throughput-bound; the shape a TPU chip actually serves).

Prints ONE JSON line with the batched chip throughput as the headline
value; `single_stream_fps` rides along for latency comparisons.
vs_baseline is the speedup over the measured reference-EKF CPU rate at
the same observation boundary (45.1 fps @ 8 visible markers of a
64-marker map — see BASELINE_MEASURED.md).
"""

from __future__ import annotations

import json

import numpy as np

REFERENCE_FPS = 45.1  # measured; BASELINE_MEASURED.md

FRAMES = 512
CAPACITY = 64
MARKERS = 8
BATCH = 256


def main() -> None:
    import jax

    # persistent compile cache: the scan+PnP program takes minutes to
    # build over the tunneled executor; cache it across bench runs
    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache_tpu")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    import jax.numpy as jnp

    from aruco_slam_tpu.bench import synthetic
    from aruco_slam_tpu.core import camera as cam_mod
    from aruco_slam_tpu.filters import MekfConfig, init_state

    k = np.array([[1414.9, 0.0, 967.0], [0.0, 1414.9, 544.3],
                  [0.0, 0.0, 1.0]])
    d = np.array([0.0614, -0.2951, 0.0005, 0.0029, 0.4387])
    cam = cam_mod.CameraModel.from_matrix(jnp.asarray(k, jnp.float32),
                                          jnp.asarray(d, jnp.float32))
    scene = synthetic.make_wall_scene(num_markers=MARKERS, seed=0)
    traj = synthetic.make_orbit_trajectory(num_frames=FRAMES)
    corners, mask = synthetic.observe_corners(
        scene, traj, cam, CAPACITY, noise_px=0.3, seed=1)

    fcfg = MekfConfig(capacity=CAPACITY)
    state0 = init_state(fcfg)
    corners_d = jnp.asarray(corners, jnp.float32)
    mask_d = jnp.asarray(mask)
    marker_size = scene.marker_size

    from aruco_slam_tpu.bench.pipeline import make_pipeline as _mk

    def make_pipeline(cfg_):
        # corners -> batched PnP -> fused MEKF scan; chunked PnP keeps
        # solver intermediates bounded (vmapping the whole sequence at
        # batch 64 wants ~45 GB)
        return _mk(cam, marker_size, cfg_, chunk=64)

    # single-stream: the fused pallas kernel minimizes per-frame
    # latency. batched: a vmapped pallas_call serializes its batch
    # grid, so the batched program uses the XLA Newton-Schulz solver,
    # which vmaps into batched MXU GEMMs. Serving precision: bf16
    # covariance products with an f32-pinned gain chain ("mixed") —
    # the covariance tolerates bf16 noise while S stays numerically
    # PSD for the Newton-Schulz solver.
    fcfg_b = fcfg._replace(pallas_update=False, s_solver="ns",
                           matmul_precision="mixed")

    # B sequence variants: shared geometry, distinct pixel noise so the
    # tunneled executor cannot memoize identical calls
    rng = np.random.default_rng(7)
    corners_b = jnp.asarray(
        corners[None] + rng.normal(0, 0.3, (BATCH,) + corners.shape),
        jnp.float32)
    mask_b = jnp.broadcast_to(mask_d, (BATCH,) + mask.shape)

    from aruco_slam_tpu.bench.pipeline import (
        flops_metrics, flops_of, time_on_device)

    single_fn = make_pipeline(fcfg)
    batched_fn = jax.vmap(make_pipeline(fcfg_b), in_axes=(None, 0, 0))
    dt = time_on_device(single_fn, state0, corners_d, mask_d, reps=8)
    single_fps = FRAMES / dt
    dtb = time_on_device(batched_fn, state0, corners_b, mask_b, reps=2)
    batched_fps = BATCH * FRAMES / dtb

    flops = flops_of(batched_fn, state0, corners_b, mask_b)
    row = {
        "metric": "mekf_pipeline_fps_per_chip",
        "value": round(batched_fps, 1),
        "unit": "frames/s",
        "vs_baseline": round(batched_fps / REFERENCE_FPS, 2),
        "batch": BATCH,
        "single_stream_fps": round(single_fps, 1),
        **flops_metrics(flops, dtb),
    }
    # image-domain numbers ride along so the driver-captured artifact
    # tracks detector progress (VERDICT r3 #7: the MEKF headline never
    # saw the robust-detector story). Timeboxed: a cold compile over
    # the tunnel must not kill the whole bench row.
    try:
        row.update(_image_e2e_fields(cam, time_budget_s=1500))
    except Exception as e:  # noqa: BLE001 - bench must still print
        row["e2e_error"] = f"{type(e).__name__}: {e}"[:120]
    print(json.dumps(row))


def _image_e2e_fields(cam, time_budget_s: int = 1500,
                      frames: int = 16, chunk: int = 8) -> dict:
    """Robust image->pose e2e fps (full 3-pass detector every frame)
    on rendered 1080p frames — the detector-bound number the e2e
    bench (bench/e2e.py) reports, in compact form."""
    import signal
    import time

    import jax
    import jax.numpy as jnp

    from aruco_slam_tpu.bench import synthetic
    from aruco_slam_tpu.bench.render import render_sequence
    from aruco_slam_tpu.filters import (
        FrameObservations, MekfConfig, init_state, mekf_scan)
    from aruco_slam_tpu.ops import detect, pnp

    def timeout_handler(signum, frame):
        raise TimeoutError(f"e2e fields exceeded {time_budget_s}s")

    old = signal.signal(signal.SIGALRM, timeout_handler)
    signal.alarm(time_budget_s)
    try:
        scene = synthetic.make_wall_scene(num_markers=10, seed=0)
        traj = synthetic.make_orbit_trajectory(num_frames=frames)
        cache = f"/tmp/bench_e2e_frames_{frames}.npz"
        try:
            imgs = np.load(cache)["frames"]
        except (FileNotFoundError, KeyError):
            imgs = np.asarray(render_sequence(
                scene, traj, cam, image_size=(1920, 1080)))
            np.savez(cache, frames=imgs)
        images = jnp.asarray(imgs)
        dcfg = detect.DetectorConfig(capacity=CAPACITY)  # robust
        fcfg = MekfConfig(capacity=CAPACITY)
        state0 = init_state(fcfg)
        ms = scene.marker_size
        t = frames
        reps = 4

        def e2e(ims, state):
            det = jax.lax.map(
                lambda x: detect.detect_markers_batch(x, dcfg),
                ims.reshape(t // chunk, chunk, *ims.shape[1:]))
            cs = det.corners.reshape(t, CAPACITY, 4, 2)
            msk = det.mask.reshape(t, CAPACITY)
            res = pnp.solve_square_pnp(cam, cs, ms)
            obs = FrameObservations(res.t_cl, res.q_cl,
                                    msk & (res.err < 3.0))
            return mekf_scan(fcfg, state, obs)

        @jax.jit
        def timed(ims):
            def body(i, acc):
                _, tr = e2e(ims ^ (i % 2).astype(jnp.uint8), state0)
                return acc + tr.sum()
            return jax.lax.fori_loop(0, reps, body, jnp.float32(0))

        # tunnel discipline: warm on a DIFFERENT value, sync by FETCH
        float(timed(images ^ jnp.uint8(2)))
        t0 = time.perf_counter()
        float(timed(images))
        dt = (time.perf_counter() - t0) / reps
        return {"robust_e2e_fps": round(t / dt, 1),
                "robust_e2e_frames": t}
    finally:
        signal.alarm(0)
        signal.signal(signal.SIGALRM, old)


if __name__ == "__main__":
    main()
