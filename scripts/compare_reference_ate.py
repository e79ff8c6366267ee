"""Head-to-head ATE: reference EKF vs our MEKF on identical inputs.

Feeds the SAME synthetic slot observations (exact marker poses in the
camera frame — what PnP outputs) to

* the reference's EKF (`/root/reference/filters/extended_kalman_filter.py`,
  imported read-only with a package alias for its broken `aruco_slam.*`
  imports, reference SURVEY.md "import-path inconsistency"), and
* our fused MEKF (app-default tuning: constant-velocity model +
  depth-scaled R),

then reports Umeyama-aligned ATE RMSE for both. This pins the
"<= reference ATE" target of BASELINE.json with a measured number.

Run: python scripts/compare_reference_ate.py  (CPU; ~1 min, the
reference's SymPy codegen dominates startup).
"""

from __future__ import annotations

import os
import sys
import time
import types

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
REFERENCE = "/root/reference"


def run_reference(obs, frames):
    """Drive the reference EKF's observe() over the sequence."""
    from scipy.spatial.transform import Rotation

    sys.path.insert(0, REFERENCE)
    # The reference is mid-rename: its filters import from
    # `aruco_slam.filters.*` but the checkout has a top-level
    # `filters/` package whose __init__ imports those same submodules —
    # so alias base_filter (which has no aruco_slam imports) first,
    # then the dependent modules resolve.
    cwd = os.getcwd()
    os.chdir(REFERENCE)  # BaseFilter loads calibration .npy relatively
    try:
        import importlib.util

        # load base_filter from its file path, bypassing the filters
        # package __init__ (which would recurse into the broken import)
        spec = importlib.util.spec_from_file_location(
            "aruco_slam.filters.base_filter",
            os.path.join(REFERENCE, "filters", "base_filter.py"))
        base = importlib.util.module_from_spec(spec)
        pkg = types.ModuleType("aruco_slam")
        fpkg = types.ModuleType("aruco_slam.filters")
        fpkg.base_filter = base
        pkg.filters = fpkg
        sys.modules.setdefault("aruco_slam", pkg)
        sys.modules.setdefault("aruco_slam.filters", fpkg)
        sys.modules.setdefault("aruco_slam.filters.base_filter", base)
        sys.modules.setdefault("gtsam", types.ModuleType("gtsam"))
        spec.loader.exec_module(base)
        spec2 = importlib.util.spec_from_file_location(
            "reference_ekf",
            os.path.join(REFERENCE, "filters",
                         "extended_kalman_filter.py"))
        ekf_mod = importlib.util.module_from_spec(spec2)
        spec2.loader.exec_module(ekf_mod)
        EKF = ekf_mod.EKF

        pose0 = np.zeros(10)
        pose0[3] = 1.0  # identity quaternion, scalar-first
        t0 = time.perf_counter()
        ekf = EKF(pose0)
        print(f"reference EKF ready ({time.perf_counter() - t0:.1f}s "
              f"SymPy codegen)")
        traj = np.zeros((frames, 3))
        for i in range(frames):
            ids = np.where(obs.mask[i])[0]
            if len(ids):
                rvecs = Rotation.from_quat(
                    obs.q_cl[i][ids], scalar_first=True).as_rotvec()
                poses = np.concatenate([obs.t_cl[i][ids], rvecs], axis=-1)
                ekf.observe(ids.tolist(), poses)
            traj[i] = ekf.state[:3]
        return traj
    finally:
        os.chdir(cwd)


def run_ours(obs, frames):
    import jax

    jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp

    sys.path.insert(0, REPO)
    from aruco_slam_tpu.filters import (
        FrameObservations, MekfConfig, init_state, mekf_scan)

    cfg = MekfConfig(capacity=obs.mask.shape[1], motion_model="cv",
                     q_uncertainty_lm=0.0, pixel_sigma=1.0,
                     gate_distance=1.0)
    seq = FrameObservations(jnp.asarray(obs.t_cl, jnp.float32),
                            jnp.asarray(obs.q_cl, jnp.float32),
                            jnp.asarray(obs.mask))
    _, cam_traj = mekf_scan(cfg, init_state(cfg), seq)
    return np.asarray(cam_traj)[:, :3]


def run_comparison() -> dict[str, tuple[float, float]]:
    """The ONE reproducible head-to-head (tests/test_reference_parity.py
    pins these so README / BASELINE_MEASURED.md cannot drift from the
    script again). Returns {label: (reference ATE, ours ATE)} in
    meters."""
    sys.path.insert(0, REPO)
    from aruco_slam_tpu.bench import ate, synthetic

    frames, markers = 240, 12
    scene = synthetic.make_wall_scene(num_markers=markers, seed=0)
    traj = synthetic.make_orbit_trajectory(num_frames=frames)
    out = {}
    for label, noise in (("noiseless", 0.0), ("noisy (1 cm)", 0.01)):
        obs = synthetic.observe_poses(scene, traj, 64, fov_limit=0.75,
                                      noise_t=noise, noise_r=noise)
        ref = run_reference(obs, frames)
        ours = run_ours(obs, frames)
        e_ref = ate.ate_rmse(ref, traj.cam_t)
        e_ours = ate.ate_rmse(ours, traj.cam_t)
        print(f"{label}: reference EKF ATE {e_ref:.4f} m | "
              f"ours {e_ours:.4f} m | ratio {e_ref / e_ours:.1f}x")
        out[label] = (float(e_ref), float(e_ours))
    return out


def main() -> None:
    run_comparison()


if __name__ == "__main__":
    main()
