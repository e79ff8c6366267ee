"""IO round-trips and end-to-end CLI app smoke tests."""

import numpy as np
import pytest

from aruco_slam_tpu.io import TrajectoryWriter, load_map, read_trajectory, save_map
from aruco_slam_tpu.io.trajectory import write_trajectory
from aruco_slam_tpu.io.sources import NpzSource, save_npz


def test_trajectory_roundtrip(tmp_path):
    f = tmp_path / "traj.txt"
    times = np.array([0.0, 0.0333, 0.0667])
    poses = np.array([
        [0, 0, 0, 1, 0, 0, 0],
        [0.1, 0.2, 0.3, 0.9238795, 0.3826834, 0, 0],
        [0.2, 0.1, 0.0, 0.7071068, 0, 0.7071068, 0],
    ])
    write_trajectory(f, times, poses)
    t2, p2 = read_trajectory(f)
    np.testing.assert_allclose(t2, times, atol=1e-4)
    np.testing.assert_allclose(p2, poses, atol=1e-6)


def test_trajectory_tum_order(tmp_path):
    """First data line of the identity pose must be true TUM
    (qx qy qz qw = 0 0 0 1) — NOT the reference's scalar-first bug
    (reference outputs/trajectory_writer.py:37-39)."""
    f = tmp_path / "traj.txt"
    with TrajectoryWriter(f) as w:
        w.write(0.0, np.array([0, 0, 0, 1.0, 0, 0, 0]))
    line = [ln for ln in f.read_text().splitlines()
            if not ln.startswith("#")][0]
    vals = [float(v) for v in line.split()]
    assert vals[4:8] == [0.0, 0.0, 0.0, 1.0]


def test_trajectory_reference_compat_mode(tmp_path):
    f = tmp_path / "traj.txt"
    with TrajectoryWriter(f, scalar_first=True) as w:
        w.write(0.0, np.array([0, 0, 0, 1.0, 0, 0, 0]))
    line = [ln for ln in f.read_text().splitlines()
            if not ln.startswith("#")][0]
    vals = [float(v) for v in line.split()]
    assert vals[4:8] == [1.0, 0.0, 0.0, 0.0]  # reference layout


def test_map_roundtrip(tmp_path):
    f = tmp_path / "map.txt"
    ids = np.array([3, 7, 12])
    pos = np.array([[0.1, 0.2, 2.0], [1.0, -0.5, 3.0], [0, 0, 1.0]])
    unc = np.array([[0.3, 0.3, 0.4], [1.1, 2.2, 3.3], [0.7, 0.7, 0.7]])
    save_map(f, ids, pos, unc)
    i2, p2, u2 = load_map(f)
    np.testing.assert_array_equal(i2, ids)
    np.testing.assert_allclose(p2, pos)
    np.testing.assert_allclose(u2, unc)


def test_npz_source_roundtrip(tmp_path):
    f = tmp_path / "seq.npz"
    save_npz(f, times=np.arange(5) / 30.0,
             t_cl=np.zeros((5, 4, 3)), mask=np.zeros((5, 4), bool))
    src = NpzSource(f)
    assert len(src) == 5
    assert src.has("t_cl") and not src.has("corners")


def test_npz_source_requires_times(tmp_path):
    f = tmp_path / "bad.npz"
    save_npz(f, t_cl=np.zeros((5, 4, 3)))
    with pytest.raises(ValueError, match="times"):
        NpzSource(f)


@pytest.fixture(scope="module")
def seq_file(tmp_path_factory):
    from aruco_slam_tpu.apps import make_synthetic
    path = tmp_path_factory.mktemp("seq") / "seq.npz"
    make_synthetic.main(["--out", str(path), "--frames", "40",
                         "--markers", "8", "--noise-px", "0.3"])
    return path


@pytest.mark.parametrize("filt", ["mekf", "mekf_rotations", "factorgraph"])
def test_run_slam_end_to_end(seq_file, tmp_path, filt):
    from aruco_slam_tpu.apps import run_slam
    traj = tmp_path / "traj.txt"
    mp = tmp_path / "map.txt"
    run_slam.main(["--input", str(seq_file), "--filter", filt,
                   "--trajectory", str(traj), "--map", str(mp)])
    times, poses = read_trajectory(traj)
    assert len(times) == 40
    assert np.isfinite(poses).all()
    ids, pos, unc = load_map(mp)
    assert len(ids) >= 1
    assert np.isfinite(pos).all()


def test_run_offline_end_to_end(seq_file, tmp_path):
    from aruco_slam_tpu.apps import run_offline
    traj = tmp_path / "traj.txt"
    mp = tmp_path / "map.txt"
    run_offline.main(["--input", str(seq_file), "--trajectory",
                      str(traj), "--map", str(mp), "--iters", "15"])
    times, poses = read_trajectory(traj)
    assert len(times) == 40
    assert np.isfinite(poses).all()


@pytest.mark.parametrize("filt", ["mekf", "factorgraph"])
def test_checkpoint_resume_matches_uninterrupted(seq_file, tmp_path,
                                                 filt):
    """A killed-and-resumed run must produce the same trajectory as an
    uninterrupted checkpointing run, bitwise (SURVEY.md §5 'TPU build:
    real checkpointing'; the reference has no mid-run persistence)."""
    from aruco_slam_tpu.apps import run_slam
    ckpt = tmp_path / "ck.npz"
    t_full, t_res = tmp_path / "full.txt", tmp_path / "res.txt"

    # uninterrupted run, checkpointing every 10 frames
    run_slam.main(["--input", str(seq_file), "--filter", filt,
                   "--trajectory", str(t_full),
                   "--map", str(tmp_path / "m1.txt"),
                   "--checkpoint-every", "10",
                   "--checkpoint", str(ckpt)])
    assert ckpt.exists()
    # "killed" at frame 30: resume from the last checkpoint and finish
    run_slam.main(["--input", str(seq_file), "--filter", filt,
                   "--trajectory", str(t_res),
                   "--map", str(tmp_path / "m2.txt"),
                   "--checkpoint-every", "10",
                   "--checkpoint", str(tmp_path / "ck2.npz"),
                   "--resume", str(ckpt)])
    _, full = read_trajectory(t_full)
    _, res = read_trajectory(t_res)
    np.testing.assert_array_equal(res, full)


def test_offline_checkpoint_resume_matches(seq_file, tmp_path):
    """run_offline pass-1 ingest checkpoints and resumes bit-exactly:
    a killed-and-resumed offline run must write the same trajectory as
    an uninterrupted one (VERDICT r2: the offline driver's per-frame
    ingest + long LM solve previously lost everything on a kill)."""
    from aruco_slam_tpu.apps import run_offline
    ckpt = tmp_path / "ck.npz"
    t_full, t_res = tmp_path / "full.txt", tmp_path / "res.txt"
    common = ["--input", str(seq_file), "--iters", "10"]
    run_offline.main(common + ["--trajectory", str(t_full),
                               "--map", str(tmp_path / "m1.txt"),
                               "--checkpoint-every", "10",
                               "--checkpoint", str(ckpt)])
    assert ckpt.exists()
    # "killed" after frame 30: resume from the last checkpoint
    run_offline.main(common + ["--trajectory", str(t_res),
                               "--map", str(tmp_path / "m2.txt"),
                               "--resume", str(ckpt)])
    _, full = read_trajectory(t_full)
    _, res = read_trajectory(t_res)
    np.testing.assert_array_equal(res, full)


@pytest.fixture(scope="module")
def image_seq_file(tmp_path_factory):
    """Small image-bearing bundle: real rendered frames for the viz
    sinks."""
    from aruco_slam_tpu.apps import make_synthetic
    from aruco_slam_tpu.io import sources
    path = tmp_path_factory.mktemp("imgseq") / "seq.npz"
    k = np.array([[530.0, 0.0, 360.0], [0.0, 530.0, 202.0],
                  [0.0, 0.0, 1.0]])
    bundle = make_synthetic.build(
        frames=6, markers=6, capacity=16, noise_px=0.2,
        camera_matrix=k, dist_coeffs=np.zeros(5), with_images=True,
        image_size=(720, 405))
    sources.save_npz(path, **bundle)
    return path


def test_run_slam_viz_real_frames(image_seq_file, tmp_path):
    """--viz-2d must overlay the ACTUAL rendered frame (the reference
    draws on the real video frame, reference viewers/viewer_2d.py:64),
    not a blank canvas; --viz-3d and --export-video must emit their
    artifacts."""
    import imageio.v3 as iio
    from aruco_slam_tpu.apps import run_slam
    viz = tmp_path / "viz"
    run_slam.main(["--input", str(image_seq_file),
                   "--trajectory", str(tmp_path / "t.txt"),
                   "--map", str(tmp_path / "m.txt"),
                   "--viz-2d", "--viz-3d", "--export-video",
                   "--viz-dir", str(viz)])
    pngs2d = sorted((viz / "2d").glob("frame_*.png"))
    pngs3d = sorted((viz / "3d").glob("map_*.png"))
    assert len(pngs2d) == 6 and len(pngs3d) == 6
    img = iio.imread(pngs2d[2])
    # the rendered scene background is mid-gray (~178): a blank-canvas
    # regression would leave most pixels at 0
    assert np.mean(img) > 60, "2D overlay lost the real frame"
    assert (viz / "2d.mp4").stat().st_size > 0
    assert (viz / "3d.mp4").stat().st_size > 0


def test_viewer2d_marker_outline_and_id_label():
    """drawDetectedMarkers parity (VERDICT r4 #6, reference
    filters/base_filter.py:198): a detection carrying a marker id must
    render the green square outline and the id's digits in the id
    color at the marker's top-left corner."""
    import jax.numpy as jnp

    from aruco_slam_tpu.core import camera as cam_mod
    from aruco_slam_tpu.viz import draw
    from aruco_slam_tpu.viz.viewer2d import (
        ID_COLOR, OUTLINE_COLOR, Viewer2D)

    k = np.array([[500.0, 0.0, 480.0], [0.0, 500.0, 270.0],
                  [0.0, 0.0, 1.0]])
    cam = cam_mod.CameraModel.from_matrix(
        jnp.asarray(k), jnp.zeros(5))
    # display_size == frame size: no resample between draw and assert
    v = Viewer2D(cam, display_size=(960, 540), marker_size=0.16)
    frame = np.zeros((540, 960), np.uint8)
    t_cl = np.array([0.15, 0.1, 1.2])
    q_cl = np.array([1.0, 0.0, 0.0, 0.0])      # identity, wxyz
    pose = np.array([0, 0, 0, 1.0, 0, 0, 0])
    out = v.view(frame, pose, np.zeros((0, 3)), [(t_cl, q_cl, 42)])

    # expected top-left corner pixel (IPPE corner 0 = (-s, +s, 0))
    s = 0.08
    tl = np.asarray(cam_mod.project(
        cam, jnp.asarray(t_cl + np.array([-s, s, 0.0]))))
    # id digits: the exact glyph mask of "42" at tl + (8, 8)
    m = draw.glyph_mask("42", 3)
    x0, y0 = int(round(tl[0] + 8)), int(round(tl[1] + 8))
    region = out[y0:y0 + m.shape[0], x0:x0 + m.shape[1]]
    assert region.shape[:2] == m.shape, "label fell off the frame"
    assert (region[m] == ID_COLOR).all(), "id digits not rendered"
    # outline: green border pixels at an edge midpoint
    br = np.asarray(cam_mod.project(
        cam, jnp.asarray(t_cl + np.array([s, -s, 0.0]))))
    mid_right = ((tl + np.array([2 * s * 500 / 1.2, 0]) + br) / 2)
    ys, xs = int(round(mid_right[1])), int(round(mid_right[0]))
    patch = out[ys - 3:ys + 4, xs - 3:xs + 4].reshape(-1, 3)
    assert (patch == np.array(OUTLINE_COLOR)).all(1).any(), \
        "marker outline not rendered"


@pytest.mark.parametrize("filt", ["mekf", "factorgraph"])
def test_display_quit_key_stops_run(image_seq_file, tmp_path,
                                    monkeypatch, filt):
    """'q' in the live --display window must end the RUN (the
    reference's loop breaks when the 2D viewer reports quit, reference
    main/run_slam.py:127-141), not merely stop rendering. cv2 is
    stubbed to report 'q' on the first frame."""
    import sys
    import types
    fake_cv2 = types.SimpleNamespace(
        imshow=lambda *a, **k: None,
        waitKey=lambda ms: ord("q"),
        destroyAllWindows=lambda: None)
    monkeypatch.setitem(sys.modules, "cv2", fake_cv2)
    monkeypatch.setenv("DISPLAY", ":0")
    from aruco_slam_tpu.apps import run_slam
    traj = tmp_path / "t.txt"
    run_slam.main(["--input", str(image_seq_file), "--display",
                   "--filter", filt,
                   "--trajectory", str(traj),
                   "--map", str(tmp_path / "m.txt"),
                   "--viz-dir", str(tmp_path / "viz")])
    times, poses = read_trajectory(traj)
    assert len(times) == 1, "quit key did not stop the run"


def test_display_3d_free_navigation(monkeypatch):
    """The live 3D window's free navigation (the reference's Pangolin
    Handler3D orbit/zoom/pan, reference viewers/viewer_3d.py:52-108):
    dragging orbits, the wheel zooms, right-drag pans — each changing
    the view matrix — and 'f' returns to the follow camera."""
    import sys
    import types
    cbs = {}
    fake_cv2 = types.SimpleNamespace(
        imshow=lambda *a, **k: None,
        waitKey=lambda ms: 255,
        destroyAllWindows=lambda: None,
        setMouseCallback=lambda win, cb: cbs.__setitem__("cb", cb),
        EVENT_MOUSEMOVE=0, EVENT_LBUTTONDOWN=1, EVENT_RBUTTONDOWN=2,
        EVENT_MOUSEWHEEL=10, EVENT_FLAG_LBUTTON=1, EVENT_FLAG_RBUTTON=2)
    monkeypatch.setitem(sys.modules, "cv2", fake_cv2)
    monkeypatch.setenv("DISPLAY", ":0")
    from aruco_slam_tpu.apps.sinks import Live3DDisplaySink
    s = Live3DDisplaySink()
    pose = np.array([0.2, 0.1, 0.5, 1.0, 0, 0, 0])
    s.view_frame(pose, np.zeros((0, 3)), [])
    assert "cb" in cbs
    assert s.current_view() is None          # follow mode by default
    cb = cbs["cb"]
    cb(fake_cv2.EVENT_LBUTTONDOWN, 100, 100, 0, None)
    cb(fake_cv2.EVENT_MOUSEMOVE, 140, 90,
       fake_cv2.EVENT_FLAG_LBUTTON, None)
    v1 = s.current_view()
    assert v1 is not None                    # drag entered free mode
    rv1, _ = v1
    cb(fake_cv2.EVENT_MOUSEMOVE, 180, 80,
       fake_cv2.EVENT_FLAG_LBUTTON, None)
    rv2, _ = s.current_view()
    assert not np.allclose(rv1, rv2)         # orbit moved the view
    r_before = s.free_view.radius
    cb(fake_cv2.EVENT_MOUSEWHEEL, 0, 0, 1, None)
    assert s.free_view.radius < r_before     # wheel zoomed in
    tgt_before = s.free_view.target.copy()
    cb(fake_cv2.EVENT_RBUTTONDOWN, 50, 50, 0, None)
    cb(fake_cv2.EVENT_MOUSEMOVE, 70, 60,
       fake_cv2.EVENT_FLAG_RBUTTON, None)
    assert not np.allclose(s.free_view.target, tgt_before)  # panned
    fake_cv2.waitKey = lambda ms: ord("f")   # toggle back to follow
    s.view_frame(pose, np.zeros((0, 3)), [])
    assert s.follow and s.current_view() is None


def test_run_offline_viz_replay(image_seq_file, tmp_path):
    """Offline pass-2 replay constructs viewers and feeds smoothed
    poses (reference main/run_offline.py:124-142)."""
    import imageio.v3 as iio
    from aruco_slam_tpu.apps import run_offline
    viz = tmp_path / "viz"
    run_offline.main(["--input", str(image_seq_file),
                      "--trajectory", str(tmp_path / "t.txt"),
                      "--map", str(tmp_path / "m.txt"),
                      "--iters", "5", "--viz-2d",
                      "--viz-dir", str(viz)])
    pngs = sorted((viz / "2d").glob("frame_*.png"))
    assert len(pngs) == 6
    assert np.mean(iio.imread(pngs[0])) > 60


def test_multi_stream_cli_matches_single(tmp_path):
    """`run_slam --input a.npz,b.npz` (multi-camera serving): fans S
    image streams through the batched pixels->pose pipeline with
    per-stream id->slot tables, and each stream's trajectory/map must
    match the single-stream run of that input (the offline fleet CLI
    guarantee, applied to the ONLINE driver — VERDICT r3 #2)."""
    from aruco_slam_tpu.apps import make_synthetic, run_slam
    from aruco_slam_tpu.io import sources
    k = np.array([[530.0, 0.0, 360.0], [0.0, 530.0, 202.0],
                  [0.0, 0.0, 1.0]])
    paths = []
    for i in range(2):
        bundle = make_synthetic.build(
            frames=6, markers=6, capacity=16, noise_px=0.2, seed=i,
            camera_matrix=k, dist_coeffs=np.zeros(5), with_images=True,
            image_size=(720, 405))
        p = tmp_path / f"s{i}.npz"
        sources.save_npz(p, **bundle)
        paths.append(p)
    run_slam.main(["--input", ",".join(str(p) for p in paths),
                   "--trajectory", str(tmp_path / "traj.txt"),
                   "--map", str(tmp_path / "map.txt"),
                   "--max-obs", "16"])
    for i in range(2):
        ts, fleet = read_trajectory(tmp_path / f"traj_s{i}.txt")
        assert len(ts) == 6 and np.isfinite(fleet).all()
        t1 = tmp_path / f"one{i}.txt"
        run_slam.main(["--input", str(paths[i]),
                       "--trajectory", str(t1),
                       "--map", str(tmp_path / f"mone{i}.txt"),
                       "--max-obs", "16"])
        _, single = read_trajectory(t1)
        # f32 fusion order differs slightly under vmap: ~1e-5 m noise
        np.testing.assert_allclose(fleet, single, atol=1e-4)
        ids_f, pos_f, _ = load_map(tmp_path / f"map_s{i}.txt")
        ids_s, pos_s, _ = load_map(tmp_path / f"mone{i}.txt")
        np.testing.assert_array_equal(ids_f, ids_s)
        np.testing.assert_allclose(pos_f, pos_s, atol=2e-3)


def test_run_slam_video_input(tmp_path):
    """Video-file input: decode (host) -> image-domain detection ->
    PnP -> MEKF — the reference's primary input path (reference
    main/run_slam.py:96-121). Skipped when no video backend exists."""
    cv2 = pytest.importorskip("cv2")
    import jax.numpy as jnp
    from aruco_slam_tpu.bench import render, synthetic
    from aruco_slam_tpu.core import camera as cam_mod

    size = (960, 540)
    k = np.array([[707.0, 0.0, 480.0], [0.0, 707.0, 270.0],
                  [0.0, 0.0, 1.0]])
    cam = cam_mod.CameraModel.from_matrix(jnp.asarray(k), jnp.zeros(5))
    scene = synthetic.make_wall_scene(num_markers=8, seed=0)
    traj = synthetic.make_orbit_trajectory(num_frames=6)
    frames = np.asarray(render.render_sequence(
        scene, traj, cam, image_size=size))
    vpath = tmp_path / "seq.mp4"
    vw = cv2.VideoWriter(str(vpath), cv2.VideoWriter_fourcc(*"mp4v"),
                         30, size)
    for g in frames:
        vw.write(cv2.cvtColor(g, cv2.COLOR_GRAY2BGR))
    vw.release()

    from aruco_slam_tpu.apps import run_slam
    tfile, mfile = tmp_path / "traj.txt", tmp_path / "map.txt"
    calib = tmp_path / "calib"
    calib.mkdir()
    np.save(calib / "camera_matrix.npy", k)
    np.save(calib / "dist_coeffs.npy", np.zeros(5))
    run_slam.main(["--input", str(vpath), "--calib", str(calib),
                   "--trajectory", str(tfile), "--map", str(mfile)])
    times, poses = read_trajectory(tfile)
    assert len(times) == 6
    assert np.isfinite(poses).all()
    ids, _, _ = load_map(mfile)
    assert len(ids) >= 1


def test_run_slam_high_id_dictionary(tmp_path):
    """Full image pipeline on dict_5x5_1000 with marker ids around
    900 at DEFAULT capacity: the id->slot table sizes state by markers
    present, and the map file records the TRUE dictionary ids
    (VERDICT r2: slot==id coupled state size to the dictionary)."""
    from aruco_slam_tpu.apps import make_synthetic, run_slam
    from aruco_slam_tpu.io import sources
    k = np.array([[530.0, 0.0, 360.0], [0.0, 530.0, 202.0],
                  [0.0, 0.0, 1.0]])
    high_ids = np.arange(6) * 7 + 900           # 900, 907, ... 935
    bundle = make_synthetic.build(
        frames=6, markers=6, capacity=16, camera_matrix=k,
        dist_coeffs=np.zeros(5), with_images=True,
        image_size=(720, 405), dict_name="dict_5x5_1000",
        marker_ids=high_ids)
    path = tmp_path / "seq.npz"
    sources.save_npz(path, **bundle)
    mfile = tmp_path / "m.txt"
    run_slam.main(["--input", str(path), "--dict", "dict_5x5_1000",
                   "--trajectory", str(tmp_path / "t.txt"),
                   "--map", str(mfile)])
    ids, pos, _ = load_map(mfile)
    assert len(ids) >= 4
    assert set(ids.tolist()) <= set(high_ids.tolist()), ids
    assert np.isfinite(pos).all()


def test_run_slam_tracked_streaming(tmp_path):
    """--track-every K on an image-bearing bundle with video-rate
    motion: the streaming front end (full sweep 2 of K frames +
    decode-validated tracking) must carry its state across ingest
    chunks and land the same outputs as the per-frame path."""
    from aruco_slam_tpu.apps import make_synthetic, run_slam
    from aruco_slam_tpu.io import sources
    k = np.array([[530.0, 0.0, 360.0], [0.0, 530.0, 202.0],
                  [0.0, 0.0, 1.0]])
    bundle = make_synthetic.build(
        frames=12, markers=6, capacity=16, camera_matrix=k,
        dist_coeffs=np.zeros(5), with_images=True,
        image_size=(720, 405), orbit_frames=120)
    path = tmp_path / "seq.npz"
    sources.save_npz(path, **bundle)
    run_slam.main(["--input", str(path), "--track-every", "4",
                   "--trajectory", str(tmp_path / "t.txt"),
                   "--map", str(tmp_path / "m.txt")])
    rows = np.loadtxt(tmp_path / "t.txt")
    assert rows.shape == (12, 8)
    err = np.linalg.norm(rows[:, 1:4] - bundle["gt_cam_t"], axis=1)
    assert err.mean() < 0.5, err.mean()


def test_render3d_follow_view_content():
    """The fast raster 3D renderer (the live follow-camera window's
    engine, reference viewers/viewer_3d.py:52-108 parity): a landmark
    straight ahead of the camera must land near the image center of
    the chase view, in landmark blue; the frustum must draw."""
    from aruco_slam_tpu.viz.render3d import render_map_frame
    cam_pose = np.array([0, 0, 0, 1.0, 0, 0, 0])
    traj = np.array([[0, 0, -0.5], [0, 0, 0]])
    pts = np.array([[0.0, 0.0, 2.0]])
    img = render_map_frame(cam_pose, traj, pts, size=(240, 320))
    assert img.shape == (240, 320, 3)
    # landmark blue (B=220) near center: search the middle third
    mid = img[80:160, 107:214]
    blue = (mid[..., 2] > 180) & (mid[..., 0] < 120)
    assert blue.any(), "landmark did not render near the view center"
    # some dark frustum pixels somewhere
    dark = (img < 80).all(-1)
    assert dark.any(), "frustum edges missing"
    # empty scene must not crash (scene_view fallback)
    img2 = render_map_frame(cam_pose, np.zeros((0, 3)),
                            np.zeros((0, 3)), follow=False)
    assert img2.shape == (480, 640, 3)


def test_display_opens_both_windows(image_seq_file, tmp_path,
                                    monkeypatch):
    """--display opens the live 2D overlay AND the live 3D
    follow-camera map (the reference opens a cv2 window and a Pangolin
    window side by side, reference main/run_slam.py:96-121)."""
    import sys
    import types
    shown = []
    fake_cv2 = types.SimpleNamespace(
        imshow=lambda name, img: shown.append((name, img.shape)),
        waitKey=lambda ms: 255,
        destroyAllWindows=lambda: None)
    monkeypatch.setitem(sys.modules, "cv2", fake_cv2)
    monkeypatch.setenv("DISPLAY", ":0")
    from aruco_slam_tpu.apps import run_slam
    run_slam.main(["--input", str(image_seq_file), "--display",
                   "--trajectory", str(tmp_path / "t.txt"),
                   "--map", str(tmp_path / "m.txt"),
                   "--viz-dir", str(tmp_path / "viz")])
    names = {n for n, _ in shown}
    assert names == {"aruco_slam_tpu", "aruco_slam_tpu 3d"}, names
    n3d = sum(1 for n, _ in shown if n.endswith("3d"))
    assert n3d == 6, n3d  # every frame reached the 3D window


def test_viz3d_fast_renderer(image_seq_file, tmp_path):
    """--viz-3d-renderer fast: the raster 3D exporter writes the same
    artifact set as the matplotlib path at ~25x less per-frame cost."""
    import imageio.v3 as iio
    from aruco_slam_tpu.apps import run_slam
    viz = tmp_path / "viz"
    run_slam.main(["--input", str(image_seq_file),
                   "--trajectory", str(tmp_path / "t.txt"),
                   "--map", str(tmp_path / "m.txt"),
                   "--viz-3d", "--viz-3d-renderer", "fast",
                   "--export-video", "--viz-dir", str(viz)])
    pngs = sorted((viz / "3d").glob("map_*.png"))
    assert len(pngs) == 6
    img = iio.imread(pngs[-1])
    # landmark/trajectory ink on the light background
    assert (img < 200).any(axis=-1).mean() > 0.0005
    assert (viz / "3d.mp4").stat().st_size > 0
