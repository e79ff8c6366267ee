"""Checkpoint round-trip, stage timers, native hostpipe."""

import numpy as np
import jax.numpy as jnp
import pytest

from aruco_slam_tpu.filters import (
    FrameObservations, MekfConfig, init_state, mekf_step)
from aruco_slam_tpu.graph import GraphConfig, add_frame, init_graph
from aruco_slam_tpu.utils.checkpoint import load_checkpoint, save_checkpoint


def test_mekf_checkpoint_roundtrip(tmp_path):
    cfg = MekfConfig(capacity=8)
    s = init_state(cfg)
    obs = FrameObservations(
        jnp.ones((8, 3)), jnp.tile(jnp.asarray([1.0, 0, 0, 0]), (8, 1)),
        jnp.asarray([True] * 3 + [False] * 5))
    s = mekf_step(cfg, s, obs)
    f = tmp_path / "ckpt.npz"
    save_checkpoint(f, s)
    s2 = load_checkpoint(f, init_state(cfg))
    for a, b in zip(s, s2):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    # resuming continues identically
    nxt_a = mekf_step(cfg, s, obs)
    nxt_b = mekf_step(cfg, s2, obs)
    np.testing.assert_array_equal(np.asarray(nxt_a.cov),
                                  np.asarray(nxt_b.cov))


def test_graph_checkpoint_roundtrip(tmp_path):
    cfg = GraphConfig(max_poses=8, max_landmarks=4, max_factors=16)
    s = init_graph(cfg)
    s = add_frame(cfg, s, jnp.asarray([[0.0, 0, 2]] * 4),
                  jnp.asarray([True, False, True, False]))
    f = tmp_path / "g.npz"
    save_checkpoint(f, s)
    s2 = load_checkpoint(f, init_graph(cfg))
    np.testing.assert_array_equal(np.asarray(s.f_tcl),
                                  np.asarray(s2.f_tcl))
    assert int(s2.num_poses) == int(s.num_poses)


def test_checkpoint_shape_mismatch_rejected(tmp_path):
    cfg = MekfConfig(capacity=8)
    save_checkpoint(tmp_path / "c.npz", init_state(cfg))
    with pytest.raises(ValueError):
        load_checkpoint(tmp_path / "c.npz", (jnp.zeros(3),))


def test_checkpoint_forward_migration_appended_leaf(tmp_path):
    """A checkpoint written before a state field was APPENDED (e.g.
    MekfState.dropped_obs) still resumes: missing trailing leaves fill
    from the template's defaults."""
    cfg = MekfConfig(capacity=8)
    s = init_state(cfg)
    leaves = list(jnp.asarray(np.asarray(x)) for x in s)
    old = tuple(leaves[:-1])  # pre-upgrade state: last field absent
    save_checkpoint(tmp_path / "old.npz", old)
    s2 = load_checkpoint(tmp_path / "old.npz", init_state(cfg))
    for a, b in zip(s[:-1], s2[:-1]):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    np.testing.assert_array_equal(np.asarray(s2[-1]),
                                  np.asarray(s[-1]))  # default-filled


def test_stage_timer():
    from aruco_slam_tpu.utils.profiling import StageTimer
    t = StageTimer()
    with t.stage("a") as out:
        out["result"] = jnp.ones(4) * 2
    assert t.counts["a"] == 1
    assert "a" in t.report()


# ---- native hostpipe ----

def test_native_gray_resize():
    from aruco_slam_tpu.io import native
    if native.get_lib() is None:
        pytest.skip("no toolchain")
    rng = np.random.default_rng(0)
    rgb = rng.integers(0, 255, size=(64, 96, 3), dtype=np.uint8)
    out = native.gray_resize(rgb, (32, 48))
    assert out.shape == (32, 48)
    # against the documented Rec.601 integer weights
    ys = np.arange(32) * 64 // 32
    xs = np.arange(48) * 96 // 48
    sub = rgb[ys][:, xs].astype(np.int64)
    expect = ((77 * sub[..., 0] + 150 * sub[..., 1]
               + 29 * sub[..., 2]) >> 8).astype(np.uint8)
    np.testing.assert_array_equal(out, expect)


def test_native_ring_roundtrip():
    from aruco_slam_tpu.io import native
    if native.get_lib() is None:
        pytest.skip("no toolchain")
    ring = native.FrameRing(capacity=4, frame_bytes=16)
    for i in range(3):
        assert ring.push(np.full(16, i, np.uint8))
    assert len(ring) == 3
    for i in range(3):
        out = ring.pop((16,))
        np.testing.assert_array_equal(out, np.full(16, i, np.uint8))
    ring.close()
    assert ring.pop((16,)) is None  # closed + drained


def test_native_prefetch_source():
    from aruco_slam_tpu.io import native
    if native.get_lib() is None:
        pytest.skip("no toolchain")

    def gen():
        for i in range(10):
            yield i / 30.0, np.full((8, 8), i, np.uint8)

    src = native.PrefetchingFrameSource(gen(), (8, 8), capacity=3)
    got = list(src)
    assert len(got) == 10
    assert got[5][1][0, 0] == 5
    assert abs(got[5][0] - 5 / 30.0) < 1e-9
