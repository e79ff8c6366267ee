"""Landmark/slot recycling: LRU id->slot table eviction + filter reset.

The reference registers landmarks unboundedly (reference
filters/extended_kalman_filter.py:239-290), so a trajectory can meet
any number of distinct markers. Our capacity+mask state is bounded;
`ops/detect.assign_slots_lru` recycles slots whose marker went
unobserved for more than `slot_max_age` frames, and
`FrameObservations.reset` makes the MEKF re-initialize the recycled
landmark. These tests cover the eviction mechanics, a corridor-style
run traversing 2x capacity distinct markers with bounded ATE, and the
product CLI path (run_slam --slot-max-age).
"""

import numpy as np
import jax.numpy as jnp
import pytest

from aruco_slam_tpu.ops import detect


def _cands(ids, k=8, score0=100):
    """Synthetic decoded-candidate arrays for assign_slots_lru."""
    ids = list(ids)
    cand_ids = np.full(k, -1, np.int32)
    cand_ids[:len(ids)] = ids
    decoded = cand_ids >= 0
    score = np.where(decoded, score0, 0).astype(np.int32)
    canon = np.zeros((k, 4, 2), np.float32)
    return (jnp.asarray(canon), jnp.asarray(cand_ids),
            jnp.asarray(decoded), jnp.asarray(score))


class TestAssignSlotsLru:
    def test_no_eviction_while_fresh(self):
        """A full table with FRESH slots drops new ids (counted) even
        with recycling enabled — eviction needs staleness."""
        table = jnp.asarray([10, 11], jnp.int32)
        seen = jnp.asarray([4, 4], jnp.int32)
        _, m, table2, _, ev, dropped = detect.assign_slots_lru(
            table, seen, 5, 3, *_cands([12]))
        assert int(dropped) == 1 and not bool(ev.any())
        np.testing.assert_array_equal(np.asarray(table2), [10, 11])

    def test_evicts_stalest_slot(self):
        table = jnp.asarray([10, 11, 12], jnp.int32)
        seen = jnp.asarray([8, 2, 5], jnp.int32)   # slot 1 stalest
        _, m, table2, seen2, ev, dropped = detect.assign_slots_lru(
            table, seen, 10, 3, *_cands([77]))
        assert int(dropped) == 0
        np.testing.assert_array_equal(np.asarray(ev),
                                      [False, True, False])
        np.testing.assert_array_equal(np.asarray(table2), [10, 77, 12])
        assert int(seen2[1]) == 10                 # claimed = seen now

    def test_free_slots_claimed_before_eviction(self):
        table = jnp.asarray([10, -1, 12], jnp.int32)
        seen = jnp.asarray([0, 0, 0], jnp.int32)   # all ancient
        _, _, table2, _, ev, _ = detect.assign_slots_lru(
            table, seen, 9, 3, *_cands([77]))
        assert not bool(ev.any())                  # used the free slot
        np.testing.assert_array_equal(np.asarray(table2), [10, 77, 12])

    def test_observed_slot_is_protected(self):
        """A slot observed THIS frame is never evicted, however stale
        its last_seen is."""
        table = jnp.asarray([10, 11], jnp.int32)
        seen = jnp.asarray([0, 5], jnp.int32)      # slot 0 ancient
        # candidate set observes id 10 (slot 0) and introduces id 77
        _, m, table2, _, ev, dropped = detect.assign_slots_lru(
            table, seen, 20, 3, *_cands([10, 77]))
        # slot 0 is protected by its observation; slot 1 is stale
        np.testing.assert_array_equal(np.asarray(table2), [10, 77])
        np.testing.assert_array_equal(np.asarray(ev), [False, True])
        assert int(dropped) == 0

    def test_max_age_zero_matches_assign_slots(self):
        """max_age=0 must reproduce assign_slots exactly (plus the
        drop count)."""
        table = jnp.asarray([5, -1, -1], jnp.int32)
        seen = jnp.zeros(3, jnp.int32)
        args = _cands([5, 9, 9, 3, 4])  # dup id 9; needs 3 new slots
        c1, m1, t1 = detect.assign_slots(table, *args)
        c2, m2, t2, _, ev, dr = detect.assign_slots_lru(
            table, seen, 50, 0, *args)
        np.testing.assert_array_equal(np.asarray(m1), np.asarray(m2))
        np.testing.assert_array_equal(np.asarray(t1), np.asarray(t2))
        np.testing.assert_array_equal(np.asarray(c1), np.asarray(c2))
        assert int(dr) == 1 and not bool(ev.any())  # id 4 dropped


def test_corridor_recycles_and_keeps_ate_bounded():
    """Corridor run: 128 distinct markers traversed at capacity 64
    (VERDICT r3 #4 'done' condition). With recycling the table keeps
    mapping (zero saturated drops) and the MEKF — fed the reset
    flags — matches the ATE of an UNBOUNDED-capacity run of the same
    corridor (measured identical to 3 decimals); without recycling the
    second half of the corridor cannot register at all. The absolute
    ATE bound is the no-loop-closure drift of a 31 m corridor (<5% of
    path length), not recycling cost."""
    from aruco_slam_tpu.filters import (
        FrameObservations, MekfConfig, init_state, mekf_step)
    from aruco_slam_tpu.filters import mekf as mekf_mod

    n_markers, cap, t_frames = 128, 64, 256
    j = np.arange(n_markers)
    # corridor wall, NON-collinear (alternating height/depth: a line
    # of point landmarks cannot constrain camera orientation)
    lm_w = np.stack([j * 0.25,
                     0.8 * (-1.0) ** j,
                     2.0 + 0.3 * (j % 3)], axis=1)
    cam_x = np.linspace(0.0, 31.0, t_frames)

    def run(capacity, max_age):
        rng = np.random.default_rng(0)
        cfg = MekfConfig(capacity=capacity, max_obs=32,
                         motion_model="cv")
        state = init_state(cfg)
        table = detect.slot_table_init(capacity)
        seen = jnp.zeros(capacity, jnp.int32)
        traj = np.zeros((t_frames, 3))
        dropped_total = 0
        for i in range(t_frames):
            vis = np.where(np.abs(lm_w[:, 0] - cam_x[i]) < 2.5)[0]
            _, m, table, seen, ev, dr = detect.assign_slots_lru(
                table, seen, i, max_age, *_cands(vis.tolist(), k=32))
            dropped_total += int(dr)
            tbl = np.asarray(table)
            msk = np.asarray(m)
            t_cl = np.zeros((capacity, 3), np.float32)
            for s in np.where(msk)[0]:
                t_cl[s] = (lm_w[tbl[s]]
                           - np.array([cam_x[i], 0.0, 0.0])
                           + rng.normal(0, 0.003, 3))
            obs = FrameObservations(
                t_cl=jnp.asarray(t_cl),
                q_cl=jnp.tile(jnp.asarray([1.0, 0, 0, 0], jnp.float32),
                              (capacity, 1)),
                mask=jnp.asarray(msk),
                reset=jnp.asarray(np.asarray(ev)))
            state = mekf_step(cfg, state, obs)
            traj[i] = np.asarray(mekf_mod.camera_pose(state))[:3]
        gt = np.stack([cam_x, np.zeros(t_frames),
                       np.zeros(t_frames)], axis=1)
        ate = float(np.sqrt(((traj - gt) ** 2).sum(1).mean()))
        return ate, dropped_total, set(np.asarray(table).tolist())

    ate, dropped, final_ids = run(cap, max_age=20)
    assert dropped == 0, "recycling must absorb every new marker"
    # the final table holds the corridor's LAST cohort, not the first
    assert max(final_ids) == n_markers - 1
    assert min(i for i in final_ids if i >= 0) >= cap // 2
    # recycling at half capacity must not cost accuracy vs a table
    # big enough to never recycle
    ate_gold, d_gold, _ = run(n_markers, max_age=0)
    assert d_gold == 0
    assert ate <= ate_gold * 1.1 + 0.05, (ate, ate_gold)
    assert ate < 0.05 * 31.0, f"corridor ATE {ate:.3f} m unbounded"

    _, dropped0, _ = run(cap, max_age=0)
    assert dropped0 > 0, "without recycling the table must saturate"


def _two_cohort_sequence(tmp_path, frames=6):
    """Image sequence whose marker cohort changes mid-run: cohort A
    (ids 0-4) then cohort B (ids 20-24), too many for capacity 5."""
    from aruco_slam_tpu.apps import make_synthetic
    from aruco_slam_tpu.io import sources

    k = np.array([[530.0, 0.0, 360.0], [0.0, 530.0, 202.0],
                  [0.0, 0.0, 1.0]])
    a = make_synthetic.build(
        frames=frames, markers=5, capacity=16, noise_px=0.2, seed=0,
        camera_matrix=k, dist_coeffs=np.zeros(5), with_images=True,
        image_size=(720, 405), marker_ids=np.arange(5))
    b = make_synthetic.build(
        frames=frames, markers=5, capacity=16, noise_px=0.2, seed=1,
        camera_matrix=k, dist_coeffs=np.zeros(5), with_images=True,
        image_size=(720, 405), marker_ids=np.arange(5) + 20)
    seq = dict(a)
    seq["images"] = np.concatenate([a["images"], b["images"]])
    seq["times"] = np.concatenate(
        [a["times"], a["times"][-1] + 0.04 + b["times"]])
    for key in ("gt_cam_t", "gt_cam_q"):
        if key in a and key in b:
            seq[key] = np.concatenate([a[key], b[key]])
    path = tmp_path / "corridor.npz"
    sources.save_npz(path, **seq)
    return path


def test_run_offline_epoch_split_recycling(tmp_path):
    """Offline BA + slot recycling (VERDICT r4 #4): a recycled slot
    must open a FRESH landmark column, never merge two physical
    markers into one. The two-cohort corridor at capacity 5 forces
    every slot to recycle; the epoch-split solve must produce one map
    entry per marker of BOTH cohorts (the online filter forgets the
    evicted cohort — offline smoothing keeps every epoch), with
    positions matching a capacity-16 run that never recycles."""
    from aruco_slam_tpu.apps import run_offline
    from aruco_slam_tpu.io import load_map

    path = _two_cohort_sequence(tmp_path)

    def solve(tag, extra):
        mp = tmp_path / f"map_{tag}.txt"
        run_offline.main(["--input", str(path),
                          "--trajectory", str(tmp_path / f"t_{tag}.txt"),
                          "--map", str(mp), "--iters", "15"] + extra)
        ids, pos, _ = load_map(mp)
        return {int(i): p for i, p in zip(ids, pos)}

    rec = solve("rec", ["--capacity", "5", "--slot-max-age", "1"])
    # epoch 0 (cohort A) survives in the MAP even though the online
    # table evicted it, and recycled slots map cohort B under TRUE ids
    assert set(range(5)) <= set(rec), rec.keys()
    assert len(set(rec) & set(range(20, 25))) >= 3, rec.keys()
    assert all(np.isfinite(p).all() for p in rec.values())
    # no two-markers-one-landmark merge: every recycled-run landmark
    # matches the landmark of the SAME id in a capacity-16 run that
    # never recycles
    gold = solve("gold", ["--capacity", "16"])
    assert set(rec) <= set(gold)
    for i in rec:
        np.testing.assert_allclose(rec[i], gold[i], atol=5e-3,
                                   err_msg=f"marker {i}")


def test_run_slam_slot_recycling_cli(tmp_path):
    """Product path: run_slam --slot-max-age on an image sequence
    whose marker cohort CHANGES mid-run at a capacity too small for
    both cohorts — the map must contain second-cohort ids (and the
    saturation warning machinery must not fire once recycling is on)."""
    from aruco_slam_tpu.apps import run_slam
    from aruco_slam_tpu.io import load_map

    path = _two_cohort_sequence(tmp_path)
    mp = tmp_path / "map.txt"
    run_slam.main(["--input", str(path), "--capacity", "5",
                   "--slot-max-age", "2",
                   "--trajectory", str(tmp_path / "t.txt"),
                   "--map", str(mp)])
    ids, pos, _ = load_map(mp)
    assert set(ids) & set(range(20, 25)), \
        "recycled slots must map the second cohort"
    assert np.isfinite(pos).all()


def test_run_slam_factorgraph_epoch_split_recycling(tmp_path):
    """Online factor graph + slot recycling: the graph keys landmarks
    by column and has no reset concept, so run_slam epoch-splits
    recycled slots into fresh columns exactly like run_offline (the
    same two-markers-one-landmark merge trap — VERDICT r4 #4 applied
    to the ONLINE graph backend)."""
    from aruco_slam_tpu.apps import run_slam
    from aruco_slam_tpu.io import load_map

    path = _two_cohort_sequence(tmp_path)
    mp = tmp_path / "map_fg.txt"
    run_slam.main(["--input", str(path), "--capacity", "5",
                   "--slot-max-age", "1", "--filter", "factorgraph",
                   "--trajectory", str(tmp_path / "t_fg.txt"),
                   "--map", str(mp)])
    ids, pos, _ = load_map(mp)
    ids = set(int(i) for i in ids)
    # both cohorts present as distinct landmarks under true ids
    assert set(range(5)) <= ids, ids
    assert len(ids & set(range(20, 25))) >= 3, ids
    assert np.isfinite(pos).all()


def test_multi_stream_slot_max_age_refuses(tmp_path):
    """--slot-max-age with multi-stream serving is not wired (the
    fleet detector has no LRU carry) — it must refuse loudly, never
    silently ignore recycling."""
    import pytest
    from aruco_slam_tpu.apps import run_slam

    with pytest.raises(SystemExit):
        run_slam.main(["--input", "a.npz,b.npz", "--slot-max-age", "9",
                       "--trajectory", str(tmp_path / "t.txt"),
                       "--map", str(tmp_path / "m.txt")])
