"""Fixed-lag smoother tests (solver/fixed_lag.py).

Ground-truth ladder: (1) with a window covering everything and no
marginalization the smoother IS batch GN — exact agreement; (2) pure
odometry through a sliding window must reproduce dead reckoning exactly
(marginalization of chain factors is information-lossless); (3) with loop
closures and marginalization the window estimate approximates the batch
solve over the SAME consumed factors to marginalization-approximation
level (the only approximation is the frozen linearization of consumed
factors)."""

import dataclasses

import jax.numpy as jnp
import numpy as np
import pytest

from pyslam_tpu.graph import build
from pyslam_tpu.io import synth
from pyslam_tpu.solver import Options, solve_auto
from pyslam_tpu.solver.fixed_lag import FixedLagSmoother


def _edges(data):
    return list(zip(map(int, data.edges_i), map(int, data.edges_j)))


def _drive(sm, data, n, add_loops=True):
    """Feed odometry + every loop closure that fits in the window; returns
    the factor row ids consumed (for the same-factor batch comparison)."""
    edges = _edges(data)
    chain = {(i, j): k for k, (i, j) in enumerate(edges)}
    sm.add_pose(data.T_init[0])
    used = []
    for t in range(1, n):
        k = chain[(t - 1, t)]
        sm.add_odometry(data.T_meas[k], data.sqrt_info[k])
        used.append(k)
        if add_loops:
            for k2, (i, j) in enumerate(edges):
                if j == t and i != t - 1 and i >= sm.first_id:
                    sm.add_factor(i, j, data.T_meas[k2], data.sqrt_info[k2])
                    used.append(k2)
        sm.update()
    return sorted(set(used))


class TestNoMarginalization:
    def test_equals_batch_gn(self):
        n = 12
        data = synth.se2_loop(n_poses=n, n_loops=4, seed=0)
        sm = FixedLagSmoother(
            window=n, kind="se2", gn_iters=8, dtype=jnp.float64, anchor_sqrt_info=1e6
        )
        _drive(sm, data, n)
        g = build.pose_graph(data, dtype=jnp.float64)
        s, _ = solve_auto(g, Options(method="gn", max_iters=20, min_cost_decrease=0.9999))
        np.testing.assert_allclose(
            sm.poses(), np.asarray(s.blocks["poses"].values), atol=5e-7
        )


class TestMarginalization:
    def test_pure_odometry_is_dead_reckoning(self):
        # chain-only: the posterior IS the integrated odometry; sliding the
        # window must not perturb it
        n = 20
        data = synth.se2_loop(n_poses=n, n_loops=0, seed=2)
        sm = FixedLagSmoother(window=5, kind="se2", gn_iters=4, dtype=jnp.float64)
        _drive(sm, data, n, add_loops=False)
        ids = list(sm.window_ids())
        np.testing.assert_allclose(sm.poses(), data.T_init[ids], atol=1e-9)

    def test_tracks_same_factor_batch(self):
        n = 60
        data = synth.se2_loop(n_poses=n, n_loops=30, seed=2)
        sm = FixedLagSmoother(
            window=10, kind="se2", gn_iters=4, dtype=jnp.float64, anchor_sqrt_info=1e5
        )
        used = np.asarray(_drive(sm, data, n))
        sub = dataclasses.replace(
            data,
            edges_i=data.edges_i[used],
            edges_j=data.edges_j[used],
            T_meas=data.T_meas[used],
            sqrt_info=data.sqrt_info[used],
        )
        g = build.pose_graph(sub, dtype=jnp.float64)
        s, _ = solve_auto(g, Options(method="gn", max_iters=40, min_cost_decrease=0.9999))
        T_b = np.asarray(s.blocks["poses"].values)
        ids = list(sm.window_ids())
        pos_err = np.linalg.norm(
            sm.poses()[:, :2, 2] - T_b[ids][:, :2, 2], axis=1
        ).max()
        # marginalization-approximation level (measured 0.0026 on this
        # sequence), far below both odometry drift (~0.4) and the map scale
        assert pos_err < 0.02

    def test_deterministic(self):
        # regression for the numpy<->device buffer-aliasing bug: two
        # identical runs must agree exactly (the bug showed nondeterministic
        # metre-scale jumps from mutated in-flight buffers)
        n = 40
        data = synth.se2_loop(n_poses=n, n_loops=20, seed=5)

        def run():
            sm = FixedLagSmoother(window=8, kind="se2", gn_iters=3, dtype=jnp.float64)
            _drive(sm, data, n)
            return sm.poses()

        np.testing.assert_array_equal(run(), run())

    def test_one_compile_per_structure(self):
        n = 30
        data = synth.se2_loop(n_poses=n, n_loops=10, seed=1)
        sm = FixedLagSmoother(window=6, kind="se2", gn_iters=2, dtype=jnp.float64)
        _drive(sm, data, n)
        assert sm._update_jit._cache_size() == 1
        assert sm._marg_jit._cache_size() == 1


class TestSE3:
    def test_se3_window_tracks_batch(self):
        n = 30
        data = synth.se3_sphere(n_poses=n, n_loops=8, seed=3)
        sm = FixedLagSmoother(
            window=8, kind="se3", gn_iters=4, dtype=jnp.float64, anchor_sqrt_info=1e4
        )
        used = np.asarray(_drive(sm, data, n))
        sub = dataclasses.replace(
            data,
            edges_i=data.edges_i[used],
            edges_j=data.edges_j[used],
            T_meas=data.T_meas[used],
            sqrt_info=data.sqrt_info[used],
        )
        g = build.pose_graph(sub, dtype=jnp.float64)
        s, _ = solve_auto(g, Options(method="gn", max_iters=40, min_cost_decrease=0.9999))
        T_b = np.asarray(s.blocks["poses"].values)
        ids = list(sm.window_ids())
        pos_err = np.linalg.norm(
            sm.poses()[:, :3, 3] - T_b[ids][:, :3, 3], axis=1
        ).max()
        assert pos_err < 0.05


class TestAPI:
    def test_out_of_window_factor_raises(self):
        data = synth.se2_loop(n_poses=20, n_loops=0, seed=0)
        sm = FixedLagSmoother(window=4, kind="se2", dtype=jnp.float64)
        _drive(sm, data, 10, add_loops=False)
        with pytest.raises(KeyError):
            sm.add_factor(0, 9, np.eye(3), np.eye(3))
        with pytest.raises(KeyError):
            sm.pose(0)
        assert sm.pose(9).shape == (3, 3)

    def test_capacity_exhaustion_raises(self):
        sm = FixedLagSmoother(window=4, kind="se2", capacity=2, dtype=jnp.float64)
        sm.add_pose(np.eye(3))
        sm.add_odometry(np.eye(3), np.eye(3))
        sm.add_odometry(np.eye(3), np.eye(3))
        with pytest.raises(RuntimeError):
            sm.add_odometry(np.eye(3), np.eye(3))


class TestFixedLagSim3:
    def test_sim3_window_tracks_batch(self):
        # scale-drifting monocular odometry + sim3 loop factors through the
        # sliding window: window-covers-all must equal batch GN (as se3)
        from pyslam_tpu.io import synth
        from pyslam_tpu.lie import sim3
        from pyslam_tpu.solver.fixed_lag import FixedLagSmoother

        data = synth.sim3_loop(
            n_poses=12, n_loops=2, scale_drift=0.01, odo_scale_std=0.005, seed=3
        )
        fl = FixedLagSmoother(window=12, kind="sim3", gn_iters=3)
        fl.add_pose(data.T_init[0])
        n_odo = 11
        for k in range(n_odo):
            fl.add_odometry(data.T_meas[k], data.sqrt_info[k])
        for e in range(n_odo, len(data.edges_i)):
            fl.add_factor(
                int(data.edges_i[e]), int(data.edges_j[e]),
                data.T_meas[e], data.sqrt_info[e],
            )
        for _ in range(6):
            fl.update()
        # compare against the batch solver over the same factors
        from pyslam_tpu.graph import build
        from pyslam_tpu.solver import Options, solve

        g = build.sim3_pose_graph(data, dtype=jnp.float64)
        g2, _ = solve(g, Options(method="lm", max_iters=40))
        T_batch = np.asarray(g2.blocks["poses"].values)
        T_win = fl.poses()
        err = np.abs(
            np.asarray(sim3.log(jnp.asarray(T_batch) @ sim3.inv(jnp.asarray(T_win))))
        )
        assert err.max() < 0.05


# ---------------------------------------------------------------------------
# FixedLagLandmarkSmoother (VIO-style window with landmark slots)
# ---------------------------------------------------------------------------
from pyslam_tpu.solver.fixed_lag import FixedLagLandmarkSmoother  # noqa: E402


def _drive_lm(sm, data, n):
    """Stream poses + landmark observations chronologically; returns the
    data-landmark-index -> smoother-landmark-id map."""
    chain = {(int(i), int(j)): k
             for k, (i, j) in enumerate(zip(data.edges_i, data.edges_j))}
    obs_by_pose = {}
    for k, pi in enumerate(data.obs_pose):
        obs_by_pose.setdefault(int(pi), []).append(k)
    lm_added = {}

    def feed(t):
        for k in obs_by_pose.get(t, []):
            lj = int(data.obs_lm[k])
            if lj not in lm_added:
                lm_added[lj] = sm.add_landmark(data.lm_init[lj])
            if lm_added[lj] in sm.landmark_ids():  # may have been evicted
                sm.add_observation(t, lm_added[lj], data.obs[k],
                                   data.obs_sqrt_info[k])

    sm.add_pose(data.T_init[0])
    feed(0)
    for t in range(1, n):
        sm.add_odometry(data.T_meas[chain[(t - 1, t)]],
                        data.sqrt_info[chain[(t - 1, t)]])
        feed(t)
        sm.update()
    return lm_added


class TestLandmarkWindowNoMarginalization:
    def test_equals_batch_gn(self):
        # window covers everything -> the smoother IS batch GN over the
        # two-block (pose + landmark) graph
        n = 12
        data = synth.landmark_slam_2d(n_poses=n, n_landmarks=8,
                                      obs_type="xy", seed=0)
        sm = FixedLagLandmarkSmoother(
            window=n, lm_slots=8, obs_kind="landmark_xy_se2", kind="se2",
            gn_iters=8, dtype=jnp.float64, anchor_sqrt_info=1e6)
        lm_added = _drive_lm(sm, data, n)
        for _ in range(3):
            sm.update()
        g = build.landmark_slam_2d(data, dtype=jnp.float64)
        s, _ = solve_auto(g, Options(method="gn", max_iters=25,
                                     min_cost_decrease=0.9999))
        np.testing.assert_allclose(
            sm.poses(), np.asarray(s.blocks["poses"].values), atol=5e-6)
        L_b = np.asarray(s.blocks["landmarks"].values)
        for lj, lid in lm_added.items():
            np.testing.assert_allclose(sm.landmark(lid), L_b[lj], atol=5e-6)


class TestLandmarkWindowMarginalization:
    def test_sliding_window_tracks_batch(self):
        # window 8 of 40 poses, 12 slots for 20 landmarks: pose AND landmark
        # marginalization both active; the window estimate must stay at
        # marginalization-approximation level of the batch solve (measured
        # 0.08), far below odometry drift (~0.39)
        n = 40
        data = synth.landmark_slam_2d(n_poses=n, n_landmarks=20,
                                      obs_type="xy", seed=1)
        sm = FixedLagLandmarkSmoother(
            window=8, lm_slots=12, obs_kind="landmark_xy_se2", kind="se2",
            gn_iters=4, dtype=jnp.float64, anchor_sqrt_info=1e5,
            obs_capacity=96)
        lm_added = _drive_lm(sm, data, n)
        g = build.landmark_slam_2d(data, dtype=jnp.float64)
        s, _ = solve_auto(g, Options(method="gn", max_iters=40,
                                     min_cost_decrease=0.9999))
        T_b = np.asarray(s.blocks["poses"].values)
        ids = list(sm.window_ids())
        pos_err = np.linalg.norm(
            sm.poses()[:, :2, 2] - T_b[ids][:, :2, 2], axis=1).max()
        drift = np.linalg.norm(
            data.T_init[ids][:, :2, 2] - T_b[ids][:, :2, 2], axis=1).max()
        assert pos_err < 0.15
        assert pos_err < drift / 3
        # live landmarks track the batch estimates too
        L_b = np.asarray(s.blocks["landmarks"].values)
        live = {lj: lid for lj, lid in lm_added.items()
                if lid in sm.landmark_ids()}
        assert live  # slot pool is live
        lme = max(np.linalg.norm(sm.landmark(lid) - L_b[lj])
                  for lj, lid in live.items())
        assert lme < 0.1

    def test_one_compile_per_structure(self):
        n = 30
        data = synth.landmark_slam_2d(n_poses=n, n_landmarks=16,
                                      obs_type="xy", seed=2)
        sm = FixedLagLandmarkSmoother(
            window=6, lm_slots=10, obs_kind="landmark_xy_se2", kind="se2",
            gn_iters=2, dtype=jnp.float64, obs_capacity=64)
        _drive_lm(sm, data, n)
        assert sm._update_jit._cache_size() == 1
        assert sm._marg_jit._cache_size() == 1
        # eviction ran (20 landmarks through 10 slots) on one executable
        assert sm._retire_jit is not None
        assert sm._retire_jit._cache_size() == 1

    def test_deterministic(self):
        n = 25
        data = synth.landmark_slam_2d(n_poses=n, n_landmarks=12,
                                      obs_type="xy", seed=3)

        def run():
            sm = FixedLagLandmarkSmoother(
                window=6, lm_slots=8, obs_kind="landmark_xy_se2", kind="se2",
                gn_iters=2, dtype=jnp.float64, obs_capacity=64)
            _drive_lm(sm, data, n)
            return sm.poses()

        np.testing.assert_array_equal(run(), run())

    def test_explicit_retire_and_slot_reuse(self):
        n = 10
        data = synth.landmark_slam_2d(n_poses=n, n_landmarks=6,
                                      obs_type="xy", seed=4)
        sm = FixedLagLandmarkSmoother(
            window=n, lm_slots=6, obs_kind="landmark_xy_se2", kind="se2",
            gn_iters=4, dtype=jnp.float64)
        lm_added = _drive_lm(sm, data, n)
        before = sm.poses()
        lid = lm_added[min(lm_added)]
        slot = sm._lm_id2slot[lid]
        sm.retire_landmark(lid)
        assert lid not in sm.landmark_ids()
        with pytest.raises(KeyError):
            sm.landmark(lid)
        # retirement preserves the information: window solution unchanged
        # to marginalization-approximation level
        sm.update()
        np.testing.assert_allclose(sm.poses(), before, atol=1e-3)
        # the freed slot is reused
        new_id = sm.add_landmark(np.zeros(2))
        assert sm._lm_id2slot[new_id] == slot


class TestLandmarkWindowSE3:
    def test_xyz_landmarks_window_tracks_truth(self):
        # small SE(3) circle observing xyz point landmarks (mocap-marker
        # model): sliding window stays near ground truth while raw odometry
        # drifts
        rng = np.random.default_rng(0)
        from pyslam_tpu.lie import se3 as se3_ops
        n, L = 24, 10
        angles = 2 * np.pi * np.arange(n) / n
        # world-to-body circle poses
        T_gt = []
        for a in angles:
            xi = np.array([0, 0, a, 2.0 * np.cos(a), 2.0 * np.sin(a), 0.0])
            # build body-to-world then invert
            Tbw = np.asarray(se3_ops.exp(jnp.asarray(
                np.concatenate([xi[3:], xi[:3]])[None]))[0])
            T_gt.append(np.linalg.inv(Tbw))
        T_gt = np.stack(T_gt)
        lms = rng.uniform(-3, 3, (L, 3))
        # odometry with noise
        si_o = np.eye(6) / 0.01
        T_init = [T_gt[0]]
        meas = []
        for t in range(1, n):
            Tm = T_gt[t] @ np.linalg.inv(T_gt[t - 1])
            noise = 0.01 * rng.standard_normal(6)
            Tm = np.asarray(se3_ops.exp(jnp.asarray(noise[None]))[0]) @ Tm
            meas.append(Tm)
            T_init.append(Tm @ T_init[-1])
        T_init = np.stack(T_init)
        si_l = np.eye(3) / 0.02
        sm = FixedLagLandmarkSmoother(
            window=8, lm_slots=L, obs_kind="landmark_xyz_se3", kind="se3",
            gn_iters=4, dtype=jnp.float64, anchor_sqrt_info=1e5,
            obs_capacity=8 * L)
        lid = {}
        def feed(t):
            for j in range(L):
                p = T_gt[t, :3, :3] @ lms[j] + T_gt[t, :3, 3]
                p = p + 0.02 * rng.standard_normal(3)
                if j not in lid:
                    # first-observation init through the odometry pose
                    Ti = np.linalg.inv(T_init[t])
                    lid[j] = sm.add_landmark(Ti[:3, :3] @ p + Ti[:3, 3])
                sm.add_observation(t, lid[j], p, si_l)
        sm.add_pose(T_init[0]); feed(0)
        for t in range(1, n):
            sm.add_odometry(meas[t - 1], si_o)
            feed(t)
            sm.update()
        ids = list(sm.window_ids())
        err = np.linalg.norm(sm.poses()[:, :3, 3] - T_gt[ids][:, :3, 3],
                             axis=1).max()
        drift = np.linalg.norm(T_init[ids][:, :3, 3] - T_gt[ids][:, :3, 3],
                               axis=1).max()
        assert err < 0.05
        assert err < drift  # landmark observations beat dead reckoning
        # landmark estimates converged near truth
        lerr = max(np.linalg.norm(sm.landmark(lid[j]) - lms[j])
                   for j in range(L))
        assert lerr < 0.05
