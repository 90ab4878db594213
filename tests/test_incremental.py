"""IncrementalSmoother (solver/incremental.py): growing-graph smoothing
with bucketed static shapes — per-step updates must match the batch solve
while compiling only O(log N) times."""

import jax.numpy as jnp
import numpy as np

from pyslam_tpu.graph import build
from pyslam_tpu.io import synth
from pyslam_tpu.lie import se2
from pyslam_tpu.solver import Options, solve
from pyslam_tpu.solver.incremental import IncrementalSmoother


def _feed(sm, data, upto):
    """Feed poses/edges of a PoseGraphData into the smoother up to pose
    ``upto`` (odometry init for new poses; all edges within range)."""
    while sm.n < upto:
        i = sm.n
        if i == 0:
            sm.add_pose(data.T_init[0])
        else:
            sm.add_pose(data.T_meas[i - 1] @ sm.poses()[i - 1])
            sm.add_between(i - 1, i, data.T_meas[i - 1], data.sqrt_info[i - 1])
    n_odo = data.T_init.shape[0] - 1
    for e in range(n_odo, len(data.edges_i)):
        i, j = int(data.edges_i[e]), int(data.edges_j[e])
        if max(i, j) < upto and (i, j) not in sm._added_loops:
            sm.add_between(i, j, data.T_meas[e], data.sqrt_info[e])
            sm._added_loops.add((i, j))


class TestIncremental:
    def test_matches_batch_with_log_compiles(self):
        data = synth.se2_loop(n_poses=60, n_loops=8, seed=2)
        sm = IncrementalSmoother(kind="se2", options=Options(method="lm", max_iters=15))
        sm._added_loops = set()
        for k in range(2, 61):
            _feed(sm, data, k)
            est, info = sm.update()
        # final incremental estimate == batch solve over the same factors
        g = build.pose_graph(data, dtype=jnp.float64)
        batch, _ = solve(g, Options(method="lm", max_iters=40))
        err = jnp.abs(
            se2.log(
                jnp.asarray(est) @ se2.inv(batch.blocks["poses"].values)
            )
        )
        assert float(jnp.max(err)) < 1e-3
        # 59 updates, geometric buckets: far fewer fresh executables than steps
        assert sm.compiles <= 14, sm.compiles

    def test_warm_start_converges_in_few_iters(self):
        data = synth.se2_loop(n_poses=40, n_loops=5, seed=3)
        sm = IncrementalSmoother(kind="se2", options=Options(method="lm", max_iters=15))
        sm._added_loops = set()
        iters = []
        for k in range(2, 41):
            _feed(sm, data, k)
            _, info = sm.update()
            iters.append(int(info.iterations))
        # warm starts keep per-step work well under the 15-iteration cap
        assert np.median(iters[5:]) <= 8

    def test_marginalize_oldest_keeps_tracking(self):
        data = synth.se2_loop(n_poses=50, n_loops=0, seed=4)  # pure odometry
        sm = IncrementalSmoother(kind="se2", options=Options(method="lm", max_iters=10))
        sm._added_loops = set()
        for k in range(2, 31):
            _feed(sm, data, k)
        sm.update()
        before = sm.poses()[-5:]
        sm.marginalize_oldest(keep_last=10)
        assert sm.n == 11  # gauge anchor + newest 10
        # FEJ prior preserves the kept estimates through a re-solve
        est, _ = sm.update()
        np.testing.assert_allclose(est[-5:], before, atol=1e-8)
        # the smoother keeps working after retirement
        base = sm.n
        off = 30  # absolute id of the next data pose
        for k in range(off, 36):
            i = sm.add_pose(data.T_meas[k - 1] @ sm.poses()[sm.n - 1])
            sm.add_between(i - 1, i, data.T_meas[k - 1], data.sqrt_info[k - 1])
        est, info = sm.update()
        assert sm.n == base + 6
        assert np.isfinite(float(info.chi2))


class TestIncrementalLandmarks:
    """Online landmark SLAM through the smoother: stream poses, landmarks,
    and bearing-range observations; updates must match the batch solve_auto
    answer on the same graph with O(log N) compiles."""

    def _stream(self, data, update_every=5, max_iters=15, keep_window=None):
        from pyslam_tpu.solver.incremental import IncrementalSmoother
        from pyslam_tpu.solver import Options as O

        sm = IncrementalSmoother(
            kind="se2", obs_kind="bearing_range_se2",
            options=O(method="lm", max_iters=max_iters),
        )
        lm_id = {}
        obs_by_pose = {}
        for m in range(len(data.obs_pose)):
            obs_by_pose.setdefault(int(data.obs_pose[m]), []).append(m)
        n = len(data.T_init)
        info = None
        prev = None  # smoother index of the latest pose (reindexes after
        # marginalize_oldest, so track it locally, never the dataset id)
        for k in range(n):
            if k == 0:
                prev = sm.add_pose(data.T_init[0])
            else:
                cur = sm.add_pose(data.T_meas[k - 1] @ sm.poses()[prev])
                sm.add_between(prev, cur, data.T_meas[k - 1], data.sqrt_info[k - 1])
                prev = cur
            for m in obs_by_pose.get(k, []):
                lj = int(data.obs_lm[m])
                if lj not in lm_id:
                    # first-observation back-projection through the current
                    # pose estimate (the honest online init)
                    b, r = data.obs[m]
                    p_local = np.array([r * np.cos(b), r * np.sin(b)])
                    Tk = sm.poses()[prev]
                    lm_id[lj] = sm.add_landmark(
                        Tk[:2, :2].T @ (p_local - Tk[:2, 2])
                    )
                sm.add_observation(prev, lm_id[lj], data.obs[m], data.obs_sqrt_info[m])
            if k % update_every == 0 or k == n - 1:
                _, info = sm.update()
                if keep_window and sm.n > keep_window + 4:
                    sm.marginalize_oldest(keep_window)
                    prev = sm.n - 1
        return sm, lm_id, info

    def test_matches_batch_solve(self):
        data = synth.landmark_slam_2d(
            n_poses=50, n_landmarks=30, max_range=9.0, obs_type="bearing_range", seed=6
        )
        sm, lm_id, info = self._stream(data, update_every=5)
        # batch reference over the same factors/inits
        g = build.landmark_slam_2d(data, dtype=jnp.float64)
        from pyslam_tpu.solver import solve_auto

        batch, binfo = solve_auto(g, Options(method="lm", max_iters=40))
        err = jnp.abs(
            se2.log(jnp.asarray(sm.poses()) @ se2.inv(batch.blocks["poses"].values))
        )
        assert float(jnp.max(err)) < 1e-3
        # landmark estimates agree too (map smoother ids -> dataset ids)
        L_b = np.asarray(batch.blocks["landmarks"].values)
        L_s = sm.landmarks()
        for dj, sj in lm_id.items():
            np.testing.assert_allclose(L_s[sj], L_b[dj], atol=2e-3)
        assert sm.compiles <= 16, sm.compiles

    def test_marginalize_keeps_tracking(self):
        data = synth.landmark_slam_2d(
            n_poses=28, n_landmarks=16, max_range=9.0, obs_type="bearing_range", seed=8
        )
        sm, lm_id, info = self._stream(data, update_every=6, keep_window=10)
        assert sm.n <= 15  # window bounded
        # retired information is kept: the live tail matches the full batch
        # tail to loop-closure accuracy
        g = build.landmark_slam_2d(data, dtype=jnp.float64)
        from pyslam_tpu.solver import solve_auto

        batch, _ = solve_auto(g, Options(method="lm", max_iters=40))
        T_b = np.asarray(batch.blocks["poses"].values)
        tail = np.asarray(sm.poses()[-5:])
        err = jnp.abs(se2.log(jnp.asarray(tail) @ se2.inv(jnp.asarray(T_b[-5:]))))
        assert float(jnp.max(err)) < 0.1


def test_incremental_visual_ba_with_camera_extras():
    """obs_kind='reprojection' with the camera pytree riding in obs_extras:
    online visual BA through the smoother (static per-batch data must
    survive graph rebuilds and marginalization splits)."""
    from pyslam_tpu.sensors import StereoCamera
    from pyslam_tpu.solver import IncrementalSmoother
    from pyslam_tpu.solver import Options as O

    data = synth.ba_synthetic(n_cams=6, n_pts=30, seed=0)
    cam = StereoCamera(**data.camera)
    sm = IncrementalSmoother(
        kind="se3", obs_kind="reprojection",
        options=O(method="lm", max_iters=10), obs_extras={"camera": cam},
    )
    lm_id = {}
    obs_by_cam = {}
    for m in range(len(data.cam_idx)):
        obs_by_cam.setdefault(int(data.cam_idx[m]), []).append(m)
    info = None
    for k in range(6):
        i = sm.add_pose(data.T_init[k])
        if k:
            sm.add_between(
                k - 1, k, data.T_gt[k] @ np.linalg.inv(data.T_gt[k - 1]),
                np.eye(6) * 50,
            )
        for m in obs_by_cam.get(k, []):
            lj = int(data.pt_idx[m])
            if lj not in lm_id:
                lm_id[lj] = sm.add_landmark(data.pts_init[lj])
            sm.add_observation(i, lm_id[lj], data.obs[m], np.eye(3))
        _, info = sm.update()
    assert np.isfinite(float(info.chi2))
    # converged near the observation-noise floor, poses near gt
    T_err = np.abs(sm.poses() - data.T_gt).max()
    assert T_err < 0.05, T_err
    assert sm.compiles <= 5


def test_pose_marginals_match_dense_inverse():
    """Online uncertainty readout: sm.pose_marginals() equals the dense
    inverse on both pose-only and landmark graphs."""
    from pyslam_tpu.solver import full_covariance

    data = synth.se2_loop(n_poses=20, n_loops=3, seed=5)
    sm = IncrementalSmoother(kind="se2", options=Options(method="gn", max_iters=15))
    sm.add_pose(data.T_init[0])
    for k in range(1, 20):
        sm.add_pose(data.T_meas[k - 1] @ sm.poses()[k - 1])
        sm.add_between(k - 1, k, data.T_meas[k - 1], data.sqrt_info[k - 1])
    sm.update()
    M = sm.pose_marginals()
    Sig = np.asarray(full_covariance(sm._graph(n=sm.n, m=sm.m)))
    for i in range(20):
        np.testing.assert_allclose(
            M[i], Sig[3 * i : 3 * i + 3, 3 * i : 3 * i + 3], atol=1e-12
        )
