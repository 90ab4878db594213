"""Covariance paths (SURVEY.md §3.4): selective PCG marginals must match the
dense inverse; Problem covariance API sanity."""

import jax.numpy as jnp
import numpy as np

from pyslam_tpu.graph import build
from pyslam_tpu.io import synth
from pyslam_tpu.solver import Options, full_covariance, marginal_covariances, solve


def solved_graph():
    data = synth.se2_loop(n_poses=25, n_loops=4, seed=2)
    g = build.pose_graph(data, dtype=jnp.float64)
    solved, _ = solve(g, Options(method="lm", max_iters=30))
    return solved


class TestCovariance:
    def test_marginals_match_dense_inverse(self):
        g = solved_graph()
        cov = np.asarray(full_covariance(g))
        d = g.blocks["poses"].dof
        idx = [1, 7, 20]
        marg = np.asarray(marginal_covariances(g, "poses", idx, pcg_rtol=1e-12))
        for k, i in enumerate(idx):
            np.testing.assert_allclose(
                marg[k], cov[i * d : (i + 1) * d, i * d : (i + 1) * d],
                rtol=1e-5, atol=1e-10,
            )

    def test_spd_and_anchor(self):
        g = solved_graph()
        marg = np.asarray(marginal_covariances(g, "poses", [0, 5]))
        # anchored pose 0: unit block from the constant-parameter masking
        np.testing.assert_allclose(marg[0], np.eye(3), atol=1e-8)
        w = np.linalg.eigvalsh(marg[1])
        assert (w > 0).all()

    def test_problem_covariance_block(self):
        from pyslam_tpu import Problem, Options as POptions, PoseToPoseResidual, SE2

        data = synth.se2_loop(n_poses=8, n_loops=2, seed=1)
        problem = Problem(POptions(max_iters=30))
        names = [f"T_{i}" for i in range(8)]
        import numpy as _np

        for k in range(len(data.edges_i)):
            i, j = int(data.edges_i[k]), int(data.edges_j[k])
            problem.add_residual_block(
                PoseToPoseResidual(data.T_meas[k], _np.linalg.cholesky(
                    data.sqrt_info[k] @ data.sqrt_info[k].T)),
                [names[i], names[j]],
            )
        problem.initialize_params({n: SE2(jnp.asarray(T)) for n, T in zip(names, data.T_init)})
        problem.set_parameters_constant(names[0])
        problem.solve()
        cov = problem.compute_covariance()
        blk = np.asarray(problem.get_covariance_block("T_3", "T_3"))
        assert blk.shape == (3, 3)
        assert (np.linalg.eigvalsh(blk) > 0).all()


class TestSchurCovariance:
    """Pose marginals from the reduced camera system (round-2, SURVEY.md
    §3.4 build note): (H^-1)_pp == S^-1, verified against the dense full
    covariance on a small BA graph."""

    def _solved_ba(self):
        from pyslam_tpu.solver import solve_schur

        data = synth.ba_synthetic(n_cams=6, n_pts=40, obs_per_pt=4, seed=8)
        g = build.ba_graph(data, dtype=jnp.float64)
        solved, _ = solve_schur(g, Options(method="lm", max_iters=25), mode="dense")
        return solved

    def test_pose_marginals_match_dense(self):
        from pyslam_tpu.solver import pose_marginal_covariances

        g = self._solved_ba()
        cov = np.asarray(full_covariance(g))
        off = g.offsets()["poses"]
        dp = g.blocks["poses"].dof
        idx = [1, 3, 5]
        marg = np.asarray(
            pose_marginal_covariances(g, indices=idx, pcg_rtol=1e-12)
        )
        for k, i in enumerate(idx):
            s = off + i * dp
            np.testing.assert_allclose(
                marg[k], cov[s : s + dp, s : s + dp], rtol=1e-4, atol=1e-10
            )

    def test_pose_cross_block_matches_dense(self):
        from pyslam_tpu.solver import pose_covariance_block

        g = self._solved_ba()
        cov = np.asarray(full_covariance(g))
        off = g.offsets()["poses"]
        dp = g.blocks["poses"].dof
        blk = np.asarray(pose_covariance_block(g, 2, 4, pcg_rtol=1e-12))
        np.testing.assert_allclose(
            blk,
            cov[off + 2 * dp : off + 3 * dp, off + 4 * dp : off + 5 * dp],
            rtol=1e-4, atol=1e-10,
        )

    def test_problem_lazy_dispatch_no_dense(self):
        # force lazy mode with a tiny dense_dof_limit: block queries must
        # match the dense answer without materializing (D, D)
        from pyslam_tpu import PoseToPoseResidual, Problem, SE2

        data = synth.se2_loop(n_poses=12, n_loops=3, seed=4)
        names = [f"T_{i}" for i in range(12)]
        prob = Problem(Options(max_iters=30))
        for k in range(len(data.edges_i)):
            i, j = int(data.edges_i[k]), int(data.edges_j[k])
            prob.add_residual_block(
                PoseToPoseResidual(data.T_meas[k], data.sqrt_info[k]),
                [names[i], names[j]],
            )
        prob.initialize_params(
            {n: SE2(jnp.asarray(T, jnp.float64)) for n, T in zip(names, data.T_init)}
        )
        prob.set_parameters_constant(names[0])
        prob.solve()
        dense = prob.compute_covariance()  # default limit: dense
        b_dense = np.asarray(prob.get_covariance_block("T_3", "T_7"))
        assert prob.compute_covariance(dense_dof_limit=4) is None  # lazy
        b_lazy = np.asarray(prob.get_covariance_block("T_3", "T_7"))
        np.testing.assert_allclose(b_lazy, b_dense, rtol=1e-5, atol=1e-10)

    def test_landmark_marginals_match_dense(self):
        from pyslam_tpu.solver import landmark_marginal_covariances

        g = self._solved_ba()
        cov = np.asarray(full_covariance(g))
        off = g.offsets()["landmarks"]
        idx = [0, 7, 23]
        marg = np.asarray(
            landmark_marginal_covariances(g, idx, pcg_rtol=1e-12)
        )
        for k, i in enumerate(idx):
            s = off + i * 3
            np.testing.assert_allclose(
                marg[k], cov[s : s + 3, s : s + 3], rtol=1e-4, atol=1e-10
            )

    def test_problem_lazy_landmark_marginal(self):
        from pyslam_tpu import Problem, Options, ReprojectionResidual, SE3
        from pyslam_tpu.sensors import StereoCamera

        data = synth.ba_synthetic(n_cams=5, n_pts=20, obs_per_pt=3, seed=6)
        cam = StereoCamera(**data.camera)
        prob = Problem(Options(max_iters=25))
        poses = [f"T_{c}" for c in range(5)]
        pts = [f"p_{l}" for l in range(20)]
        for k in range(len(data.cam_idx)):
            prob.add_residual_block(
                ReprojectionResidual(cam, data.obs[k], 2.0),
                [poses[int(data.cam_idx[k])], pts[int(data.pt_idx[k])]],
            )
        prob.initialize_params(
            {n: SE3(jnp.asarray(T, jnp.float64)) for n, T in zip(poses, data.T_init)}
        )
        prob.initialize_params(
            {n: jnp.asarray(p, jnp.float64) for n, p in zip(pts, data.pts_init)}
        )
        prob.set_parameters_constant(poses[0])
        prob.set_parameters_constant(poses[1])
        prob.solve()
        dense = prob.compute_covariance()
        b_dense = np.asarray(prob.get_covariance_block("p_3", "p_3"))
        assert prob.compute_covariance(dense_dof_limit=4) is None  # lazy
        b_lazy = np.asarray(prob.get_covariance_block("p_3", "p_3"))
        np.testing.assert_allclose(b_lazy, b_dense, rtol=1e-4, atol=1e-10)

    def test_pose_landmark_cross_block_matches_dense(self):
        from pyslam_tpu.solver import pose_landmark_covariance_block

        g = self._solved_ba()
        cov = np.asarray(full_covariance(g))
        offp = g.offsets()["poses"]
        offl = g.offsets()["landmarks"]
        dp = g.blocks["poses"].dof
        blk = np.asarray(
            pose_landmark_covariance_block(g, 2, 7, pcg_rtol=1e-12)
        )
        np.testing.assert_allclose(
            blk,
            cov[offp + 2 * dp : offp + 3 * dp, offl + 7 * 3 : offl + 8 * 3],
            rtol=1e-4, atol=1e-10,
        )

    def test_landmark_cross_block_matches_dense(self):
        from pyslam_tpu.solver import landmark_covariance_block

        g = self._solved_ba()
        cov = np.asarray(full_covariance(g))
        offl = g.offsets()["landmarks"]
        # cross block (i != j) and marginal (i == j) via the same identity
        for i, j in [(3, 11), (7, 7)]:
            blk = np.asarray(
                landmark_covariance_block(g, i, j, pcg_rtol=1e-12)
            )
            np.testing.assert_allclose(
                blk,
                cov[offl + i * 3 : offl + (i + 1) * 3,
                    offl + j * 3 : offl + (j + 1) * 3],
                rtol=1e-4, atol=1e-10,
            )

    def test_problem_lazy_landmark_cross_block(self):
        from pyslam_tpu import Problem, Options, ReprojectionResidual, SE3
        from pyslam_tpu.sensors import StereoCamera

        data = synth.ba_synthetic(n_cams=5, n_pts=20, obs_per_pt=3, seed=6)
        cam = StereoCamera(**data.camera)
        prob = Problem(Options(max_iters=25))
        poses = [f"T_{c}" for c in range(5)]
        pts = [f"p_{l}" for l in range(20)]
        for k in range(len(data.cam_idx)):
            prob.add_residual_block(
                ReprojectionResidual(cam, data.obs[k], 2.0),
                [poses[int(data.cam_idx[k])], pts[int(data.pt_idx[k])]],
            )
        prob.initialize_params(
            {n: SE3(jnp.asarray(T, jnp.float64)) for n, T in zip(poses, data.T_init)}
        )
        prob.initialize_params(
            {n: jnp.asarray(p, jnp.float64) for n, p in zip(pts, data.pts_init)}
        )
        prob.set_parameters_constant(poses[0])
        prob.set_parameters_constant(poses[1])
        prob.solve()
        prob.compute_covariance()
        b_dense = np.asarray(prob.get_covariance_block("p_3", "p_9"))
        assert prob.compute_covariance(dense_dof_limit=4) is None  # lazy
        b_lazy = np.asarray(prob.get_covariance_block("p_3", "p_9"))
        np.testing.assert_allclose(b_lazy, b_dense, rtol=1e-4, atol=1e-10)


class TestFullSlamCovariance:
    """ADVICE r2 (high): _schur_S_solver previously dropped the pose-pose
    between-factor coupling (parts['PP']) that ba_assemble emits for
    full-SLAM graphs, so every Schur-path covariance was silently wrong on
    them (141% relative error measured).  All four query kinds must match
    the dense inverse on a mixed odometry + landmark graph."""

    def _solved_slam(self):
        from pyslam_tpu.graph.core import FactorBatch
        from pyslam_tpu.losses import L2Loss
        from pyslam_tpu.solver import solve_schur
        from pyslam_tpu.graph.core import FactorGraph

        data = synth.ba_synthetic(n_cams=8, n_pts=50, obs_per_pt=4, seed=12)
        g = build.ba_graph(data, dtype=jnp.float64)
        Ti = np.arange(7, dtype=np.int32)
        Tj = Ti + 1
        T_obs = np.stack(
            [data.T_gt[j] @ np.linalg.inv(data.T_gt[i]) for i, j in zip(Ti, Tj)]
        )
        between = FactorBatch.create(
            kind="between_se3",
            slots=("poses", "poses"),
            indices=(Ti, Tj),
            data={
                "T_obs": jnp.asarray(T_obs, jnp.float64),
                "sqrt_info": jnp.broadcast_to(
                    10.0 * jnp.eye(6, dtype=jnp.float64), (7, 6, 6)
                ),
            },
            loss=L2Loss(),
        )
        g = FactorGraph(dict(g.blocks), [g.batches[0], between])
        solved, _ = solve_schur(
            g, Options(method="lm", max_iters=25), mode="pcg",
            pcg_rtol=1e-12, pcg_max_iters=400,
        )
        return solved

    def test_pose_marginals_match_dense(self):
        from pyslam_tpu.solver import pose_marginal_covariances

        g = self._solved_slam()
        cov = np.asarray(full_covariance(g))
        off = g.offsets()["poses"]
        dp = g.blocks["poses"].dof
        idx = [1, 4, 6]
        marg = np.asarray(pose_marginal_covariances(g, indices=idx, pcg_rtol=1e-12))
        for k, i in enumerate(idx):
            s = off + i * dp
            np.testing.assert_allclose(
                marg[k], cov[s : s + dp, s : s + dp], rtol=1e-4, atol=1e-10
            )

    def test_pose_cross_block_matches_dense(self):
        from pyslam_tpu.solver import pose_covariance_block

        g = self._solved_slam()
        cov = np.asarray(full_covariance(g))
        off = g.offsets()["poses"]
        dp = g.blocks["poses"].dof
        blk = np.asarray(pose_covariance_block(g, 2, 5, pcg_rtol=1e-12))
        np.testing.assert_allclose(
            blk,
            cov[off + 2 * dp : off + 3 * dp, off + 5 * dp : off + 6 * dp],
            rtol=1e-4, atol=1e-10,
        )

    def test_landmark_blocks_match_dense(self):
        from pyslam_tpu.solver import (
            landmark_covariance_block,
            landmark_marginal_covariances,
            pose_landmark_covariance_block,
        )

        g = self._solved_slam()
        cov = np.asarray(full_covariance(g))
        offp = g.offsets()["poses"]
        offl = g.offsets()["landmarks"]
        dp = g.blocks["poses"].dof
        marg = np.asarray(landmark_marginal_covariances(g, [5], pcg_rtol=1e-12))
        s = offl + 5 * 3
        np.testing.assert_allclose(
            marg[0], cov[s : s + 3, s : s + 3], rtol=1e-4, atol=1e-10
        )
        cross = np.asarray(landmark_covariance_block(g, 5, 17, pcg_rtol=1e-12))
        np.testing.assert_allclose(
            cross,
            cov[s : s + 3, offl + 17 * 3 : offl + 18 * 3],
            rtol=1e-4, atol=1e-10,
        )
        pl = np.asarray(pose_landmark_covariance_block(g, 3, 5, pcg_rtol=1e-12))
        np.testing.assert_allclose(
            pl,
            cov[offp + 3 * dp : offp + 4 * dp, s : s + 3],
            rtol=1e-4, atol=1e-10,
        )


class TestDirectCovariance:
    """Multifrontal selective solves (round 3): exact marginals through the
    sparse direct factorization — no PCG tolerance anywhere."""

    def test_matches_dense_inverse(self):
        from pyslam_tpu.solver import marginal_covariances_direct

        g = solved_graph()
        cov = np.asarray(full_covariance(g))
        d = g.blocks["poses"].dof
        idx = [1, 7, 20]
        marg = np.asarray(marginal_covariances_direct(g, "poses", idx, leaf_size=8))
        for k, i in enumerate(idx):
            np.testing.assert_allclose(
                marg[k], cov[i * d : (i + 1) * d, i * d : (i + 1) * d],
                rtol=1e-7, atol=1e-12,
            )

    def test_anchor_unit_block(self):
        from pyslam_tpu.solver import marginal_covariances_direct

        g = solved_graph()
        marg = np.asarray(marginal_covariances_direct(g, "poses", [0]))
        np.testing.assert_allclose(marg[0], np.eye(3), atol=1e-10)
