"""Distributed (landmark-sharded) Schur BA on the 8-device CPU mesh
(SURVEY.md §4.4 'multi-host without a cluster'; §2.3 SP analogue): the
sharded solve must match the single-device Schur solve, partitioner
invariance, padding inertness."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from pyslam_tpu.dist import (
    Partition,
    cut_stats,
    make_mesh,
    partition_landmarks,
    partition_poses_bfs,
    solve_schur_sharded,
)
from pyslam_tpu.graph import build
from pyslam_tpu.graph.core import FactorBatch, FactorGraph
from pyslam_tpu.io import synth
from pyslam_tpu.losses import HuberLoss
from pyslam_tpu.solver import Options, solve_schur


def make_mesh_l(n=8):
    return make_mesh(n, axis_name="l")


def tiny_ba(n_cams=8, n_pts=64, seed=3, loss=None):
    data = synth.ba_synthetic(n_cams=n_cams, n_pts=n_pts, seed=seed)
    return build.ba_graph(data, loss=loss, dtype=jnp.float64)


class TestPartitioner:
    def test_bfs_chain(self):
        # a pure chain: BFS partition must cut exactly n_parts-1 edges
        n = 64
        ei = np.arange(n - 1)
        ej = np.arange(1, n)
        part = partition_poses_bfs(ei, ej, n, 4)
        stats = cut_stats(ei, ej, part)
        assert stats["edge_cut"] == 3
        assert stats["imbalance"] <= 1.01
        assert sorted(stats["counts"]) == [16, 16, 16, 16]

    def test_bfs_covers_all(self):
        data = synth.se2_loop(n_poses=50, seed=0)
        part = partition_poses_bfs(data.edges_i, data.edges_j, 50, 4)
        assert (part.part >= 0).all() and (part.part < 4).all()

    def test_landmark_plurality(self):
        cam_part = Partition(np.array([0, 0, 1, 1]), 2)
        cam_idx = np.array([0, 1, 2, 0, 2, 3])
        pt_idx = np.array([0, 0, 0, 1, 1, 1])
        part = partition_landmarks(cam_idx, pt_idx, 3, cam_part=cam_part)
        assert part.part[0] == 0  # seen by cams 0,1 (part 0) and 2 (part 1)
        # landmark 2 unobserved -> assigned somewhere valid
        assert 0 <= part.part[2] < 2

    def test_contiguous_default_balanced(self):
        part = partition_landmarks(None, None, 103, n_parts=8)
        c = part.counts()
        assert c.sum() == 103 and c.max() - c.min() <= 1


class TestShardedSchur:
    def test_matches_single_device(self):
        g = tiny_ba()
        opts = Options(method="lm", max_iters=25)
        mesh = make_mesh_l(8)
        solved_s, chi2_s, hist = solve_schur_sharded(
            g, mesh, opts, pcg_rtol=1e-10, pcg_max_iters=400
        )
        _, info = solve_schur(g, opts, mode="pcg", pcg_rtol=1e-10, pcg_max_iters=400)
        assert len(hist) >= 2 and hist[-1] < hist[0]
        np.testing.assert_allclose(chi2_s, float(info.chi2), rtol=1e-5)

    def test_partition_invariance(self):
        # solution must not depend on the landmark partition
        g = tiny_ba(seed=5)
        opts = Options(method="lm", max_iters=15)
        mesh = make_mesh_l(8)
        _, chi2_a, _ = solve_schur_sharded(g, mesh, opts)
        rng = np.random.default_rng(0)
        random_part = Partition(rng.integers(0, 8, g.blocks["landmarks"].n), 8)
        _, chi2_b, _ = solve_schur_sharded(g, mesh, opts, partition=random_part)
        np.testing.assert_allclose(chi2_a, chi2_b, rtol=1e-5)

    def test_mesh_size_invariance(self):
        g = tiny_ba(seed=7)
        opts = Options(method="lm", max_iters=10)
        _, chi2_1, _ = solve_schur_sharded(g, make_mesh_l(1), opts)
        _, chi2_8, _ = solve_schur_sharded(g, make_mesh_l(8), opts)
        np.testing.assert_allclose(chi2_1, chi2_8, rtol=1e-6)

    def test_robust_loss(self):
        g = tiny_ba(loss=HuberLoss(2.0))
        mesh = make_mesh_l(8)
        solved, chi2, hist = solve_schur_sharded(
            g, mesh, Options(method="lm", max_iters=15)
        )
        assert chi2 < hist[0]

    def test_gauge_anchor_fixed(self):
        g = tiny_ba()
        mesh = make_mesh_l(8)
        solved, _, _ = solve_schur_sharded(g, mesh, Options(method="lm", max_iters=8))
        np.testing.assert_allclose(
            np.asarray(solved.blocks["poses"].values[0]),
            np.asarray(g.blocks["poses"].values[0]),
            atol=1e-12,
        )

    def test_checkpoint_resume_exact(self, tmp_path):
        # interrupt after 4 iterations, resume from snapshot -> same state
        # trajectory as the uninterrupted solve (SURVEY.md §5 recovery)
        g = tiny_ba(seed=13)
        mesh = make_mesh_l(8)
        ck = str(tmp_path / "state.npz")
        common = dict(pcg_rtol=1e-12, pcg_max_iters=400)
        opts8 = Options(method="lm", max_iters=8, min_cost_decrease=1.0 - 1e-15)
        opts4 = Options(method="lm", max_iters=4, min_cost_decrease=1.0 - 1e-15)
        _, chi2_full, _ = solve_schur_sharded(g, mesh, opts8, **common)
        solve_schur_sharded(
            g, mesh, opts4, checkpoint_path=ck, checkpoint_every=4, **common
        )
        _, chi2_resumed, _ = solve_schur_sharded(
            g, mesh, opts4, checkpoint_path=ck, resume=True, **common
        )
        np.testing.assert_allclose(chi2_resumed, chi2_full, rtol=1e-6)

    def test_elastic_recovery_kill_one_host(self, tmp_path):
        """The kill-one-host drill (SURVEY.md §5): checkpoint mid-solve on 8
        devices, 'lose' a device, rebuild the plan on the surviving 7 (new
        landmark slabs), resume from the snapshot, converge — final chi2
        must match the uninterrupted 8-device solve.  Checkpoints are
        mesh-independent (original-order landmarks), so resharding is just a
        fresh shard_ba on the smaller mesh."""
        g = tiny_ba(seed=21)
        ck = str(tmp_path / "drill.npz")
        common = dict(pcg_rtol=1e-12, pcg_max_iters=400)
        opts8 = Options(method="lm", max_iters=8, min_cost_decrease=1.0 - 1e-15)
        opts4 = Options(method="lm", max_iters=4, min_cost_decrease=1.0 - 1e-15)
        _, chi2_full, _ = solve_schur_sharded(g, make_mesh_l(8), opts8, **common)
        # phase 1: 4 iterations on the full 8-device mesh, snapshotting
        solve_schur_sharded(
            g, make_mesh_l(8), opts4, checkpoint_path=ck, checkpoint_every=4,
            **common,
        )
        # phase 2: one host died — resume on a 7-device mesh
        _, chi2_recovered, hist = solve_schur_sharded(
            g, make_mesh_l(7), opts4, checkpoint_path=ck, resume=True, **common
        )
        assert hist[-1] <= hist[0]  # resumed solve still decreases
        np.testing.assert_allclose(chi2_recovered, chi2_full, rtol=1e-6)

    def test_checkpoint_path_without_npz_suffix(self, tmp_path):
        # np.savez silently appends '.npz'; save and resume must agree on
        # the on-disk name even for a bare path (round-1 advisor finding)
        g = tiny_ba(seed=13)
        mesh = make_mesh_l(8)
        ck = str(tmp_path / "state.ck")  # no .npz
        common = dict(pcg_rtol=1e-12, pcg_max_iters=400)
        opts8 = Options(method="lm", max_iters=8, min_cost_decrease=1.0 - 1e-15)
        opts4 = Options(method="lm", max_iters=4, min_cost_decrease=1.0 - 1e-15)
        _, chi2_full, _ = solve_schur_sharded(g, mesh, opts8, **common)
        solve_schur_sharded(
            g, mesh, opts4, checkpoint_path=ck, checkpoint_every=4, **common
        )
        _, chi2_resumed, _ = solve_schur_sharded(
            g, mesh, opts4, checkpoint_path=ck, resume=True, **common
        )
        np.testing.assert_allclose(chi2_resumed, chi2_full, rtol=1e-6)

    def test_empty_landmark_device_no_nan(self):
        # pathological partition: device 0 owns ZERO landmarks — its padded
        # slab rows must be inert (safe-point fill), not NaN via 0 * inf
        g = tiny_ba(seed=9)
        L = g.blocks["landmarks"].n
        part = Partition(1 + (np.arange(L) % 7), 8)  # devices 1..7 only
        mesh = make_mesh_l(8)
        opts = Options(method="lm", max_iters=10)
        _, chi2_p, hist = solve_schur_sharded(g, mesh, opts, partition=part)
        assert np.isfinite(chi2_p) and chi2_p < hist[0]
        _, chi2_d, _ = solve_schur_sharded(g, mesh, opts)
        np.testing.assert_allclose(chi2_p, chi2_d, rtol=1e-5)

    def test_with_pose_prior_unary(self):
        # add a pose prior on camera 1 and make camera 0 free: the sharded
        # path must handle unary batches replicated (added once, not psum'd)
        data = synth.ba_synthetic(n_cams=6, n_pts=40, seed=11)
        g = build.ba_graph(data, dtype=jnp.float64)
        from pyslam_tpu.graph.core import VariableBlock

        pb = g.blocks["poses"]
        prior = FactorBatch.create(
            kind="prior_se3",
            slots=("poses",),
            indices=(np.array([0], np.int32),),
            data={
                "T_obs": jnp.asarray(np.asarray(pb.values[:1]), jnp.float64),
                "sqrt_info": 1e3 * jnp.eye(6, dtype=jnp.float64)[None],
            },
            loss=g.batches[0].loss,
        )
        g2 = FactorGraph(dict(g.blocks), [g.batches[0], prior])
        opts = Options(method="lm", max_iters=15)
        mesh = make_mesh_l(8)
        _, chi2_s, _ = solve_schur_sharded(g2, mesh, opts, pcg_rtol=1e-10)
        _, info = solve_schur(g2, opts, mode="pcg", pcg_rtol=1e-10)
        np.testing.assert_allclose(chi2_s, float(info.chi2), rtol=1e-5)


class TestShardedFullSlam:
    def test_between_factors_match_single_device(self):
        """Full-SLAM graphs (between factors + landmark observations) must
        solve sharded and match the single-device Schur solve — round-2:
        pose-pose batches were previously silently DROPPED by shard_ba."""
        from pyslam_tpu.losses import L2Loss

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
        g2 = FactorGraph(dict(g.blocks), [g.batches[0], between])
        opts = Options(method="lm", max_iters=20)
        common = dict(pcg_rtol=1e-12, pcg_max_iters=400)
        _, chi2_s, hist = solve_schur_sharded(g2, make_mesh_l(8), opts, **common)
        _, info = solve_schur(g2, opts, mode="pcg", **common)
        assert hist[-1] < hist[0]
        np.testing.assert_allclose(chi2_s, float(info.chi2), rtol=1e-6)


class TestShardedPoseManifolds:
    """Regression (round 3): make_ba_step hardcoded retract('se3'), so any
    non-se3 pose manifold — se2 landmark SLAM, 9-dof bal_cam9 — crashed or
    mis-stepped on the mesh path despite the dof-generic assembly.  The
    pose kind is now plumbed through ShardedBA."""

    def test_se2_landmark_graph_matches_single_device(self):
        from pyslam_tpu.solver import solve_auto

        data = synth.landmark_slam_2d(n_poses=30, n_landmarks=20, max_range=9.0, seed=1)
        g = build.landmark_slam_2d(data, dtype=jnp.float64)
        mesh = make_mesh_l()
        solved_s, chi2_s, _ = solve_schur_sharded(g, mesh, Options(method="lm", max_iters=15))
        _, info_1 = solve_auto(g, Options(method="lm", max_iters=15))
        np.testing.assert_allclose(float(chi2_s), float(info_1.chi2), rtol=1e-9)

    def test_bal9_matches_single_device(self):
        from pyslam_tpu.io import bal
        from pyslam_tpu.solver import solve_auto

        data = bal.perturbed(bal.synthetic_bal(n_cams=8, n_pts=60, seed=0))
        g = build.bal_graph(data, optimize_intrinsics=True, dtype=jnp.float64)
        mesh = make_mesh_l()
        _, chi2_s, _ = solve_schur_sharded(g, mesh, Options(method="lm", max_iters=10))
        _, info_1 = solve_auto(g, Options(method="lm", max_iters=10))
        np.testing.assert_allclose(float(chi2_s), float(info_1.chi2), rtol=1e-9)


class TestShardedCovariance:
    """Distributed covariance (round-3): pose marginals over the sharded
    layout equal the single-chip S-solve answers — the solve's comm pattern
    (one psum per matvec), no chip ever holding the landmark side of H."""

    def test_ba_matches_single_chip(self):
        from pyslam_tpu.dist.schur_reduce import sharded_pose_marginals
        from pyslam_tpu.solver import solve_auto
        from pyslam_tpu.solver.covariance import pose_marginal_covariances

        data = synth.ba_synthetic(n_cams=10, n_pts=80, seed=2)
        g = build.ba_graph(data, dtype=jnp.float64)
        solved, _ = solve_auto(g, Options(method="gn", max_iters=15))
        Ms = np.asarray(sharded_pose_marginals(solved, make_mesh_l()))
        M1 = np.asarray(pose_marginal_covariances(solved))
        np.testing.assert_allclose(Ms, M1, atol=1e-12)

    def test_full_slam_with_between_factors(self):
        from pyslam_tpu.dist.schur_reduce import sharded_pose_marginals
        from pyslam_tpu.solver import solve_auto
        from pyslam_tpu.solver.covariance import pose_marginal_covariances

        data = synth.landmark_slam_2d(n_poses=25, n_landmarks=15, max_range=9.0, seed=4)
        g = build.landmark_slam_2d(data, dtype=jnp.float64)
        solved, _ = solve_auto(g, Options(method="gn", max_iters=20))
        Ms = np.asarray(sharded_pose_marginals(solved, make_mesh_l(), indices=np.arange(25)))
        M1 = np.asarray(pose_marginal_covariances(solved))
        np.testing.assert_allclose(Ms, M1, atol=1e-12)
        # anchor keeps its unit block
        np.testing.assert_allclose(Ms[0], np.eye(3), atol=1e-12)

    def test_landmark_marginals_match_single_chip(self):
        from pyslam_tpu.dist.schur_reduce import sharded_landmark_marginals
        from pyslam_tpu.solver import solve_auto
        from pyslam_tpu.solver.covariance import landmark_marginal_covariances

        data = synth.ba_synthetic(n_cams=10, n_pts=80, seed=2)
        g = build.ba_graph(data, dtype=jnp.float64)
        solved, _ = solve_auto(g, Options(method="gn", max_iters=15))
        idx = np.array([0, 7, 33, 79])
        Ls = np.asarray(sharded_landmark_marginals(solved, make_mesh_l(), idx))
        L1 = np.asarray(landmark_marginal_covariances(solved, idx))
        np.testing.assert_allclose(Ls, L1, atol=1e-12)
