"""Variable-sharded pose-graph solver (dist/pose_sharded.py — the TP
analogue, SURVEY.md §2.3): sharded solve on the 8-device CPU mesh must match
the single-device ELL solver, be invariant to partition choice and mesh
size, respect gauge anchors, and support unary prior batches."""

import jax.numpy as jnp
import numpy as np
import pytest

from pyslam_tpu.dist import (
    Partition,
    make_mesh,
    partition_poses_bfs,
    shard_pose_graph,
    solve_pose_sharded,
)
from pyslam_tpu.graph import build
from pyslam_tpu.graph.core import FactorBatch, FactorGraph
from pyslam_tpu.io import synth
from pyslam_tpu.losses import HuberLoss
from pyslam_tpu.solver import Options
from pyslam_tpu.solver.bcsr import solve_ell


def mesh_p(n=8):
    return make_mesh(n, axis_name="p")


def se2_graph(n_poses=120, seed=0, loss=None):
    data = synth.se2_loop(n_poses=n_poses, n_loops=15, seed=seed)
    return build.pose_graph(data, loss=loss, dtype=jnp.float64)


def se3_graph(n_poses=150, seed=0):
    data = synth.se3_sphere(n_poses=n_poses, seed=seed)
    return build.pose_graph(data, dtype=jnp.float64)


COMMON = dict(pcg_rtol=1e-10, pcg_max_iters=400)


class TestPoseSharded:
    @pytest.mark.parametrize("graph_fn", [se2_graph, se3_graph])
    def test_matches_single_device_ell(self, graph_fn):
        g = graph_fn()
        opts = Options(method="lm", max_iters=25)
        solved_s, chi2_s, hist = solve_pose_sharded(g, mesh_p(8), opts, **COMMON)
        _, info = solve_ell(g, opts, **COMMON)
        assert len(hist) >= 2 and hist[-1] < hist[0]
        np.testing.assert_allclose(chi2_s, float(info.chi2), rtol=1e-5)

    def test_partition_invariance(self):
        g = se2_graph(seed=5)
        opts = Options(method="lm", max_iters=15)
        _, chi2_a, _ = solve_pose_sharded(g, mesh_p(8), opts, **COMMON)
        rng = np.random.default_rng(0)
        random_part = Partition(rng.integers(0, 8, g.blocks["poses"].n), 8)
        _, chi2_b, _ = solve_pose_sharded(
            g, mesh_p(8), opts, partition=random_part, **COMMON
        )
        np.testing.assert_allclose(chi2_a, chi2_b, rtol=1e-6)

    def test_mesh_size_invariance(self):
        g = se2_graph(seed=7)
        opts = Options(method="lm", max_iters=10)
        _, chi2_1, _ = solve_pose_sharded(g, mesh_p(1), opts, **COMMON)
        _, chi2_8, _ = solve_pose_sharded(g, mesh_p(8), opts, **COMMON)
        np.testing.assert_allclose(chi2_1, chi2_8, rtol=1e-6)

    def test_gauge_anchor_fixed(self):
        g = se2_graph()
        solved, _, _ = solve_pose_sharded(
            g, mesh_p(8), Options(method="lm", max_iters=8), **COMMON
        )
        np.testing.assert_allclose(
            np.asarray(solved.blocks["poses"].values[0]),
            np.asarray(g.blocks["poses"].values[0]),
            atol=1e-12,
        )

    def test_robust_loss(self):
        g = se2_graph(loss=HuberLoss(2.0))
        _, chi2, hist = solve_pose_sharded(
            g, mesh_p(8), Options(method="lm", max_iters=15), **COMMON
        )
        assert chi2 < hist[0]

    def test_unary_prior_batch(self):
        # free all poses, anchor the graph with a strong SE(2) prior instead
        data = synth.se2_loop(n_poses=60, n_loops=8, seed=3)
        g = build.pose_graph(data, dtype=jnp.float64, anchor_first=False)
        pb = g.blocks["poses"]
        prior = FactorBatch.create(
            kind="prior_se2",
            slots=("poses",),
            indices=(np.array([0], np.int32),),
            data={
                "T_obs": jnp.asarray(np.asarray(pb.values[:1]), jnp.float64),
                "sqrt_info": 1e3 * jnp.eye(3, dtype=jnp.float64)[None],
            },
            loss=g.batches[0].loss,
        )
        g2 = FactorGraph(dict(g.blocks), [g.batches[0], prior])
        opts = Options(method="lm", max_iters=20)
        _, chi2_s, hist = solve_pose_sharded(g2, mesh_p(8), opts, **COMMON)
        _, info = solve_ell(g2, opts, **COMMON)
        assert hist[-1] < hist[0]
        np.testing.assert_allclose(chi2_s, float(info.chi2), rtol=1e-5)

    def test_plan_duplication_is_bounded(self):
        # cut-factor replication must stay near the cut size, not blow up
        g = se2_graph(n_poses=200)
        sp = shard_pose_graph(g, mesh_p(8))
        n_copies = sum(
            int(np.sum(np.asarray(a["w"]) > 0)) for a in sp.batch_arrays
        )
        n_factors = sum(fb.n for fb in g.batches)
        # each factor is copied at most twice (2 endpoint owners)
        assert n_factors <= n_copies <= 2 * n_factors
        # BFS partition on a loop graph: duplication should be a small excess
        assert n_copies - n_factors < n_factors * 0.5


class TestUnaryOnlyGraph:
    def test_prior_only_graph(self):
        """Unary-only graphs (empty edge set) must shard: every ELL block
        is diagonal (regression for the empty-keys ell_pos edge case)."""
        from pyslam_tpu.graph.core import VariableBlock
        from pyslam_tpu.lie import se2
        from pyslam_tpu.solver import solve

        rng = np.random.default_rng(0)
        n = 24
        T_targets = np.asarray(se2.exp(jnp.asarray(rng.normal(0, 0.3, (n, 3)))))
        T_init = np.tile(np.eye(3), (n, 1, 1))
        from pyslam_tpu.losses import L2Loss

        blocks = {"poses": VariableBlock.create("se2", jnp.asarray(T_init, jnp.float64))}
        prior = FactorBatch.create(
            kind="prior_se2",
            slots=("poses",),
            indices=(np.arange(n, dtype=np.int32),),
            data={
                "T_obs": jnp.asarray(T_targets, jnp.float64),
                "sqrt_info": jnp.broadcast_to(jnp.eye(3, dtype=jnp.float64), (n, 3, 3)),
            },
            loss=L2Loss(),
        )
        g = FactorGraph(blocks, [prior])
        opts = Options(method="lm", max_iters=20)
        _, chi2_s, hist = solve_pose_sharded(g, mesh_p(8), opts, **COMMON)
        _, info = solve(g, opts)
        np.testing.assert_allclose(chi2_s, float(info.chi2), atol=1e-10)


class TestElasticRecovery:
    def test_kill_one_host_drill(self, tmp_path):
        """Checkpoint mid-solve on 8 devices, lose one, resume on 7 (fresh
        BFS partition + slabs), converge — chi2 must match the
        uninterrupted 8-device solve (VERDICT r2 next #4: the schur_reduce
        drill, mirrored onto the TP-analogue path)."""
        g = se2_graph(n_poses=60, seed=11)
        ck = str(tmp_path / "drill.npz")
        opts_full = Options(method="lm", max_iters=12, min_cost_decrease=1.0 - 1e-15)
        opts_half = Options(method="lm", max_iters=6, min_cost_decrease=1.0 - 1e-15)
        _, chi2_full, _ = solve_pose_sharded(g, mesh_p(8), opts_full, **COMMON)
        solve_pose_sharded(
            g, mesh_p(8), opts_half, checkpoint_path=ck, checkpoint_every=3,
            **COMMON,
        )
        _, chi2_rec, hist = solve_pose_sharded(
            g, mesh_p(7), opts_half, checkpoint_path=ck, resume=True, **COMMON
        )
        assert hist[-1] <= hist[0]
        np.testing.assert_allclose(chi2_rec, chi2_full, rtol=1e-6)

    def test_checkpoint_suffix_normalized(self, tmp_path):
        g = se2_graph(n_poses=40, seed=5)
        ck = str(tmp_path / "state.ck")  # no .npz
        opts = Options(method="lm", max_iters=4, min_cost_decrease=1.0 - 1e-15)
        solve_pose_sharded(
            g, mesh_p(4), opts, checkpoint_path=ck, checkpoint_every=2, **COMMON
        )
        import os

        assert os.path.exists(ck + ".npz")
        _, chi2_resumed, _ = solve_pose_sharded(
            g, mesh_p(4), opts, checkpoint_path=ck, resume=True, **COMMON
        )
        assert np.isfinite(chi2_resumed)
