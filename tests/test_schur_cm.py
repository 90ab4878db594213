"""Sharded component-major Schur (dist/schur_cm.py): must agree with the
single-device Schur solver on the 8-way CPU mesh; mesh-size and partition
invariance."""

import jax.numpy as jnp
import numpy as np
import pytest

from pyslam_tpu.dist import make_mesh
from pyslam_tpu.dist.partitioner import Partition
from pyslam_tpu.dist.schur_cm import solve_schur_cm
from pyslam_tpu.graph import build
from pyslam_tpu.io import synth
from pyslam_tpu.losses import HuberLoss
from pyslam_tpu.solver import Options, solve_schur


def tiny_ba(seed=3, loss=None):
    data = synth.ba_synthetic(n_cams=8, n_pts=64, seed=seed)
    return build.ba_graph(data, loss=loss, dtype=jnp.float64)


class TestSchurCM:
    def test_matches_single_device(self):
        g = tiny_ba()
        opts = Options(method="lm", max_iters=20)
        _, info = solve_schur(g, opts, mode="pcg", pcg_rtol=1e-10, pcg_max_iters=300)
        _, chi2_cm, hist = solve_schur_cm(
            g, make_mesh(8, axis_name="l"), opts, n_chunks=4,
            pcg_rtol=1e-10, pcg_max_iters=300,
        )
        np.testing.assert_allclose(chi2_cm, float(info.chi2), rtol=1e-8)
        assert hist[-1] < hist[0]

    def test_mesh_size_invariance(self):
        g = tiny_ba(seed=7)
        opts = Options(method="lm", max_iters=10)
        _, a, _ = solve_schur_cm(g, make_mesh(1, axis_name="l"), opts, n_chunks=2)
        _, b, _ = solve_schur_cm(g, make_mesh(8, axis_name="l"), opts, n_chunks=2)
        np.testing.assert_allclose(a, b, rtol=1e-9)

    def test_partition_invariance(self):
        g = tiny_ba(seed=5)
        opts = Options(method="lm", max_iters=10)
        mesh = make_mesh(8, axis_name="l")
        _, a, _ = solve_schur_cm(g, mesh, opts)
        rng = np.random.default_rng(0)
        rp = Partition(rng.integers(0, 8, g.blocks["landmarks"].n), 8)
        _, b, _ = solve_schur_cm(g, mesh, opts, partition=rp)
        np.testing.assert_allclose(a, b, rtol=1e-6)

    def test_robust_loss_and_gauge(self):
        g = tiny_ba(loss=HuberLoss(2.0))
        mesh = make_mesh(8, axis_name="l")
        solved, chi2, hist = solve_schur_cm(g, mesh, Options(method="lm", max_iters=10))
        assert chi2 < hist[0]
        np.testing.assert_allclose(
            np.asarray(solved.blocks["poses"].values[0]),
            np.asarray(g.blocks["poses"].values[0]),
            atol=1e-12,
        )


class TestCMFullSlam:
    def test_between_and_prior_match_single_device(self):
        from pyslam_tpu.graph.core import FactorBatch, FactorGraph
        from pyslam_tpu.losses import L2Loss

        data = synth.ba_synthetic(n_cams=8, n_pts=48, obs_per_pt=4, seed=12)
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
        pb = g.blocks["poses"]
        prior = FactorBatch.create(
            kind="prior_se3",
            slots=("poses",),
            indices=(np.array([1], np.int32),),
            data={
                "T_obs": jnp.asarray(np.asarray(pb.values[1:2]), jnp.float64),
                "sqrt_info": 1e2 * jnp.eye(6, dtype=jnp.float64)[None],
            },
            loss=L2Loss(),
        )
        g2 = FactorGraph(dict(g.blocks), [g.batches[0], between, prior])
        opts = Options(method="lm", max_iters=15)
        common = dict(pcg_rtol=1e-12, pcg_max_iters=400)
        _, chi2_cm, hist = solve_schur_cm(
            g2, make_mesh(8, axis_name="l"), opts, n_chunks=2, **common
        )
        _, info = solve_schur(g2, opts, mode="pcg", **common)
        assert hist[-1] < hist[0]
        np.testing.assert_allclose(chi2_cm, float(info.chi2), rtol=1e-6)


class TestElasticRecoveryCM:
    def test_kill_one_host_drill(self, tmp_path):
        """schur_reduce's kill-one-host drill on the component-major path
        (VERDICT r2 next #4): checkpoint on 8 devices, resume on 7, final
        chi2 matches the uninterrupted solve."""
        g = tiny_ba(seed=21)
        ck = str(tmp_path / "drill_cm.npz")
        common = dict(n_chunks=2, pcg_rtol=1e-12, pcg_max_iters=400)
        opts8 = Options(method="lm", max_iters=8, min_cost_decrease=1.0 - 1e-15)
        opts4 = Options(method="lm", max_iters=4, min_cost_decrease=1.0 - 1e-15)
        _, chi2_full, _ = solve_schur_cm(g, make_mesh(8, axis_name="l"), opts8, **common)
        solve_schur_cm(
            g, make_mesh(8, axis_name="l"), opts4, checkpoint_path=ck,
            checkpoint_every=4, **common,
        )
        _, chi2_rec, hist = solve_schur_cm(
            g, make_mesh(7, axis_name="l"), opts4, checkpoint_path=ck,
            resume=True, **common,
        )
        assert hist[-1] <= hist[0]
        np.testing.assert_allclose(chi2_rec, chi2_full, rtol=1e-6)
