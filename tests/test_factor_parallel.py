"""Factor-parallel (DP-analogue) sharded solving on the 8-device CPU mesh
(SURVEY.md §2.3, §4.4): psum-reduced normal equations must equal the
single-device assembly; padding factors are inert; the sharded solve reaches
the single-device converged cost."""

import jax
import jax.numpy as jnp
import numpy as np

from pyslam_tpu.dist import make_mesh, pad_batch, shard_graph, solve_factor_parallel
from pyslam_tpu.dist.factor_parallel import make_sharded_lm_step
from pyslam_tpu.graph import build
from pyslam_tpu.graph.core import FactorGraph
from pyslam_tpu.io import synth
from pyslam_tpu.solver import Options, solve
from pyslam_tpu.solver.assemble import assemble_dense


def graph(seed=0, n=40):
    data = synth.se3_sphere(n_poses=n, n_loops=12, seed=seed)
    return build.pose_graph(data, dtype=jnp.float64)


class TestPadding:
    def test_pad_batch_inert(self):
        g = graph()
        fb = g.batches[0]
        padded = pad_batch(fb, 16)
        assert padded.n % 16 == 0
        g2 = FactorGraph(g.blocks, [padded])
        np.testing.assert_allclose(float(g2.chi2()), float(g.chi2()), rtol=1e-12)
        H1, g1, c1 = assemble_dense(g)
        H2, g2_, c2 = assemble_dense(g2)
        np.testing.assert_allclose(np.asarray(H2), np.asarray(H1), atol=1e-12)
        np.testing.assert_allclose(np.asarray(g2_), np.asarray(g1), atol=1e-12)


class TestShardedStep:
    def test_psum_equals_single_device(self):
        g = graph()
        mesh = make_mesh(8)
        opts = Options(method="lm")
        step, gs = make_sharded_lm_step(g, mesh, opts)
        step = jax.jit(step)
        new_blocks, chi2, cost_new, dx_norm = step(
            dict(gs.blocks), tuple(gs.batches), jnp.asarray(1e-4, jnp.float64)
        )
        np.testing.assert_allclose(float(chi2), float(g.chi2()), rtol=1e-10)
        assert float(cost_new) < float(chi2)

    def test_solve_matches_single_device(self):
        g = graph(seed=5)
        mesh = make_mesh(8)
        opts = Options(method="lm", max_iters=25)
        final, chi2_s, hist = solve_factor_parallel(g, mesh, opts)
        _, info = solve(g, opts)
        np.testing.assert_allclose(chi2_s, float(info.chi2), rtol=1e-6)

    def test_mesh_size_invariance(self):
        g = graph(seed=7)
        opts = Options(method="lm", max_iters=10)
        _, chi2_1, _ = solve_factor_parallel(g, make_mesh(1), opts)
        _, chi2_8, _ = solve_factor_parallel(g, make_mesh(8), opts)
        np.testing.assert_allclose(chi2_1, chi2_8, rtol=1e-8)
