"""Pallas block-sparse kernels, exercised in interpret mode on the CPU
backend (SURVEY.md §5) — must agree with the XLA einsum path exactly."""

import jax.numpy as jnp
import numpy as np

from pyslam_tpu.graph import build
from pyslam_tpu.io import synth
from pyslam_tpu.solver.assemble import assemble_dense
from pyslam_tpu.solver.bcsr import assemble_ell, build_ell_direct
from pyslam_tpu.solver.pallas_ops import ell_matvec_lane_major, ell_matvec_pallas


class TestEllPallas:
    def test_lane_major_matches_einsum(self, rng):
        K, d, nb = 5, 6, 64
        He_t = jnp.asarray(rng.normal(size=(K, d, d, nb)))
        xg_t = jnp.asarray(rng.normal(size=(K, d, nb)))
        out = ell_matvec_lane_major(He_t, xg_t, interpret=True)
        ref = jnp.einsum("kijn,kjn->in", He_t, xg_t)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-12)

    def test_matvec_matches_dense_system(self, rng):
        data = synth.se2_loop(n_poses=30, n_loops=5, seed=3)
        g = build.pose_graph(data, dtype=jnp.float64)
        plan = build_ell_direct(g)
        He, _, _ = assemble_ell(g, plan)
        Hd, _, _ = assemble_dense(g)
        x = jnp.asarray(rng.normal(size=Hd.shape[0]))
        y = ell_matvec_pallas(He, jnp.asarray(plan.cols), x, interpret=True)
        np.testing.assert_allclose(np.asarray(y), np.asarray(Hd @ x), atol=1e-9)
