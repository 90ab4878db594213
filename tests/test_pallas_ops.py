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


class TestScatterMatmul:
    def test_matches_scatter_add(self):
        """Scatter-as-one-hot-MXU-matmul (round-2 assembly experiment) must
        equal the XLA scatter-add; interpret mode on CPU."""
        from pyslam_tpu.solver.pallas_ops import scatter_matmul

        rng = np.random.default_rng(3)
        S_pad, T, E, C = 512, 128, 700, 36
        sid = np.sort(rng.integers(0, S_pad, E)).astype(np.int32)
        contrib = rng.normal(0, 1, (E, C)).astype(np.float32)
        grid = S_pad // T
        starts = np.searchsorted(sid, np.arange(grid) * T)
        ends = np.searchsorted(sid, np.arange(1, grid + 1) * T)
        W = max(8, int(np.ceil((ends - starts).max() / 8) * 8))
        E_pad = ((E + W - 1) // W + 2) * W
        sid_p = np.full((E_pad, 1), -1, np.int32)
        sid_p[:E, 0] = sid
        con_p = np.zeros((E_pad, C), np.float32)
        con_p[:E] = contrib
        bblk = (starts // W).astype(np.int32)
        out = np.asarray(
            scatter_matmul(
                jnp.asarray(bblk), jnp.asarray(sid_p), jnp.asarray(con_p),
                S_pad, T, W, interpret=True,
            )
        )
        ref = np.zeros((S_pad, C), np.float32)
        np.add.at(ref, sid, contrib)
        np.testing.assert_allclose(out, ref, atol=1e-5)
