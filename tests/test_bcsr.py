"""Block-sparse path: BCSR assembly/matvec/solve must agree with the dense
path exactly (same kernels, different storage)."""

import jax.numpy as jnp
import numpy as np

from pyslam_tpu.graph import build
from pyslam_tpu.io import synth
from pyslam_tpu.solver import Options, solve
from pyslam_tpu.solver.assemble import assemble_dense
from pyslam_tpu.solver.bcsr import (
    assemble_bcsr,
    bcsr_matvec,
    block_jacobi_inv,
    build_pattern,
    solve_bcsr,
)

F64 = jnp.float64


def make_graph(seed=3):
    data = synth.se2_loop(n_poses=30, n_loops=5, seed=seed)
    return build.pose_graph(data, dtype=F64)


def densify(H, pattern):
    nb, d = pattern.nb, pattern.d
    Hd = np.zeros((nb * d, nb * d))
    for p, (r, c) in enumerate(zip(pattern.rows, pattern.cols)):
        Hd[r * d : (r + 1) * d, c * d : (c + 1) * d] += np.asarray(H[p])
        if r != c:
            Hd[c * d : (c + 1) * d, r * d : (r + 1) * d] += np.asarray(H[p]).T
    return Hd


class TestBCSRAssembly:
    def test_matches_dense(self):
        g = make_graph()
        pattern = build_pattern(g)
        Hb, gb, chi_b = assemble_bcsr(g, pattern)
        Hd, gd, chi_d = assemble_dense(g)
        np.testing.assert_allclose(densify(Hb, pattern), np.asarray(Hd), atol=1e-10)
        np.testing.assert_allclose(np.asarray(gb), np.asarray(gd), atol=1e-10)
        np.testing.assert_allclose(float(chi_b), float(chi_d), rtol=1e-12)

    def test_matvec_matches_dense(self, rng):
        g = make_graph()
        pattern = build_pattern(g)
        Hb, _, _ = assemble_bcsr(g, pattern)
        Hd, _, _ = assemble_dense(g)
        x = jnp.asarray(rng.normal(size=Hd.shape[0]))
        np.testing.assert_allclose(
            np.asarray(bcsr_matvec(Hb, pattern, x)), np.asarray(Hd @ x), atol=1e-9
        )

    def test_block_jacobi_inverts_diag(self):
        g = make_graph()
        pattern = build_pattern(g)
        Hb, _, _ = assemble_bcsr(g, pattern)
        Minv = block_jacobi_inv(Hb, pattern)
        D = Hb[pattern.diag_pos]
        eye = jnp.broadcast_to(jnp.eye(pattern.d), D.shape)
        np.testing.assert_allclose(np.asarray(D @ Minv), np.asarray(eye), atol=1e-8)


class TestBCSRSolve:
    def test_matches_dense_solve(self):
        g = make_graph(seed=9)
        opts = Options(method="lm", max_iters=30)
        s_dense, i_dense = solve(g, opts)
        s_bcsr, i_bcsr = solve_bcsr(g, opts, pcg_rtol=1e-12, pcg_max_iters=500)
        assert abs(float(i_dense.chi2) - float(i_bcsr.chi2)) / float(i_dense.chi2) < 1e-6

    def test_se3_sphere(self):
        data = synth.se3_sphere(n_poses=60, seed=11)
        g = build.pose_graph(data, dtype=F64)
        chi0 = float(g.chi2())
        s, info = solve_bcsr(g, Options(method="lm", max_iters=30))
        assert float(info.chi2) < chi0 * 0.2
