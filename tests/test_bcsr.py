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
    build_ell,
    build_group_jacobi,
    build_pattern,
    ell_blocks,
    ell_matvec,
    group_jacobi_apply,
    group_jacobi_factor,
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


class TestEllMatvec:
    def test_matches_dense(self, rng):
        g = make_graph()
        pattern = build_pattern(g)
        ell = build_ell(pattern)
        Hb, _, _ = assemble_bcsr(g, pattern)
        Hd, _, _ = assemble_dense(g)
        He = ell_blocks(Hb, ell)
        x = jnp.asarray(rng.normal(size=Hd.shape[0]))
        np.testing.assert_allclose(
            np.asarray(ell_matvec(He, ell, x)), np.asarray(Hd @ x), atol=1e-9
        )


class TestGroupJacobi:
    def test_exact_when_group_covers_graph(self, rng):
        # one group spanning every pose == a direct dense solve
        g = make_graph()
        pattern = build_pattern(g)
        gj = build_group_jacobi(pattern, group_size=pattern.nb)
        Hb, _, _ = assemble_bcsr(g, pattern)
        Hd, _, _ = assemble_dense(g)
        L = group_jacobi_factor(Hb, gj)
        r = jnp.asarray(rng.normal(size=Hd.shape[0]))
        z = group_jacobi_apply(L, gj, r)
        np.testing.assert_allclose(
            np.asarray(z), np.linalg.solve(np.asarray(Hd), np.asarray(r)), atol=1e-8
        )

    def test_spd_apply_with_padding(self, rng):
        # nb=30 with G=8 -> ng=4, 2 padded poses; apply must stay finite and
        # symmetric positive (z . r > 0 for the SPD preconditioner)
        g = make_graph()
        pattern = build_pattern(g)
        gj = build_group_jacobi(pattern, group_size=8)
        Hb, _, _ = assemble_bcsr(g, pattern)
        L = group_jacobi_factor(Hb, gj)
        r = jnp.asarray(rng.normal(size=pattern.nb * pattern.d))
        z = group_jacobi_apply(L, gj, r)
        assert np.isfinite(np.asarray(z)).all()
        assert float(z @ r) > 0


class TestEllDirect:
    def test_assembly_matches_dense(self):
        from pyslam_tpu.solver.bcsr import assemble_ell, build_ell_direct

        g = make_graph()
        plan = build_ell_direct(g)
        He, ge, c2e = assemble_ell(g, plan)
        Hd, gd, c2d = assemble_dense(g)
        nb, d, K = plan.nb, plan.d, plan.K
        Hfull = np.zeros((nb * d, nb * d))
        for r in range(nb):
            for k in range(K):
                if plan.valid[r, k]:
                    c = plan.cols[r, k]
                    Hfull[r * d : (r + 1) * d, c * d : (c + 1) * d] += np.asarray(He[r, k])
        np.testing.assert_allclose(Hfull, np.asarray(Hd), atol=1e-10)
        np.testing.assert_allclose(np.asarray(ge), np.asarray(gd), atol=1e-10)
        np.testing.assert_allclose(float(c2e), float(c2d), rtol=1e-12)

    def test_sym_block_inv(self, rng):
        from pyslam_tpu.solver.bcsr import sym_block_inv

        for d in [1, 2, 3, 6, 9]:
            A = rng.normal(size=(40, d, d))
            A = A @ np.swapaxes(A, -1, -2) + 3 * np.eye(d)
            Ai = np.asarray(sym_block_inv(jnp.asarray(A)))
            np.testing.assert_allclose(Ai @ A, np.broadcast_to(np.eye(d), A.shape), atol=1e-9)

    def test_solve_matches_dense(self):
        from pyslam_tpu.solver.bcsr import solve_ell

        g = make_graph(seed=9)
        opts = Options(method="lm", max_iters=30)
        _, i_dense = solve(g, opts)
        _, i_ell = solve_ell(g, opts, pcg_rtol=1e-12, pcg_max_iters=500)
        assert abs(float(i_dense.chi2) - float(i_ell.chi2)) / float(i_dense.chi2) < 1e-6

    def test_se3(self):
        from pyslam_tpu.solver.bcsr import solve_ell

        data = synth.se3_sphere(n_poses=60, seed=11)
        g = build.pose_graph(data, dtype=F64)
        chi0 = float(g.chi2())
        _, info = solve_ell(g, Options(method="lm", max_iters=30))
        assert float(info.chi2) < chi0 * 0.2


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


class TestEllComponentMajor:
    def test_assembly_matches_block_layout(self):
        from pyslam_tpu.solver.bcsr import assemble_ell, assemble_ell_cm, build_ell_direct

        g = make_graph()
        plan = build_ell_direct(g)
        He_cm, g_cm, c_cm = assemble_ell_cm(g, plan)
        He_bl, g_bl, c_bl = assemble_ell(g, plan)
        nb, d, K = plan.nb, plan.d, plan.K
        blocks = np.asarray(He_cm).reshape(d, d, nb, K).transpose(2, 3, 0, 1)
        np.testing.assert_allclose(blocks, np.asarray(He_bl), atol=1e-10)
        np.testing.assert_allclose(np.asarray(g_cm), np.asarray(g_bl), atol=1e-12)
        np.testing.assert_allclose(float(c_cm), float(c_bl), rtol=1e-12)

    def test_solve_matches_dense(self):
        from pyslam_tpu.solver.bcsr import solve_ell_cm

        g = make_graph(seed=9)
        opts = Options(method="lm", max_iters=30)
        _, i_dense = solve(g, opts)
        _, i_cm = solve_ell_cm(g, opts, pcg_rtol=1e-12, pcg_max_iters=500)
        assert abs(float(i_dense.chi2) - float(i_cm.chi2)) / float(i_dense.chi2) < 1e-6


class TestTwoLevelPrecond:
    """Additive two-level Schwarz preconditioner (VERDICT r2 next #10):
    must converge to the same solution as block-Jacobi, in <= the CG
    iterations on loopy graphs (the wall-clock comparison runs on the real
    chip at 50k poses; correctness lives here)."""

    def test_matches_bj_solution(self):
        from pyslam_tpu.solver.bcsr import solve_ell

        data = synth.se3_sphere(n_poses=300, seed=5)
        g = build.pose_graph(data, dtype=jnp.float64)
        opts = Options(method="lm", max_iters=20)
        _, i_bj = solve_ell(g, opts, pcg_rtol=1e-10, pcg_max_iters=500)
        _, i_tl = solve_ell(
            g, opts, pcg_rtol=1e-10, pcg_max_iters=500,
            precond="two_level", coarse_size=32,
        )
        np.testing.assert_allclose(float(i_tl.chi2), float(i_bj.chi2), rtol=1e-8)

    def test_single_linear_solve_exact(self):
        from pyslam_tpu.solver.assemble import assemble_dense, unit_diag_where_dead
        from pyslam_tpu.solver.bcsr import (
            assemble_ell, build_ell_direct, solve_ell, _coarse_groups,
        )
        from pyslam_tpu.solver.linear import pcg_solve
        import jax

        data = synth.se2_loop(n_poses=60, n_loops=8, seed=2)
        g = build.pose_graph(data, dtype=jnp.float64)
        plan = build_ell_direct(g)
        group, G = _coarse_groups(g, plan, 16)
        assert group.shape == (plan.nb,) and group.max() == G - 1
        # every group nonempty (P full column rank -> A_c SPD)
        assert (np.bincount(group, minlength=G) > 0).all()
