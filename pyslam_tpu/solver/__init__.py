"""GN/LM solver core (TPU-native replacement of pyslam/problem.py solve
machinery; SURVEY.md §3.1)."""

from .assemble import assemble_dense, gradient_and_chi2
from .linear import cholesky_solve, damp_marquardt, pcg_solve
from .lm import (
    Options,
    SolveInfo,
    STATUS_NAMES,
    solve,
    solve_one_iter,
)

__all__ = [
    "Options",
    "SolveInfo",
    "STATUS_NAMES",
    "solve",
    "solve_one_iter",
    "assemble_dense",
    "gradient_and_chi2",
    "cholesky_solve",
    "damp_marquardt",
    "pcg_solve",
]

from .bcsr import BlockPattern, assemble_bcsr, bcsr_matvec, build_pattern, solve_bcsr  # noqa: E402

__all__ += ["BlockPattern", "assemble_bcsr", "bcsr_matvec", "build_pattern", "solve_bcsr"]

from .schur import ba_assemble, solve_schur  # noqa: E402

__all__ += ["ba_assemble", "solve_schur"]

from .bcsr import EllDirect, assemble_ell, build_ell_direct, solve_ell, sym_block_inv  # noqa: E402
from .covariance import full_covariance, marginal_covariances  # noqa: E402

__all__ += [
    "EllDirect",
    "assemble_ell",
    "build_ell_direct",
    "solve_ell",
    "sym_block_inv",
    "full_covariance",
    "marginal_covariances",
]
