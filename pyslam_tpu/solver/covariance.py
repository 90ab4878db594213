"""Posterior covariance — the TPU-native replacement for the reference's
``Problem.compute_covariance`` full-inverse (pyslam/problem.py, SURVEY.md
§3.4 "the TPU equivalent is covariance columns via selective solves").

Two paths:
  * ``full_covariance``      — dense (J^T W J)^-1 by Cholesky solves against
    identity columns (small/medium problems; what Problem.compute_covariance
    uses).
  * ``marginal_covariances`` — the (dof x dof) diagonal blocks of H^-1 for a
    selected set of variables, via PCG selective solves on the block-sparse
    system: cost scales with (#requested x dof) CG solves, never forming the
    inverse.  vmapped over right-hand sides so all columns converge in one
    fused while_loop.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from ..graph.core import FactorGraph
from .assemble import assemble_dense
from .bcsr import build_ell_direct, assemble_ell, sym_block_inv
from .linear import cholesky_solve, pcg_solve


def full_covariance(graph: FactorGraph):
    """(D, D) posterior covariance over the free tangent space (constant
    parameters get unit rows from the assembly masking, harmlessly)."""
    H, _, _ = assemble_dense(graph)
    return cholesky_solve(H, jnp.eye(H.shape[0], dtype=H.dtype))


def marginal_covariances(
    graph: FactorGraph,
    block_name: str | None = None,
    indices=None,
    pcg_rtol: float = 1e-8,
    pcg_max_iters: int = 500,
):
    """(k, dof, dof) marginal covariance blocks of the selected variables.

    Solves H x = e_j for each tangent column j of each requested variable
    with block-Jacobi PCG over the ELL system — no dense Hessian, no
    inverse.  Suitable for sphere2500-scale graphs where a dense (D, D)
    inverse is not.
    """
    if block_name is None:
        (block_name,) = graph.blocks.keys()
    blk = graph.blocks[block_name]
    d = blk.dof
    if indices is None:
        indices = np.arange(blk.n)
    indices = np.asarray(indices)

    plan = build_ell_direct(graph, block_name)
    He, _, _ = assemble_ell(graph, plan)
    nb, K = plan.nb, plan.K
    cols = jnp.asarray(plan.cols)
    Minv = sym_block_inv(He[:, 0])

    # offset of this block in the global tangent layout
    off = graph.offsets()[block_name]

    def matvec(x):
        xg = x.reshape(nb, d)[cols]
        return jnp.einsum("rkij,rkj->ri", He, xg).reshape(-1)

    def precond(r):
        return jnp.einsum("nij,nj->ni", Minv, r.reshape(nb, d)).reshape(-1)

    D = nb * d

    def solve_col(col_idx):
        e = jnp.zeros(D, He.dtype).at[col_idx].set(1.0)
        x, _ = pcg_solve(matvec, e, precond=precond, rtol=pcg_rtol, max_iters=pcg_max_iters)
        return x

    col_ids = (off + indices[:, None] * d + np.arange(d)[None, :]).reshape(-1)
    X = jax.vmap(solve_col)(jnp.asarray(col_ids, jnp.int32))  # (k*d, D)
    X = X.reshape(len(indices), d, nb, d)
    rows = jnp.asarray(indices, jnp.int32)
    out = X[jnp.arange(len(indices)), :, rows, :]  # (k, d, d)
    return 0.5 * (out + jnp.swapaxes(out, -1, -2))


__all__ = ["full_covariance", "marginal_covariances"]
