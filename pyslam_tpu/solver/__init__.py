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
from .covariance import (  # noqa: E402
    covariance_block,
    full_covariance,
    landmark_covariance_block,
    landmark_marginal_covariances,
    marginal_covariances,
    pose_covariance_block,
    pose_landmark_covariance_block,
    pose_marginal_covariances,
)

__all__ += [
    "EllDirect",
    "assemble_ell",
    "build_ell_direct",
    "solve_ell",
    "sym_block_inv",
    "full_covariance",
    "marginal_covariances",
    "covariance_block",
    "pose_covariance_block",
    "pose_marginal_covariances",
    "landmark_marginal_covariances",
    "landmark_covariance_block",
    "pose_landmark_covariance_block",
]


def solve_auto(
    graph,
    options=None,
    dense_dof_limit: int = 12000,
    dense_hpl_budget_bytes: int = 1 << 30,
):
    """Structure-dispatching solve: picks the right linear-algebra path.

    * camera + landmark blocks (one lie + one euclidean block coupled by
      binary factors)  -> Schur complement (dense S for small camera counts,
      implicit PCG otherwise)
    * camera + landmark beyond ~2M observations -> streamed component-major
      Schur (solver/schur_large.py); accepts pose-unary prior batches too
    * single variable block, total dof <= dense_dof_limit -> dense Cholesky
      (exact solves; pure MXU — measured fastest AND most robust up to
      ~10k dof, e.g. M3500)
    * single variable block, larger -> block-sparse ELL + PCG

    Returns (solved_graph, SolveInfo-or-history) matching the path's solver.
    """
    opts = options if options is not None else Options()
    blocks = graph.blocks
    kinds = {name: b.kind for name, b in blocks.items()}
    lie_blocks = [n for n, k in kinds.items() if k != "euclidean"]
    euc_blocks = [n for n, k in kinds.items() if k == "euclidean"]
    if len(blocks) == 2 and len(lie_blocks) == 1 and len(euc_blocks) == 1:
        pose_name, lm_name = lie_blocks[0], euc_blocks[0]
        binary = [fb for fb in graph.batches if fb.slots == (pose_name, lm_name)]
        others = [fb for fb in graph.batches if fb.slots != (pose_name, lm_name)]
        n_obs = sum(fb.n for fb in binary)
        if (
            n_obs > 2_000_000
            and len(binary) == 1
            and all(
                fb.slots in ((pose_name,), (pose_name, pose_name))
                for fb in others
            )
        ):
            # Block layouts tile to 21x their logical bytes in HBM; beyond
            # ~2M observations only the component-major streamed path fits
            # on a 16 GB chip (solver/schur_large.py).  schur_large supports
            # one binary batch plus any pose-unary prior batches
            # (schur_large.prepare_large_ba), so priors must NOT disqualify
            # a Venice-scale graph from this route.
            from .schur_large import solve_schur_large

            solved, chi2, hist = solve_schur_large(
                graph, opts, pose_name=pose_name, lm_name=lm_name
            )
            return solved, hist
        pb, lb = blocks[pose_name], blocks[lm_name]
        # Dense-S mode materializes Hpl and Ypl, each (C, dp, L, dl)
        # (schur.schur_solve_dense) — gate on that footprint too, or a
        # small-camera/many-landmark graph (BAL-Dubrovnik class) OOMs the
        # chip despite passing the camera-dof gate.
        itemsize = pb.values.dtype.itemsize
        hpl_bytes = pb.n * pb.dof * lb.n * lb.dof * itemsize
        mode = (
            "dense"
            if pb.n * pb.dof <= 4096 and 2 * hpl_bytes <= dense_hpl_budget_bytes
            else "pcg"
        )
        return solve_schur(graph, opts, mode=mode, pose_name=pose_name, lm_name=lm_name)
    if len(blocks) == 1 and graph.total_dof > dense_dof_limit:
        from .bcsr import solve_ell as _solve_ell

        return _solve_ell(graph, opts)
    return solve(graph, opts)


__all__ += ["solve_auto"]


def solve_batched(graphs, options=None):
    """Solve a FLEET of same-structure factor graphs in one vmapped jitted
    LM program — a capability the reference cannot express (its solver is a
    Python loop per problem).  Use cases: Monte-Carlo uncertainty (resampled
    measurements), multi-robot fleets, measurement-hyperparameter sweeps.

    ``graphs``: list of FactorGraphs with identical structure (same blocks,
    batch kinds, factor counts — values/measurements may differ), or a
    single pre-stacked graph pytree with a leading batch axis on every leaf.
    Returns (stacked_solved_values: dict name -> (B, ...), chi2 (B,)).

    The whole batch shares one compilation and runs as one XLA program;
    lax.while_loop under vmap steps until every problem converges.
    """
    import jax
    import jax.tree_util as jtu

    opts = options if options is not None else Options()
    if isinstance(graphs, (list, tuple)):
        stacked = jtu.tree_map(lambda *xs: jax.numpy.stack(xs), *graphs)
    else:
        stacked = graphs

    def _solve_one(g):
        solved, info = solve(g, opts)
        return {n: b.values for n, b in solved.blocks.items()}, info.chi2

    return jax.vmap(_solve_one)(stacked)


__all__ += ["solve_batched"]

from .diff import solve_implicit  # noqa: E402

__all__ += ["solve_implicit"]

from .schur_large import solve_schur_large  # noqa: E402

__all__ += ["solve_schur_large"]

from .host_loop import host_lm_loop  # noqa: E402

__all__ += ["host_lm_loop"]

from .schur_sqrt import solve_schur_sqrt  # noqa: E402

__all__ += ["solve_schur_sqrt"]
