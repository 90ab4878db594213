"""Variable marginalization: fold variables OUT of a graph, not drop them.

Beyond-reference capability (the reference solves batch problems only,
pyslam/problem.py per SURVEY.md §2.1): ``marginalize(graph, targets)``
removes the target variables and replaces every factor touching them with a
single dense Gaussian prior over their Markov blanket — the Schur
complement of the consumed information, linearized at the current estimates
(first-estimate Jacobians).  This is the GTSAM ``marginalizeLeaves`` /
OKVIS keyframe-culling operation: long-term SLAM needs to retire old poses
and merged landmarks WITHOUT forgetting what they constrained.

Design
------
* The transformation is a HOST-side structural edit (numpy f64): it
  reshapes the problem once, it is not a per-iteration path, so it does
  not belong under jit.  The *output* is an ordinary ``FactorGraph`` whose
  prior rides a registered batched kernel — every solver path (dense, ELL
  PCG, sparse direct, sharded) consumes it with no special cases.
* The dense prior factor evaluates
      r(x) = A @ eta(x) - c,   eta_i = log(x_i * x0_i^-1)  (left tangent)
  with frozen linearization points x0 (FEJ — the same convention as
  solver/fixed_lag.py, which keeps consistency/observability properties).
  A and c come from the eigen square root of the Schur complement
  (H' = A^T A, c = A^-T b'), with null directions (gauge freedoms of the
  consumed subgraph) cleanly truncated.
* One kernel is registered per blanket kind-signature
  (``dense_prior__<kinds>``); the factor data carries x0 / A / c, so
  repeated marginalizations of the same signature share compiled code.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from ..lie import se2, se3, sim3, so2, so3
from ..losses import L2Loss
from .core import (
    FACTOR_KERNELS,
    FactorBatch,
    FactorGraph,
    VariableBlock,
    manifold_dof,
)

_PRIOR_OPS = {"se3": se3, "se2": se2, "sim3": sim3, "so3": so3}


def _ensure_dense_prior_kernel(kinds: tuple) -> str:
    """Register (once) the batched dense-prior kernel for this slot
    kind-signature and return its registry name."""
    name = "dense_prior__" + "_".join(kinds)
    if name in FACTOR_KERNELS:
        return name

    def kernel(data, *vals, compute_jacobians=True):
        etas, jls = [], []
        for i, kind in enumerate(kinds):
            x = vals[i]
            x0 = data[f"x0_{i}"]
            if kind == "euclidean":
                eta = (x - x0).reshape(x.shape[0], -1)
                d = eta.shape[-1]
                jl = jnp.broadcast_to(
                    jnp.eye(d, dtype=x.dtype), eta.shape[:-1] + (d, d)
                )
            elif kind == "so2":
                eta = so2.log(x @ so2.inv(x0))[..., None]
                jl = jnp.ones(eta.shape[:-1] + (1, 1), x.dtype)
            else:
                ops = _PRIOR_OPS[kind]
                eta = ops.log(x @ ops.inv(x0))
                jl = ops.inv_left_jacobian(eta)
            etas.append(eta)
            jls.append(jl)
        eta = jnp.concatenate(etas, axis=-1)  # (F, m)
        r = jnp.einsum("fij,fj->fi", data["A"], eta) - data["c"]
        if not compute_jacobians:
            return r, None
        jacs, off = [], 0
        for i in range(len(kinds)):
            d = etas[i].shape[-1]
            Ablk = data["A"][..., :, off : off + d]  # (F, m, d)
            jacs.append(jnp.einsum("fmd,fde->fme", Ablk, jls[i]))
            off += d
        return r, tuple(jacs)

    FACTOR_KERNELS[name] = kernel
    return name


def _dof_span(graph: FactorGraph, block: str, idx: int):
    off = graph.offsets()[block]
    d = graph.blocks[block].dof
    start = off + idx * d
    return np.arange(start, start + d)


def marginalize(graph: FactorGraph, targets: dict, rank_tol: float = 1e-10):
    """Marginalize ``targets`` ({block_name: [indices]}) out of ``graph``.

    Returns a new FactorGraph in which the target variables are REMOVED
    (blocks shrunk, factor indices remapped), every factor touching them is
    consumed, and one dense-prior factor over their Markov blanket carries
    the consumed information (Schur complement at the current estimates).

    Raises ValueError for constant targets (marginalizing the gauge anchor
    would make the prior rank-deficient — keep the anchor, or transfer it
    to a unary prior first) and for targets whose consumed subgraph leaves
    them unconstrained (singular H_mm).
    """
    from ..solver.assemble import assemble_dense

    targets = {k: np.atleast_1d(np.asarray(v, np.int64)) for k, v in targets.items()}
    for bname, idxs in targets.items():
        if bname not in graph.blocks:
            raise ValueError(f"unknown block {bname!r}")
        cm = np.asarray(graph.blocks[bname].const_mask)
        if cm[idxs].any():
            raise ValueError(
                f"cannot marginalize constant variables in {bname!r} "
                "(transfer the gauge to a prior on a kept variable first)"
            )
    tset = {(b, int(i)) for b, idxs in targets.items() for i in idxs}

    # ---- split every batch into consumed rows (touch a target) and kept
    # rows.  The split is done with WEIGHT masks, never by slicing the data
    # arrays: per-factor vs batch-shared data (an unbatched sqrt_info, a
    # camera pytree) is not distinguishable from shapes alone, and weight-0
    # rows are provably inert in every solver path (the padding convention,
    # SURVEY.md §7).  The kept batch therefore retains dead rows; their
    # slot indices (which point at removed variables) are clamped to 0.
    consumed_batches, kept_parts = [], []
    blanket = set()
    for fb in graph.batches:
        idx_np = [np.asarray(ix) for ix in fb.indices]
        w_np = np.asarray(fb.weight)
        touch = np.zeros(fb.n, bool)
        for s, bname in enumerate(fb.slots):
            if bname in targets:
                touch |= np.isin(idx_np[s], targets[bname])
        if not touch.any():
            kept_parts.append((fb, None))
            continue
        consumed_batches.append(
            FactorBatch(
                fb.kind,
                fb.slots,
                fb.indices,
                fb.data,
                fb.loss,
                jnp.asarray(w_np * touch),
            )
        )
        if (~touch & (w_np > 0)).any():
            kept_parts.append((fb, touch))
        live = touch & (w_np > 0)
        for s, bname in enumerate(fb.slots):
            for i in idx_np[s][live]:
                key = (bname, int(i))
                if key not in tset and not bool(
                    np.asarray(graph.blocks[bname].const_mask)[int(i)]
                ):
                    blanket.add(key)

    blanket = sorted(blanket)

    # ---- linearize the consumed subgraph at the current estimates (FEJ)
    if consumed_batches:
        lin = FactorGraph(dict(graph.blocks), consumed_batches)
        H, b, _ = assemble_dense(lin)
        H = np.asarray(H, np.float64)
        b = np.asarray(b, np.float64)
        M = np.concatenate(
            [_dof_span(graph, bn, i) for bn, idxs in targets.items() for i in idxs]
        )
        Hmm = H[np.ix_(M, M)]
        # unconstrained targets -> singular Hmm; detect before inverting
        # (checked even with an empty blanket: silently discarding the
        # consumed information of an underconstrained target would violate
        # this function's contract)
        try:
            np.linalg.cholesky(Hmm)
        except np.linalg.LinAlgError:
            raise ValueError(
                "marginalization targets are not fully constrained by "
                "their adjacent factors (singular H_mm)"
            )
        if blanket:
            K = np.concatenate([_dof_span(graph, bn, i) for bn, i in blanket])
            HmmI_B = np.linalg.solve(Hmm, H[np.ix_(M, K)])
            Hp = H[np.ix_(K, K)] - H[np.ix_(K, M)] @ HmmI_B
            bp = b[K] - H[np.ix_(K, M)] @ np.linalg.solve(Hmm, b[M])
            Hp = 0.5 * (Hp + Hp.T)
            # eigen square root; truncate the consumed subgraph's gauge
            # directions (zero eigenvalues) instead of letting them poison A
            w, V = np.linalg.eigh(Hp)
            wmax = max(w.max(), 0.0)
            pos = w > rank_tol * max(wmax, 1.0)
            sqw = np.where(pos, np.sqrt(np.clip(w, 0.0, None)), 0.0)
            A = sqw[:, None] * V.T  # A^T A == Hp (on the retained spectrum)
            with np.errstate(divide="ignore"):
                isq = np.where(pos, 1.0 / np.where(pos, sqw, 1.0), 0.0)
            c = isq * (V.T @ bp)  # A^-T b' on the retained spectrum

    # ---- rebuild blocks without the targets; remap factor indices
    new_blocks = {}
    remap = {}
    for bname, blk in graph.blocks.items():
        drop = targets.get(bname)
        n = blk.n
        keep = np.ones(n, bool)
        if drop is not None:
            keep[drop] = False
        newidx = np.cumsum(keep) - 1
        remap[bname] = newidx
        if keep.all():
            new_blocks[bname] = blk
        else:
            new_blocks[bname] = VariableBlock(
                blk.kind,
                jnp.asarray(np.asarray(blk.values)[keep]),
                jnp.asarray(np.asarray(blk.const_mask)[keep]),
            )

    out_batches = []
    for fb, touch in kept_parts:
        need = any(bn in targets for bn in fb.slots)
        if not need and touch is None:
            out_batches.append(fb)
            continue
        new_indices = []
        for bn, ix in zip(fb.slots, fb.indices):
            ni = remap[bn][np.asarray(ix)] if bn in targets else np.asarray(ix)
            if touch is not None:
                # consumed rows stay in the batch with weight 0 (inert);
                # their indices may point at removed variables -> clamp
                ni = np.where(touch, 0, ni)
            new_indices.append(jnp.asarray(ni, jnp.int32))
        weight = fb.weight if touch is None else jnp.asarray(
            np.asarray(fb.weight) * ~touch
        )
        out_batches.append(
            FactorBatch(
                fb.kind, fb.slots, tuple(new_indices), fb.data, fb.loss, weight
            )
        )

    # ---- the dense prior factor over the blanket
    if consumed_batches and blanket:
        dtype = next(iter(graph.blocks.values())).values.dtype
        kinds = tuple(graph.blocks[bn].kind for bn, _ in blanket)
        kname = _ensure_dense_prior_kernel(kinds)
        data = {"A": jnp.asarray(A[None], dtype), "c": jnp.asarray(c[None], dtype)}
        for s, (bn, i) in enumerate(blanket):
            data[f"x0_{s}"] = jnp.asarray(np.asarray(graph.blocks[bn].values)[i])[
                None
            ].astype(dtype)
        out_batches.append(
            FactorBatch.create(
                kind=kname,
                slots=tuple(bn for bn, _ in blanket),
                indices=tuple(
                    np.array([remap[bn][i]], np.int32) for bn, i in blanket
                ),
                data=data,
                loss=L2Loss(),
            )
        )

    return FactorGraph(new_blocks, out_batches)
