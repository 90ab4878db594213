"""Differentiable solving: gradients THROUGH the converged solution.

A capability the reference cannot express and a natural JAX-native one:
``solve_implicit`` returns the optimized variable values as a function of
the factor measurements (``FactorBatch.data`` leaves), differentiable in
reverse mode via the implicit function theorem — O(1) memory, no unrolling
of the LM iteration:

    at the optimum:  grad_x chi2(x*, theta) = 0
    =>  dx*/dtheta = -H^{-1} d(grad_x chi2)/dtheta      (H = GN Hessian)

VJP given a cotangent ct on the solution values:
    1. pull ct back to the tangent space (⟨ct, G_i X*⟩ for the left
       SE(n)/SO(n) generators; identity for Euclidean blocks),
    2. solve H y = ct_t with the same assembly used by the forward solve,
    3. propagate -yᵀ ∂(grad chi2)/∂theta with one jax.vjp through the
       tangent-gradient function.

Uses: calibration learning (backprop from trajectory error to measurement
covariances / extrinsics), learned front-end training against a SLAM
back-end, sensitivity analysis.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from ..graph.core import FactorGraph, retract
from .assemble import assemble_dense
from .linear import cholesky_solve
from . import lm as _lm


def _tangent_cotangent(block, ct_values):
    """Pull a cotangent on the (batched) matrix values back to the tangent
    space of left-multiplicative perturbations: ct_t[i] = <ct, d/d eps_i
    exp(eps) X> = <ct, G_i X>."""
    kind = block.kind
    X = block.values
    if kind == "euclidean":
        return ct_values.reshape(X.shape[0], -1)
    if kind == "so2":
        G = jnp.asarray([[0.0, -1.0], [1.0, 0.0]], X.dtype)[None]  # (1, 2, 2)
    elif kind in ("se3", "se2", "so3"):
        from ..lie import se2, se3, so3

        ops = {"se3": se3, "se2": se2, "so3": so3}[kind]
        dof = {"se3": 6, "se2": 3, "so3": 3}[kind]
        eye = jnp.eye(dof, dtype=X.dtype)
        # generators applied to X: G_i X = wedge(e_i) @ X
        G = jax.vmap(ops.wedge)(eye)  # (dof, n, n)
    else:
        raise ValueError(f"unsupported kind {kind!r}")
    GX = jnp.einsum("dij,bjk->bdik", G, X)
    return jnp.einsum("bik,bdik->bd", ct_values, GX)


def _tangent_gradient(graph: FactorGraph, data_list):
    """grad_x chi2 over the global tangent space, as a function of the
    factor data leaves (for the theta-vjp)."""
    batches = []
    for fb, data in zip(graph.batches, data_list):
        batches.append(type(fb)(fb.kind, fb.slots, fb.indices, data, fb.loss, fb.weight))
    g2 = FactorGraph(graph.blocks, batches)
    _, g, _ = assemble_dense(g2)
    return -g  # assemble returns g = -grad


def solve_implicit(graph: FactorGraph, options: _lm.Options = _lm.Options()):
    """Solve and return ``(values_dict, chi2)`` where ``values_dict`` is
    differentiable w.r.t. every array leaf of every ``FactorBatch.data``
    (measurements, information weights, ...).

    Uses the dense assembly for H (suited to the small/medium calibration-
    style problems where gradients are wanted)."""
    data_list = [dict(fb.data) for fb in graph.batches]
    # data-free skeleton: the custom_vjp closure must not capture any traced
    # leaf (the caller's data arrays may be tracers under jax.grad); every
    # traced value flows through the data_list argument instead
    from ..graph.core import FactorBatch as _FB

    skeleton = FactorGraph(
        dict(graph.blocks),
        [
            _FB(fb.kind, fb.slots, fb.indices, {}, fb.loss, fb.weight)
            for fb in graph.batches
        ],
    )
    graph = skeleton

    @jax.custom_vjp
    def _solve(data_list):
        return _solve_fwd_impl(data_list)[0]

    def _solve_fwd_impl(data_list):
        batches = []
        for fb, data in zip(graph.batches, data_list):
            batches.append(
                type(fb)(fb.kind, fb.slots, fb.indices, data, fb.loss, fb.weight)
            )
        g2 = FactorGraph(graph.blocks, batches)
        solved, info = _lm.solve(g2, options)
        values = {n: b.values for n, b in solved.blocks.items()}
        return (values, info.chi2), (values, data_list)

    def _fwd(data_list):
        out, res = _solve_fwd_impl(data_list)
        return out, res

    def _bwd(res, ct):
        values, data_list = res
        ct_values, ct_chi2 = ct
        # solved graph at the optimum (skeleton batches + the data leaves)
        solved_blocks = {
            n: type(b)(b.kind, values[n], b.const_mask)
            for n, b in graph.blocks.items()
        }
        star_batches = [
            type(fb)(fb.kind, fb.slots, fb.indices, data, fb.loss, fb.weight)
            for fb, data in zip(graph.batches, data_list)
        ]
        g_star = FactorGraph(solved_blocks, star_batches)

        # 1. cotangent -> tangent space, respecting constant masks
        segs = []
        for n, b in g_star.blocks.items():
            ct_t = _tangent_cotangent(b, ct_values[n])
            ct_t = jnp.where(b.const_mask[:, None], 0.0, ct_t)
            segs.append(ct_t.reshape(-1))
        ct_flat = jnp.concatenate(segs)

        # 2. H y = ct_t at the optimum (same masking as the forward assembly)
        H, _, _ = assemble_dense(g_star)
        y = cholesky_solve(H, ct_flat)

        # 3. theta-vjp through the tangent gradient
        _, vjp_fn = jax.vjp(lambda dl: _tangent_gradient(g_star, dl), data_list)
        (d_data,) = vjp_fn(-y)

        # chi2* path (envelope theorem: grad_x chi2 = 0 at the optimum, so
        # d chi2*/d theta is the direct partial)
        def _chi2_of(dl):
            batches = []
            for fb, data in zip(graph.batches, dl):
                batches.append(
                    type(fb)(fb.kind, fb.slots, fb.indices, data, fb.loss, fb.weight)
                )
            return FactorGraph(g_star.blocks, batches).chi2()

        _, vjp_c = jax.vjp(_chi2_of, data_list)
        (d_data_c,) = vjp_c(ct_chi2)
        d_data = jax.tree_util.tree_map(jnp.add, d_data, d_data_c)
        return (d_data,)

    _solve.defvjp(_fwd, _bwd)
    return _solve(data_list)


__all__ = ["solve_implicit"]
