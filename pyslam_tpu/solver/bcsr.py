"""Block-sparse (BCSR) normal equations + PCG for large pose graphs.

TPU-native replacement for scipy's sparse bmat/spsolve at sphere2500 scale
(SURVEY.md §2.2, benchmark config #3): the Hessian is stored as a flat array
of d x d blocks over the *upper* block-sparsity pattern (diagonal included),
which for a pose graph is one block per pose + one per unique edge — a few MB
that lives entirely in VMEM.

Design:
  * The sparsity pattern is computed host-side at build time from the
    (concrete) factor index arrays and baked into the jaxpr as static
    constants — scatters lower to fast static-index code.
  * Assembly is one fused linearize + scatter-add pass per factor batch
    (same residual kernels as the dense path).
  * The solve is block-Jacobi-preconditioned CG on the damped system; one
    SpMV is two batched (nnzb, d, d) x (nnzb, d) contractions + segment-sums.
  * ``solve_bcsr`` plugs these into the generic LM loop (lm.solve), so the
    trust-region logic is shared with the dense path.
"""

from __future__ import annotations

import dataclasses

import jax.numpy as jnp
import numpy as np

from ..graph.core import FactorGraph
from .assemble import free_mask, linearize_batch
from .linear import pcg_solve
from . import lm as _lm


@dataclasses.dataclass(frozen=True)
class BlockPattern:
    """Host-side static BCSR pattern for a single-block pose graph.

    rows/cols: (nnzb,) upper-triangular block coordinates (row <= col),
    lexicographically sorted, diagonal blocks first-class members.
    maps: per batch, a list of (slot_a, slot_b, pair_pos (F,), transpose (F,))
    entries steering each factor's block contribution to its pattern slot.
    """

    block_name: str
    nb: int
    d: int
    rows: np.ndarray
    cols: np.ndarray
    diag_pos: np.ndarray  # (nb,) position of each diagonal block
    maps: tuple  # per batch: tuple of (a, b, pos (F,), transpose (F,))

    @property
    def nnzb(self) -> int:
        return len(self.rows)


def build_pattern(graph: FactorGraph, block_name: str | None = None) -> BlockPattern:
    """Derive the static block-sparsity pattern from concrete factor indices."""
    if block_name is None:
        (block_name,) = graph.blocks.keys()
    blk = graph.blocks[block_name]
    nb, d = blk.n, blk.dof

    pair_set = {(i, i) for i in range(nb)}
    batch_pairs = []
    for fb in graph.batches:
        assert all(s == block_name for s in fb.slots), (
            "BCSR path supports a single variable block; use the Schur path "
            "for camera+landmark problems"
        )
        idx = [np.asarray(i) for i in fb.indices]
        slot_pairs = []
        for a in range(len(idx)):
            for b in range(a, len(idx)):
                ia, ib = idx[a], idx[b]
                r = np.minimum(ia, ib)
                c = np.maximum(ia, ib)
                pair_set.update(zip(r.tolist(), c.tolist()))
                slot_pairs.append((a, b, ia, ib))
        batch_pairs.append(slot_pairs)

    pairs = np.array(sorted(pair_set), np.int64)
    rows, cols = pairs[:, 0], pairs[:, 1]
    lookup = {(int(r), int(c)): p for p, (r, c) in enumerate(pairs)}
    diag_pos = np.array([lookup[(i, i)] for i in range(nb)], np.int32)

    maps = []
    for slot_pairs in batch_pairs:
        entries = []
        for a, b, ia, ib in slot_pairs:
            r = np.minimum(ia, ib)
            c = np.maximum(ia, ib)
            pos = np.array([lookup[(int(x), int(y))] for x, y in zip(r, c)], np.int32)
            transpose = ia > ib  # contribution lands transposed in upper store
            entries.append((a, b, pos, transpose))
        maps.append(tuple(entries))

    return BlockPattern(
        block_name, nb, d, rows.astype(np.int32), cols.astype(np.int32), diag_pos, tuple(maps)
    )


def assemble_bcsr(graph: FactorGraph, pattern: BlockPattern):
    """(H_blocks (nnzb, d, d), g (nb*d,), chi2) — fused linearize + IRLS +
    block scatter-add."""
    nb, d = pattern.nb, pattern.d
    dtype = graph.blocks[pattern.block_name].values.dtype
    H = jnp.zeros((pattern.nnzb, d, d), dtype)
    g = jnp.zeros(nb * d, dtype)
    chi2 = jnp.zeros((), dtype)

    for fb, entries in zip(graph.batches, pattern.maps):
        r, jacs, w, c2 = linearize_batch(fb, graph.blocks)
        chi2 = chi2 + c2
        wr = w * r
        for slot, idx, J in zip(fb.slots, fb.indices, jacs):
            ga = jnp.einsum("fmi,fm->fi", J, wr)
            rows = idx[:, None] * d + jnp.arange(d, dtype=jnp.int32)[None, :]
            g = g.at[rows.reshape(-1)].add(-ga.reshape(-1))
        for a, b, pos, transpose in entries:
            C = jnp.einsum("fmi,fm,fmj->fij", jacs[a], w, jacs[b])
            C = jnp.where(transpose[:, None, None], jnp.swapaxes(C, -1, -2), C)
            H = H.at[pos].add(C)

    # constant parameters: zero their rows/cols, unit diagonal on frozen dofs
    free = free_mask(graph).astype(dtype).reshape(nb, d)
    H = H * free[pattern.rows][:, :, None] * free[pattern.cols][:, None, :]
    eye = jnp.eye(d, dtype=dtype)
    H = H.at[pattern.diag_pos].add((1.0 - free)[:, :, None] * eye[None])
    g = g * free.reshape(-1)
    return H, g, chi2


def bcsr_matvec(H, pattern: BlockPattern, x):
    """y = H x with upper-block storage: one pass for the stored blocks plus
    one transposed pass for the strictly-upper blocks."""
    nb, d = pattern.nb, pattern.d
    xb = x.reshape(nb, d)
    upper = pattern.rows != pattern.cols  # static numpy mask
    y = jnp.zeros((nb, d), x.dtype)
    y = y.at[pattern.rows].add(jnp.einsum("pij,pj->pi", H, xb[pattern.cols]))
    Ht = jnp.swapaxes(H, -1, -2) * upper[:, None, None]
    y = y.at[pattern.cols].add(jnp.einsum("pij,pj->pi", Ht, xb[pattern.rows]))
    return y.reshape(-1)


def block_jacobi_inv(H, pattern: BlockPattern):
    """Inverse diagonal blocks for the preconditioner, via batched Cholesky +
    triangular solves.  (LU-based jnp.linalg.inv does not compile on this
    toolchain's remote-compile service; the blocks are SPD anyway.)"""
    from jax.scipy.linalg import solve_triangular

    D = H[pattern.diag_pos]
    L = jnp.linalg.cholesky(D)
    eye = jnp.broadcast_to(jnp.eye(pattern.d, dtype=H.dtype), D.shape)
    Y = solve_triangular(L, eye, lower=True)
    return solve_triangular(jnp.swapaxes(L, -1, -2), Y, lower=False)


def damp_blocks(H, pattern: BlockPattern, lam, floor=1e-12):
    """Marquardt damping on the diagonal blocks: H_ii += lam * diag(H_ii)."""
    D = H[pattern.diag_pos]
    diag = jnp.maximum(
        jnp.einsum("nii->ni", D), floor
    )
    return H.at[pattern.diag_pos].add(lam * jnp.einsum("ni,ij->nij", diag, jnp.eye(H.shape[-1], dtype=H.dtype)))


# Closure cache so repeated solves on one pattern reuse the jitted LM loop
# (lm.solve treats assemble_fn/solve_fn as static args).
_CLOSURES: dict = {}


def solve_bcsr(
    graph: FactorGraph,
    options: _lm.Options = _lm.Options(),
    pattern: BlockPattern | None = None,
    pcg_rtol: float = 1e-8,
    pcg_max_iters: int = 250,
):
    """GN/LM with block-sparse assembly + PCG linear solves.  Shares the LM
    trust-region loop with the dense path (lm.solve)."""
    if pattern is None:
        pattern = build_pattern(graph)
    key = (id(pattern), pcg_rtol, pcg_max_iters)
    if key in _CLOSURES:
        assemble_fn, solve_fn = _CLOSURES[key]
        return _lm.solve(graph, options, assemble_fn=assemble_fn, solve_fn=solve_fn)

    def assemble_fn(g):
        return assemble_bcsr(g, pattern)

    def solve_fn(H, g, lam, opt):
        Hd = damp_blocks(H, pattern, lam) if opt.method == "lm" else H
        Minv = block_jacobi_inv(Hd, pattern)
        nb, d = pattern.nb, pattern.d

        def matvec(x):
            return bcsr_matvec(Hd, pattern, x)

        def precond(r):
            return jnp.einsum("nij,nj->ni", Minv, r.reshape(nb, d)).reshape(-1)

        dx, _ = pcg_solve(
            matvec, g, precond=precond, rtol=pcg_rtol, max_iters=pcg_max_iters
        )
        return dx

    _CLOSURES[key] = (assemble_fn, solve_fn)
    return _lm.solve(graph, options, assemble_fn=assemble_fn, solve_fn=solve_fn)
