"""Variable-sharded pose-graph solving — the tensor-parallel analogue
(SURVEY.md §2.3 row 'TP': "variable blocks partitioned across chips,
separator variables replicated and all_gathered").

Layout
------
* Poses are partitioned over the mesh (``partition_poses_bfs`` by default:
  contiguous low-cut segments on trajectory-like graphs) and permuted so
  each device owns a contiguous padded slab of ``Pb`` poses.  The POSE STATE
  is tiny (50k SE(3) poses = 3 MB), so separator replication is implemented
  as one ``all_gather`` of the full slab per linearization / cost
  evaluation — cheaper over ICI than variable-size separator exchanges, and
  the big objects (the ELL Hessian rows, the factor data, the CG vectors)
  never leave their device.
* Each factor is REPLICATED onto every device owning one of its endpoint
  poses (cut factors: at most #slots copies; BFS partitions make these
  O(n_parts) of the edge set).  Each copy scatters only the Hessian/gradient
  rows its device owns — assembly needs zero communication beyond the pose
  all_gather, the standard ghost/halo trick.
* The sharded system is the same diagonal-at-slot-0 symmetric ELL layout as
  the single-chip fast path (solver/bcsr.py ``solve_ell``): damping and the
  block-Jacobi preconditioner are slices, every CG matvec is one local
  gather + batched einsum from the gathered x.
* PCG runs distributed: local matvec rows, ``psum`` dot products, one
  (n*Pb, d) ``all_gather`` of x per matvec.

chi2 bookkeeping: every copy evaluates its factor fully (identical IRLS
weights on each copy), but only the PRIMARY copy (owner of the slot-0
endpoint) counts the factor's cost, so psum'd chi2 counts each factor once.

The LM accept/reject loop is the shared host loop (solver/host_loop.py).
"""

from __future__ import annotations

import dataclasses
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax import shard_map
from jax.sharding import Mesh, PartitionSpec as P

from ..graph.core import FACTOR_KERNELS, FactorGraph, VariableBlock, retract
from ..solver import lm as _lm
from ..solver.bcsr import sym_block_inv
from ..solver.host_loop import host_lm_loop
from .partitioner import Partition, partition_poses_bfs


@dataclasses.dataclass
class ShardedPoseGraph:
    """Host-side plan + padded device arrays for one pose graph."""

    mesh: Mesh
    axis: str
    n_dev: int
    block_name: str
    kind: str  # manifold kind
    nb: int  # true pose count
    Pb: int  # poses per device (padded)
    d: int  # tangent dof
    K: int  # ELL row width (1 + max neighbor count)
    pose_slab: jnp.ndarray  # (n*Pb, *shape) sharded
    free_slab: jnp.ndarray  # (n*Pb,) 1.0 where free
    cols: jnp.ndarray  # (n*Pb, K) int32 GLOBAL slab ids
    batch_arrays: tuple  # per batch: dict of (n*Fb, ...) sharded arrays
    batch_static: tuple  # per batch: (kind, loss, n_slots, pair_labels, static_data)
    slot_of: np.ndarray  # (nb,) pose id -> slab slot


def _identity_fill(kind: str, shape, n, dtype):
    if kind == "euclidean":
        return np.zeros((n,) + shape, dtype)
    eye = np.eye(shape[0], dtype=dtype)
    return np.tile(eye, (n,) + (1,) * len(shape))


def shard_pose_graph(
    graph: FactorGraph,
    mesh: Mesh,
    axis: str = "p",
    partition: Partition | None = None,
) -> ShardedPoseGraph:
    """Build the variable-sharded layout from a single-block factor graph."""
    n = mesh.shape[axis]
    (name,) = graph.blocks.keys()
    blk = graph.blocks[name]
    nb, dof = blk.n, blk.dof

    # ---- pose partition (BFS over the union of all binary edges) ----
    if partition is None:
        eis, ejs = [np.zeros(0, np.int64)], [np.zeros(0, np.int64)]
        for fb in graph.batches:
            idx = [np.asarray(i, np.int64) for i in fb.indices]
            for a in range(len(idx)):
                for b in range(a + 1, len(idx)):
                    m = idx[a] != idx[b]
                    eis.append(idx[a][m])
                    ejs.append(idx[b][m])
        partition = partition_poses_bfs(
            np.concatenate(eis), np.concatenate(ejs), nb, n
        )
    part = partition.part
    assert len(part) == nb and partition.n_parts == n

    order = np.argsort(part, kind="stable")
    counts = np.bincount(part, minlength=n)
    Pb = int(max(1, counts.max()))
    starts = np.concatenate([[0], np.cumsum(counts)[:-1]])
    rank = np.arange(nb) - starts[part[order]]
    slot_of = np.empty(nb, np.int64)
    slot_of[order] = part[order] * Pb + rank
    Nslab = n * Pb

    vals = np.asarray(blk.values)
    slab = _identity_fill(blk.kind, vals.shape[1:], Nslab, vals.dtype)
    slab[slot_of] = vals
    free = np.zeros(Nslab, vals.dtype)
    free[slot_of] = (~np.asarray(blk.const_mask)).astype(vals.dtype)

    # ---- global symmetric ELL structure on slab slots (diag at slot 0) ----
    us, vs = [np.zeros(0, np.int64)], [np.zeros(0, np.int64)]
    batch_sidx = []
    for fb in graph.batches:
        sidx = [slot_of[np.asarray(i, np.int64)] for i in fb.indices]
        batch_sidx.append(sidx)
        for a in range(len(sidx)):
            for b in range(a + 1, len(sidx)):
                m = sidx[a] != sidx[b]
                us.append(sidx[a][m])
                vs.append(sidx[b][m])
                us.append(sidx[b][m])
                vs.append(sidx[a][m])
    u = np.concatenate(us)
    v = np.concatenate(vs)
    keys = np.unique(u * Nslab + v)
    eu, ev = keys // Nslab, keys % Nslab
    row_counts = np.bincount(eu, minlength=Nslab)
    K = 1 + (int(row_counts.max()) if len(keys) else 0)
    row_starts = np.concatenate([[0], np.cumsum(row_counts)[:-1]])
    erank = np.arange(len(keys)) - row_starts[eu]

    cols = np.tile(np.arange(Nslab, dtype=np.int32)[:, None], (1, K))
    cols[eu, 1 + erank] = ev.astype(np.int32)

    def ell_pos(uu, vv):
        """Flat LOCAL position of block (row uu, col vv) in owner(uu)'s
        (Pb*K,) ELL store; diagonal lands at slot 0."""
        if len(keys) == 0:  # unary-only graph: every block is diagonal
            slot = np.zeros(np.shape(uu), np.int64)
        else:
            pos = np.searchsorted(keys, uu * Nslab + vv)
            slot = 1 + erank[np.minimum(pos, len(keys) - 1)]
            slot = np.where(uu == vv, 0, slot)
        return ((uu % Pb) * K + slot).astype(np.int32)

    # ---- per-batch factor copies, bucketed by device ----
    batch_arrays, batch_static = [], []
    for fb, sidx in zip(graph.batches, batch_sidx):
        S = len(fb.slots)
        F = fb.n
        own = [s // Pb for s in sidx]
        fkeys = np.unique(
            np.concatenate([np.arange(F, dtype=np.int64) * n + o for o in own])
        )
        cf, cd = fkeys // n, fkeys % n  # copy -> (factor, device); sorted by cf
        ordc = np.argsort(cd, kind="stable")
        cf, cd = cf[ordc], cd[ordc]
        ccounts = np.bincount(cd, minlength=n)
        Fb = int(max(1, ccounts.max()))
        cstarts = np.concatenate([[0], np.cumsum(ccounts)[:-1]])
        crank = np.arange(len(cf)) - cstarts[cd]
        dest = (cd * Fb + crank).astype(np.int64)

        def put(src, fill=0):
            src = np.asarray(src)
            out = np.full((n * Fb,) + src.shape[1:], fill, src.dtype)
            out[dest] = src[cf]
            return jnp.asarray(out)

        def put_rep(src):
            """Pad with a REPLICATED valid row, never zeros (ADVICE r2): a
            zero T_obs/sqrt_info row would NaN any future kernel with a
            division or normalization, and NaN * zero-mask still poisons
            the psum'd chi2 (0 * inf).  Same safe-fill convention as
            schur_reduce/schur_cm's lm_vals[:, -1] = 1.0."""
            src = np.asarray(src)
            if len(cf) == 0 or len(src) == 0:
                return put(src)
            out = np.broadcast_to(
                src[cf[0]], (n * Fb,) + src.shape[1:]
            ).copy()
            out[dest] = src[cf]
            return jnp.asarray(out)

        arrs = {}
        for s in range(S):
            arrs[f"sidx{s}"] = put_rep(sidx[s].astype(np.int32))
            arrs[f"grow{s}"] = put_rep((sidx[s] % Pb).astype(np.int32))
            # gradient mask: this copy's device must own the slot's endpoint
            m = np.zeros(n * Fb, vals.dtype)
            m[dest] = (own[s][cf] == cd).astype(vals.dtype)
            arrs[f"gmask{s}"] = jnp.asarray(m)
        w = np.asarray(fb.weight)
        arrs["w"] = put(w)
        cm = np.zeros(n * Fb, vals.dtype)
        cm[dest] = (own[0][cf] == cd) * w[cf]
        arrs["wc"] = jnp.asarray(cm)  # weight * primary-copy mask (chi2)

        pair_labels = []
        for a in range(S):
            for b in range(a, S):
                arrs[f"pos{a}{b}"] = put_rep(ell_pos(sidx[a], sidx[b]))
                m = np.zeros(n * Fb, vals.dtype)
                m[dest] = (own[a][cf] == cd).astype(vals.dtype)
                arrs[f"mask{a}{b}"] = jnp.asarray(m)
                if a != b:
                    arrs[f"pos{b}{a}"] = put_rep(ell_pos(sidx[b], sidx[a]))
                    mt = np.zeros(n * Fb, vals.dtype)
                    mt[dest] = (own[b][cf] == cd).astype(vals.dtype)
                    arrs[f"mask{b}{a}"] = jnp.asarray(mt)
                pair_labels.append((a, b))

        static_data = {}
        for kk, vv in fb.data.items():
            if hasattr(vv, "ndim") and getattr(vv, "ndim", 0) >= 1 and vv.shape[0] == F:
                arrs[f"data_{kk}"] = put_rep(vv)
            else:
                static_data[kk] = vv
        batch_arrays.append(arrs)
        batch_static.append((fb.kind, fb.loss, S, tuple(pair_labels), static_data))

    return ShardedPoseGraph(
        mesh=mesh,
        axis=axis,
        n_dev=n,
        block_name=name,
        kind=blk.kind,
        nb=nb,
        Pb=Pb,
        d=dof,
        K=K,
        pose_slab=jnp.asarray(slab),
        free_slab=jnp.asarray(free),
        cols=jnp.asarray(cols),
        batch_arrays=tuple(batch_arrays),
        batch_static=tuple(batch_static),
        slot_of=slot_of,
    )


def _pcg_dist(matvec, precond, b, axis, rtol, max_iters):
    """Distributed PCG: local shard vectors, psum'd dot products.  Control
    flow is uniform across devices because every scalar it branches on is a
    psum (identical on all shards)."""

    def pdot(x, y):
        return jax.lax.psum(jnp.vdot(x, y), axis)

    tol2 = (rtol**2) * pdot(b, b)

    def body(state):
        x, r, z, p, rz, rr, it = state
        Ap = matvec(p)
        pAp = pdot(p, Ap)
        ok = (rz > 0.0) & (pAp > 0.0)
        alpha = jnp.where(ok, rz / jnp.where(ok, pAp, 1.0), 0.0)
        x = x + alpha * p
        r = jnp.where(ok, r - alpha * Ap, r)
        z = precond(r)
        rz_new = jnp.where(ok, pdot(r, z), rz)
        beta = jnp.where(ok, rz_new / jnp.where(ok, rz, 1.0), 0.0)
        p = jnp.where(ok, z + beta * p, p)
        return x, r, z, p, rz_new, pdot(r, r), it + 1

    def cond(state):
        return (state[5] > tol2) & (state[6] < max_iters)

    r0 = b  # x0 = 0
    z0 = precond(r0)
    state = (
        jnp.zeros_like(b), r0, z0, z0, pdot(r0, z0), pdot(r0, r0),
        jnp.zeros((), jnp.int32),
    )
    state = jax.lax.while_loop(cond, body, state)
    return state[0]


def make_pose_sharded_step(
    sp: ShardedPoseGraph,
    options: _lm.Options,
    pcg_rtol: float = 1e-8,
    pcg_max_iters: int = 250,
):
    """One variable-sharded LM iteration under shard_map.

    step(pose_slab, batch_arrays, lam)
      -> (new_pose_slab, chi2, cost_new, dx_norm)
    """
    axis, Pb, d, K = sp.axis, sp.Pb, sp.d, sp.K
    kind_m = sp.kind
    batch_static = sp.batch_static
    mesh = sp.mesh
    free_slab = sp.free_slab
    cols_slab = sp.cols

    def _chi2_only(poses_full, barrs):
        total = 0.0
        for arrs, (kind, loss, S, _pairs, static_data) in zip(barrs, batch_static):
            data = {k[5:]: v for k, v in arrs.items() if k.startswith("data_")}
            vals = [poses_full[arrs[f"sidx{s}"]] for s in range(S)]
            r, _ = FACTOR_KERNELS[kind]({**data, **static_data}, *vals, compute_jacobians=False)
            total = total + jnp.sum(loss.loss(r) * arrs["wc"][:, None])
        return total

    in_specs = (
        P(axis),  # pose_slab
        P(axis),  # free_slab
        P(axis),  # cols
        jax.tree_util.tree_map(lambda _: P(axis), sp.batch_arrays),
        P(),  # lam
    )
    out_specs = (P(axis), P(), P(), P())

    @partial(shard_map, mesh=mesh, in_specs=in_specs, out_specs=out_specs, check_vma=False)
    def step(pose_slab, free_l, cols_l, barrs, lam):
        dtype = pose_slab.dtype
        # separator replication: one all_gather of the (tiny) pose state
        poses_full = jax.lax.all_gather(pose_slab, axis, tiled=True)
        free_full = jax.lax.all_gather(free_l, axis, tiled=True)

        # ---- local assembly into diag-at-slot-0 symmetric ELL ----
        He = jnp.zeros((Pb * K, d, d), dtype)
        g = jnp.zeros(Pb * d, dtype)
        chi2 = jnp.zeros((), dtype)
        for arrs, (kind, loss, S, pairs, static_data) in zip(barrs, batch_static):
            data = {k[5:]: v for k, v in arrs.items() if k.startswith("data_")}
            vals = [poses_full[arrs[f"sidx{s}"]] for s in range(S)]
            r, jacs = FACTOR_KERNELS[kind]({**data, **static_data}, *vals, compute_jacobians=True)
            w = loss.weight(r) * arrs["w"][:, None]
            chi2 = chi2 + jnp.sum(loss.loss(r) * arrs["wc"][:, None])
            wr = w * r
            for s in range(S):
                ga = jnp.einsum("fmi,fm->fi", jacs[s], wr) * arrs[f"gmask{s}"][:, None]
                rows = arrs[f"grow{s}"][:, None] * d + jnp.arange(d, dtype=jnp.int32)[None, :]
                g = g.at[rows.reshape(-1)].add(-ga.reshape(-1))
            for a, b in pairs:
                C = jnp.einsum("fmi,fm,fmj->fij", jacs[a], w, jacs[b])
                He = He.at[arrs[f"pos{a}{b}"]].add(C * arrs[f"mask{a}{b}"][:, None, None])
                if a != b:
                    He = He.at[arrs[f"pos{b}{a}"]].add(
                        jnp.swapaxes(C, -1, -2) * arrs[f"mask{b}{a}"][:, None, None]
                    )
        He = He.reshape(Pb, K, d, d)

        # constant dofs: zero rows/cols, unit diagonal (assemble_ell semantics)
        fr = free_l.astype(dtype)  # (Pb,) per-pose free flag
        fr_d = jnp.broadcast_to(fr[:, None], (Pb, d))
        fc = free_full[cols_l].astype(dtype)  # (Pb, K)
        He = He * fr[:, None, None, None] * fc[:, :, None, None]
        eye = jnp.eye(d, dtype=dtype)
        He = He.at[:, 0].add((1.0 - fr)[:, None, None] * eye[None])
        g = (g.reshape(Pb, d) * fr_d).reshape(-1)
        # degree-0 live rows: unit diagonal so the preconditioner stays SPD
        dead = (jnp.einsum("nii->n", He[:, 0]) == 0.0).astype(dtype)
        He = He.at[:, 0].add(dead[:, None, None] * eye[None])

        # ---- damp (slice) + block-Jacobi + distributed PCG ----
        D = He[:, 0]
        if options.method == "lm":
            diag = jnp.maximum(jnp.einsum("nii->ni", D), 1e-12)
            D = D + lam * diag[:, :, None] * eye
            He_d = He.at[:, 0].set(D)
        else:
            He_d = He
        Minv = sym_block_inv(D)

        def matvec(x):
            xf = jax.lax.all_gather(x.reshape(Pb, d), axis, tiled=True)
            return jnp.einsum("rkij,rkj->ri", He_d, xf[cols_l]).reshape(-1)

        def precond(rr):
            return jnp.einsum("nij,nj->ni", Minv, rr.reshape(Pb, d)).reshape(-1)

        dx = _pcg_dist(matvec, precond, g, axis, pcg_rtol, pcg_max_iters)
        dx = (dx.reshape(Pb, d) * fr_d)
        dx_norm = jnp.sqrt(jax.lax.psum(jnp.sum(dx**2), axis))

        # ---- retract + trial cost ----
        new_slab = retract(kind_m, pose_slab, dx)
        chi2 = jax.lax.psum(chi2, axis)
        new_full = jax.lax.all_gather(new_slab, axis, tiled=True)
        cost_new = jax.lax.psum(_chi2_only(new_full, barrs), axis)
        return new_slab, chi2, cost_new, dx_norm

    return step


def solve_pose_sharded(
    graph: FactorGraph,
    mesh: Mesh,
    options: _lm.Options = _lm.Options(),
    axis: str = "p",
    partition: Partition | None = None,
    pcg_rtol: float = 1e-8,
    pcg_max_iters: int = 250,
    checkpoint_path: str | None = None,
    checkpoint_every: int = 5,
    resume: bool = False,
):
    """Full variable-sharded pose-graph LM solve.  Returns
    (solved_graph, final_chi2, cost_history).

    Elastic recovery (SURVEY.md §5, same contract as schur_reduce): with
    ``checkpoint_path`` set, (original-order pose values, lambda) snapshot
    every ``checkpoint_every`` accepted iterations; ``resume=True`` restarts
    from the snapshot.  Checkpoints are MESH-INDEPENDENT (values stored in
    original pose order, not slab order), so a snapshot written on n
    devices resumes on any mesh — the kill-one-host path."""
    sp = shard_pose_graph(graph, mesh, axis, partition)
    step = jax.jit(make_pose_sharded_step(sp, options, pcg_rtol, pcg_max_iters))
    dtype = np.asarray(sp.pose_slab).dtype

    if checkpoint_path is not None and not checkpoint_path.endswith(".npz"):
        checkpoint_path = checkpoint_path + ".npz"
    slab0 = sp.pose_slab
    opts = options
    if resume and checkpoint_path is not None:
        import os

        if os.path.exists(checkpoint_path):
            ck = np.load(checkpoint_path)
            slab = np.asarray(sp.pose_slab).copy()
            slab[sp.slot_of] = ck["values"]
            slab0 = jnp.asarray(slab)
            opts = dataclasses.replace(options, lambda_init=float(ck["lam"]))

    def lm_step(slab, lam):
        new_slab, chi2, cost_new, dx_norm = step(
            slab, sp.free_slab, sp.cols, sp.batch_arrays, jnp.asarray(lam, dtype)
        )
        return new_slab, chi2, cost_new, dx_norm

    def _on_accept(state, lam, n_accepted):
        if checkpoint_path is not None and n_accepted % checkpoint_every == 0:
            np.savez(
                checkpoint_path.removesuffix(".npz"),
                values=np.asarray(state)[sp.slot_of],
                lam=lam,
            )

    slab, history, _info = host_lm_loop(lm_step, slab0, opts, on_accept=_on_accept)

    blk = graph.blocks[sp.block_name]
    values = jnp.asarray(np.asarray(slab)[sp.slot_of])
    solved = FactorGraph(
        {sp.block_name: VariableBlock(blk.kind, values, blk.const_mask)},
        graph.batches,
    )
    return solved, float(solved.chi2()), history


__all__ = [
    "ShardedPoseGraph",
    "shard_pose_graph",
    "make_pose_sharded_step",
    "solve_pose_sharded",
]
