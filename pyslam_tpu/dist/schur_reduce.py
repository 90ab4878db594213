"""Distributed Schur-complement bundle adjustment: landmark-sharded reduction
(SURVEY.md §2.3 row 'SP/CP': the sequence-parallel / ring-attention analogue,
and the BASELINE.json config #5 path).

Sharding layout (BASELINE.json:5 "partitioning the factor graph into
pose/landmark blocks per chip, with Schur-complement reduction and
gradient/Hessian-block accumulation via psum/all-gather collectives"):

  * camera poses         — replicated (C is small vs L; Venice: ~1.7k vs ~1M)
  * landmarks            — sharded over the mesh ('l' axis), each chip owns a
                           contiguous slab (optionally a partitioner layout)
  * observations         — co-located with their landmark's owner, so the
                           whole landmark elimination (Hll build, 3x3
                           Cholesky, back-substitution) is chip-local
  * reduced camera system— implicit-S PCG: every S-matvec does chip-local
                           gathers/segment-sums + ONE psum over the mesh —
                           the blockwise-streaming Schur analogue of ring
                           attention's all-to-all-free accumulation

The LM accept/reject loop runs host-side over the jitted sharded step
(mirroring dist/factor_parallel.solve_factor_parallel).
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
from ..solver.linear import pcg_solve
from ..solver.schur import _binv, _binv_apply, _damp_blocks
from .partitioner import Partition, partition_landmarks


@dataclasses.dataclass
class ShardedBA:
    """Host-side sharding plan + padded device arrays for one BA graph."""

    mesh: Mesh
    axis: str
    kind: str  # binary factor kernel name
    pose_kind: str  # pose manifold ('se3' | 'se2' | 'sim3' | 'bal_cam9')
    n_dev: int
    C: int
    L: int  # true landmark count
    Lb: int  # landmarks per device (padded)
    Mb: int  # observations per device (padded)
    dp: int
    dl: int
    poses: jnp.ndarray  # (C, 4, 4) replicated
    free_p: jnp.ndarray  # (C,)
    lm_slab: jnp.ndarray  # (n*Lb, dl) sharded
    free_l: jnp.ndarray  # (n*Lb,)
    obs_data: dict  # per-obs arrays, leading axis n*Mb, sharded
    cam_idx: jnp.ndarray  # (n*Mb,)
    pt_local: jnp.ndarray  # (n*Mb,) index into the owner's slab
    weight: jnp.ndarray  # (n*Mb,)
    static_data: dict  # non-array kernel data (camera pytree), captured
    loss: object
    unary: list  # [(kind, indices, data, loss, weight)] pose-unary batches
    lm_perm: np.ndarray  # (L,) original landmark id of permuted slot


def shard_ba(
    graph: FactorGraph,
    mesh: Mesh,
    axis: str = "l",
    pose_name: str = "poses",
    lm_name: str = "landmarks",
    partition: Partition | None = None,
) -> ShardedBA:
    """Build the landmark-sharded layout from a BA FactorGraph."""
    n = mesh.shape[axis]
    pb, lb = graph.blocks[pose_name], graph.blocks[lm_name]
    C, dp = pb.n, pb.dof
    L, dl = lb.n, lb.dof

    binary = [fb for fb in graph.batches if fb.slots == (pose_name, lm_name)]
    unary_p = [fb for fb in graph.batches if fb.slots == (pose_name,)]
    between_p = [fb for fb in graph.batches if fb.slots == (pose_name, pose_name)]
    assert len(binary) == 1, "shard_ba expects exactly one pose-landmark batch"
    assert len(binary) + len(unary_p) + len(between_p) == len(graph.batches), (
        "shard_ba supports pose-landmark, pose-unary, and pose-pose batches"
    )
    fb = binary[0]

    if partition is None:
        partition = partition_landmarks(None, None, L, n_parts=n)
    part = partition.part

    # permute landmarks so each device's slab is contiguous (vectorized —
    # Venice-scale graphs have ~1M landmarks)
    order = np.argsort(part, kind="stable")
    counts = np.bincount(part, minlength=n)
    Lb = int(counts.max())
    part_starts = np.concatenate([[0], np.cumsum(counts)[:-1]])
    rank_sorted = np.arange(L) - part_starts[part[order]]  # rank within part
    slot_of = np.empty(L, np.int64)  # landmark -> padded slab slot
    slot_of[order] = part[order] * Lb + rank_sorted

    lm_vals = np.zeros((n * Lb, dl), np.asarray(lb.values).dtype)
    # Padded slab slots get a SAFE point (unit last component, i.e. off the
    # camera plane) instead of the origin: padded observations reference
    # local slot 0, and if a device owns zero landmarks a zero-filled point
    # can put z=0 through a projection kernel -> inf, and 0 * inf = NaN
    # poisons the psum'd chi2 even at padding weight 0.
    lm_vals[:, -1] = 1.0
    lm_vals[slot_of] = np.asarray(lb.values)
    free_l = np.zeros(n * Lb)
    free_l[slot_of] = (~np.asarray(lb.const_mask)).astype(np.float64)
    lm_perm = slot_of  # maps original landmark id -> slab position

    # observations: owner = landmark's part; bucket + pad per device
    # (vectorized — Venice-scale problems have millions of observations)
    cam_idx = np.asarray(fb.indices[0])
    pt_idx = np.asarray(fb.indices[1])
    owner = part[pt_idx]
    obs_order = np.argsort(owner, kind="stable")
    ocounts = np.bincount(owner, minlength=n)
    Mb = int(max(1, ocounts.max()))
    ostarts = np.concatenate([[0], np.cumsum(ocounts)[:-1]])
    orank = np.arange(len(obs_order)) - ostarts[owner[obs_order]]
    dest = owner[obs_order] * Mb + orank  # padded position of obs_order[k]

    def pad_obs(arr, fill=0.0):
        arr = np.asarray(arr)
        out = np.full((n * Mb,) + arr.shape[1:], fill, arr.dtype)
        out[dest] = arr[obs_order]
        return out

    cam_pad = pad_obs(cam_idx).astype(np.int32)
    pt_pad = pad_obs(slot_of[pt_idx] % Lb).astype(np.int32)  # local slot
    w_pad = pad_obs(np.asarray(fb.weight), fill=0.0)
    obs_data, static_data = {}, {}
    M = len(cam_idx)
    for k, v in fb.data.items():
        if hasattr(v, "ndim") and getattr(v, "ndim", 0) >= 1 and v.shape[0] == M:
            obs_data[k] = jnp.asarray(pad_obs(v))
        else:
            static_data[k] = v

    unary = [
        (u.kind, jnp.asarray(u.indices[0]), dict(u.data), u.loss, u.weight)
        for u in unary_p
    ] + [
        # pose-pose (full-SLAM between) factors: replicated like unary —
        # a 2-tuple of index arrays marks the binary form
        (b.kind, (jnp.asarray(b.indices[0]), jnp.asarray(b.indices[1])),
         dict(b.data), b.loss, b.weight)
        for b in between_p
    ]
    return ShardedBA(
        mesh=mesh, axis=axis, kind=fb.kind, pose_kind=pb.kind, n_dev=n, C=C, L=L, Lb=Lb, Mb=Mb,
        dp=dp, dl=dl,
        poses=jnp.asarray(pb.values),
        free_p=jnp.asarray((~np.asarray(pb.const_mask)).astype(np.float64)),
        lm_slab=jnp.asarray(lm_vals),
        free_l=jnp.asarray(free_l),
        obs_data=obs_data,
        cam_idx=jnp.asarray(cam_pad),
        pt_local=jnp.asarray(pt_pad),
        weight=jnp.asarray(w_pad),
        static_data=static_data,
        loss=fb.loss,
        unary=unary,
        lm_perm=lm_perm,
    )


def make_sharded_schur_step(
    sb: ShardedBA,
    options: _lm.Options,
    pcg_rtol: float = 1e-8,
    pcg_max_iters: int = 200,
):
    """One landmark-sharded Schur LM iteration under shard_map.

    step(poses, lm_slab, obs_data, cam_idx, pt_local, weight, lam)
      -> (new_poses, new_lm_slab, chi2, cost_new, dx_norm)
    """
    axis = sb.axis
    C, dp, dl = sb.C, sb.dp, sb.dl
    kind, loss = sb.kind, sb.loss
    pose_kind = sb.pose_kind
    static_data = sb.static_data
    free_p = sb.free_p
    unary = sb.unary
    mesh = sb.mesh

    def _seg(vals, idx, nseg):
        return jax.ops.segment_sum(vals, idx, num_segments=nseg)

    def _eval_binary(poses, lm_local, od, ci, pl, w_pad, want_jac):
        T = poses[ci]
        pts = lm_local[pl]
        data = {**od, **static_data}
        return FACTOR_KERNELS[kind](data, T, pts, compute_jacobians=want_jac)

    def _chi2_local(poses, lm_local, od, ci, pl, w_pad):
        r, _ = _eval_binary(poses, lm_local, od, ci, pl, w_pad, False)
        return jnp.sum(loss.loss(r) * w_pad[:, None])

    def _eval_rep(poses, ukind, uidx, udata, want_jac):
        """Evaluate a replicated (unary or pose-pose) factor batch."""
        if isinstance(uidx, tuple):  # between factor: two pose slots
            return FACTOR_KERNELS[ukind](
                udata, poses[uidx[0]], poses[uidx[1]], compute_jacobians=want_jac
            )
        return FACTOR_KERNELS[ukind](udata, poses[uidx], compute_jacobians=want_jac)

    def _chi2_unary(poses):
        total = jnp.zeros((), poses.dtype)
        for ukind, uidx, udata, uloss, uw in unary:
            r, _ = _eval_rep(poses, ukind, uidx, udata, False)
            total = total + jnp.sum(uloss.loss(r) * uw[:, None])
        return total

    def _unary_contrib(poses, dtype):
        """Replicated-factor normal-equation pieces: Hpp diagonal blocks,
        gradient, and (for pose-pose between factors) the off-diagonal
        coupling list [(PP (E,dp,dp), pi, pj)] applied in the S matvec."""
        Hpp = jnp.zeros((C, dp, dp), dtype)
        g_p = jnp.zeros((C, dp), dtype)
        couplings = []
        for ukind, uidx, udata, uloss, uw in unary:
            r, jacs = _eval_rep(poses, ukind, uidx, udata, True)
            w = uloss.weight(r) * uw[:, None]
            if isinstance(uidx, tuple):
                Ja, Jb = jacs
                pi, pj = uidx
                Hpp = Hpp + _seg(jnp.einsum("fmi,fm,fmj->fij", Ja, w, Ja), pi, C)
                Hpp = Hpp + _seg(jnp.einsum("fmi,fm,fmj->fij", Jb, w, Jb), pj, C)
                g_p = g_p - _seg(jnp.einsum("fmi,fm->fi", Ja, w * r), pi, C)
                g_p = g_p - _seg(jnp.einsum("fmi,fm->fi", Jb, w * r), pj, C)
                couplings.append(
                    (jnp.einsum("fmi,fm,fmj->fij", Ja, w, Jb), pi, pj)
                )
            else:
                (J,) = jacs
                Hpp = Hpp + _seg(jnp.einsum("fmi,fm,fmj->fij", J, w, J), uidx, C)
                g_p = g_p - _seg(jnp.einsum("fmi,fm->fi", J, w * r), uidx, C)
        return Hpp, g_p, couplings

    in_specs = (
        P(),  # poses
        P(axis),  # lm_slab
        jax.tree_util.tree_map(lambda _: P(axis), sb.obs_data),
        P(axis),  # cam_idx
        P(axis),  # pt_local
        P(axis),  # weight
        P(axis),  # free_l
        P(),  # lam
    )
    out_specs = (P(), P(axis), P(), P(), P())

    @partial(shard_map, mesh=mesh, in_specs=in_specs, out_specs=out_specs, check_vma=False)
    def step(poses, lm_slab, od, ci, pl, w_pad, free_l, lam):
        Lb = lm_slab.shape[0]
        dtype = poses.dtype
        fl = free_l.astype(dtype)
        fp = free_p.astype(dtype)

        # ---- local linearization ----
        r, (Jc, Jl) = _eval_binary(poses, lm_slab, od, ci, pl, w_pad, True)
        w = loss.weight(r) * w_pad[:, None]
        chi2 = jax.lax.psum(jnp.sum(loss.loss(r) * w_pad[:, None]), axis) + _chi2_unary(poses)

        Hpp = jax.lax.psum(_seg(jnp.einsum("fmi,fm,fmj->fij", Jc, w, Jc), ci, C), axis)
        g_p = jax.lax.psum(-_seg(jnp.einsum("fmi,fm->fi", Jc, w * r), ci, C), axis)
        Hll = _seg(jnp.einsum("fmi,fm,fmj->fij", Jl, w, Jl), pl, Lb)
        g_l = -_seg(jnp.einsum("fmi,fm->fi", Jl, w * r), pl, Lb)
        W = jnp.einsum("fmi,fm,fmj->fij", Jc, w, Jl)

        H_u, g_u, couplings = _unary_contrib(poses, dtype)
        Hpp = Hpp + H_u
        g_p = g_p + g_u
        # pose-pose coupling masked like Hpp (frozen poses)
        couplings = [
            (PP * fp[pi][:, None, None] * fp[pj][:, None, None], pi, pj)
            for PP, pi, pj in couplings
        ]

        # ---- constant / padding handling (schur.ba_assemble semantics) ----
        eye_p = jnp.eye(dp, dtype=dtype)
        eye_l = jnp.eye(dl, dtype=dtype)
        Hpp = Hpp * fp[:, None, None] + (1.0 - fp)[:, None, None] * eye_p
        g_p = g_p * fp[:, None]
        dead = (jnp.einsum("nii->n", Hll) == 0.0).astype(dtype)
        live = fl * (1.0 - dead)
        Hll = Hll * live[:, None, None] + (1.0 - live)[:, None, None] * eye_l
        g_l = g_l * live[:, None]
        W = W * fp[ci][:, None, None] * live[pl][:, None, None]

        # ---- damp + local landmark elimination ----
        if options.method == "lm":
            Hpp = _damp_blocks(Hpp, lam)
            Hll = _damp_blocks(Hll, lam)
        L_ll = jnp.linalg.cholesky(Hll)
        Hll_inv = _binv(L_ll)

        t = _binv_apply(L_ll, g_l)
        g_red = g_p - jax.lax.psum(_seg(jnp.einsum("mij,mj->mi", W, t[pl]), ci, C), axis)

        # SCHUR_JACOBI preconditioner: exact S diagonal blocks
        Y = jnp.einsum("mij,mjk->mik", W, Hll_inv[pl])
        D = Hpp - jax.lax.psum(_seg(jnp.einsum("mik,mjk->mij", Y, W), ci, C), axis)
        L_d = jnp.linalg.cholesky(D)

        def matvec(x):
            xb = x.reshape(C, dp)
            y = jnp.einsum("cij,cj->ci", Hpp, xb)
            # replicated pose-pose coupling (full-SLAM between factors):
            # identical on every device, applied outside the psum
            for PP, pi, pj in couplings:
                y = y + _seg(jnp.einsum("eij,ej->ei", PP, xb[pj]), pi, C)
                y = y + _seg(jnp.einsum("eij,ei->ej", PP, xb[pi]), pj, C)
            tt = _seg(jnp.einsum("mij,mi->mj", W, xb[ci]), pl, Lb)
            tt = jnp.einsum("lij,lj->li", Hll_inv, tt)
            y = y - jax.lax.psum(_seg(jnp.einsum("mij,mj->mi", W, tt[pl]), ci, C), axis)
            return y.reshape(-1)

        def precond(rr):
            return _binv_apply(L_d, rr.reshape(C, dp)).reshape(-1)

        dx_p, _ = pcg_solve(
            matvec, g_red.reshape(-1), precond=precond, rtol=pcg_rtol,
            max_iters=pcg_max_iters,
        )
        dx_p = dx_p.reshape(C, dp) * fp[:, None]
        tt = g_l - _seg(jnp.einsum("mij,mi->mj", W, dx_p[ci]), pl, Lb)
        dx_l = _binv_apply(L_ll, tt) * live[:, None]

        dx_norm = jnp.sqrt(
            jnp.sum(dx_p**2) + jax.lax.psum(jnp.sum(dx_l**2), axis)
        )

        # ---- retract ----
        new_poses = retract(pose_kind, poses, dx_p)
        new_lm = lm_slab + dx_l

        cost_new = (
            jax.lax.psum(_chi2_local(new_poses, new_lm, od, ci, pl, w_pad), axis)
            + _chi2_unary(new_poses)
        )
        return new_poses, new_lm, chi2, cost_new, dx_norm

    return step


def solve_schur_sharded(
    graph: FactorGraph,
    mesh: Mesh,
    options: _lm.Options = _lm.Options(),
    axis: str = "l",
    pose_name: str = "poses",
    lm_name: str = "landmarks",
    partition: Partition | None = None,
    pcg_rtol: float = 1e-8,
    pcg_max_iters: int = 200,
    checkpoint_path: str | None = None,
    checkpoint_every: int = 5,
    resume: bool = False,
):
    """Full landmark-sharded Schur LM solve.  Returns
    (solved_graph, final_chi2, cost_history).

    Elastic recovery (SURVEY.md §5): with ``checkpoint_path`` set, the
    (poses, landmark slab, lambda) state snapshots every
    ``checkpoint_every`` accepted iterations; ``resume=True`` restarts from
    the snapshot — the solve is a pure function of that state, so recovery
    is exact."""
    sb = shard_ba(graph, mesh, axis, pose_name, lm_name, partition)
    step = jax.jit(make_sharded_schur_step(sb, options, pcg_rtol, pcg_max_iters))

    # np.savez appends '.npz' when absent — normalize ONCE so save and
    # resume always agree on the on-disk name
    if checkpoint_path is not None and not checkpoint_path.endswith(".npz"):
        checkpoint_path = checkpoint_path + ".npz"

    poses, lm_slab = sb.poses, sb.lm_slab
    dtype = np.asarray(poses).dtype
    opts = options
    if resume and checkpoint_path is not None:
        import os

        if os.path.exists(checkpoint_path):
            # Checkpoints are MESH-INDEPENDENT (landmarks stored in original
            # order, not slab order), so a snapshot written on n devices can
            # resume on any mesh — the elastic-recovery path when a host
            # dies and the solve restarts on the surviving n-1 devices
            # (SURVEY.md §5 failure-detection row).
            ck = np.load(checkpoint_path)
            poses = jnp.asarray(ck["poses"])
            slab = np.asarray(sb.lm_slab).copy()
            slab[sb.lm_perm] = ck["landmarks"]
            lm_slab = jnp.asarray(slab)
            opts = dataclasses.replace(options, lambda_init=float(ck["lam"]))

    from ..solver.host_loop import host_lm_loop

    def lm_step(state, lam):
        p, l = state
        new_poses, new_lm, chi2, cost_new, dx_norm = step(
            p, l, sb.obs_data, sb.cam_idx, sb.pt_local, sb.weight,
            sb.free_l, jnp.asarray(lam, dtype),
        )
        return (new_poses, new_lm), chi2, cost_new, dx_norm

    def _on_accept(state, lam, n_accepted):
        if checkpoint_path is not None and n_accepted % checkpoint_every == 0:
            np.savez(
                checkpoint_path.removesuffix(".npz"),
                poses=np.asarray(state[0]),
                landmarks=np.asarray(state[1])[sb.lm_perm],
                lam=lam,
            )

    (poses, lm_slab), history, _info = host_lm_loop(
        lm_step, (poses, lm_slab), opts, on_accept=_on_accept
    )

    # ---- write back into a FactorGraph (unpermute landmarks) ----
    lm_full = np.asarray(lm_slab)[sb.lm_perm]
    pb = graph.blocks[pose_name]
    lb = graph.blocks[lm_name]
    new_blocks = dict(graph.blocks)
    new_blocks[pose_name] = VariableBlock(pb.kind, jnp.asarray(np.asarray(poses)), pb.const_mask)
    new_blocks[lm_name] = VariableBlock(lb.kind, jnp.asarray(lm_full), lb.const_mask)
    solved = FactorGraph(new_blocks, graph.batches)
    return solved, float(solved.chi2()), history


def _marginal_in_specs(sb: ShardedBA, axis: str):
    return (
        P(),  # poses
        P(axis),  # lm_slab
        jax.tree_util.tree_map(lambda _: P(axis), sb.obs_data),
        P(axis),  # cam_idx
        P(axis),  # pt_local
        P(axis),  # weight
        P(axis),  # free_l
        P(),  # query ids (replicated)
    )


def _make_S_pieces_builder(sb: ShardedBA, axis: str):
    """Returns build(local arrays) -> (matvec, precond, aux) — the GN
    (undamped) reduced-system pieces inside a shard_map body, shared by the
    distributed pose- and landmark-marginal entry points.  Identical
    assembly/masking semantics to make_sharded_schur_step."""
    C, dp, dl = sb.C, sb.dp, sb.dl
    kind, loss = sb.kind, sb.loss
    static_data = sb.static_data
    free_p = sb.free_p
    unary = sb.unary

    def _seg(vals, idx, nseg):
        return jax.ops.segment_sum(vals, idx, num_segments=nseg)

    def build(poses, lm_slab, od, ci, pl, w_pad, free_l):
        Lb = lm_slab.shape[0]
        dtype = poses.dtype
        fl = free_l.astype(dtype)
        fp = free_p.astype(dtype)
        data = {**od, **static_data}
        r, (Jc, Jl) = FACTOR_KERNELS[kind](
            data, poses[ci], lm_slab[pl], compute_jacobians=True
        )
        w = loss.weight(r) * w_pad[:, None]
        Hpp = jax.lax.psum(_seg(jnp.einsum("fmi,fm,fmj->fij", Jc, w, Jc), ci, C), axis)
        Hll = _seg(jnp.einsum("fmi,fm,fmj->fij", Jl, w, Jl), pl, Lb)
        W = jnp.einsum("fmi,fm,fmj->fij", Jc, w, Jl)
        # replicated unary / between contributions (GN: no damping)
        couplings = []
        for ukind, uidx, udata, uloss, uw in unary:
            if isinstance(uidx, tuple):
                ru, (Ja, Jb) = FACTOR_KERNELS[ukind](
                    udata, poses[uidx[0]], poses[uidx[1]], compute_jacobians=True
                )
                wu = uloss.weight(ru) * uw[:, None]
                pi, pj = uidx
                Hpp = Hpp + _seg(jnp.einsum("fmi,fm,fmj->fij", Ja, wu, Ja), pi, C)
                Hpp = Hpp + _seg(jnp.einsum("fmi,fm,fmj->fij", Jb, wu, Jb), pj, C)
                PP = jnp.einsum("fmi,fm,fmj->fij", Ja, wu, Jb)
                couplings.append(
                    (PP * fp[pi][:, None, None] * fp[pj][:, None, None], pi, pj)
                )
            else:
                ru, (J,) = FACTOR_KERNELS[ukind](
                    udata, poses[uidx], compute_jacobians=True
                )
                wu = uloss.weight(ru) * uw[:, None]
                Hpp = Hpp + _seg(jnp.einsum("fmi,fm,fmj->fij", J, wu, J), uidx, C)
        eye_p = jnp.eye(dp, dtype=dtype)
        eye_l = jnp.eye(dl, dtype=dtype)
        Hpp = Hpp * fp[:, None, None] + (1.0 - fp)[:, None, None] * eye_p
        dead = (jnp.einsum("nii->n", Hll) == 0.0).astype(dtype)
        live = fl * (1.0 - dead)
        Hll = Hll * live[:, None, None] + (1.0 - live)[:, None, None] * eye_l
        W = W * fp[ci][:, None, None] * live[pl][:, None, None]

        L_ll = jnp.linalg.cholesky(Hll)
        Hll_inv = _binv(L_ll)
        Y = jnp.einsum("mij,mjk->mik", W, Hll_inv[pl])
        D = Hpp - jax.lax.psum(_seg(jnp.einsum("mik,mjk->mij", Y, W), ci, C), axis)
        L_d = jnp.linalg.cholesky(D)

        def matvec(x):
            xb = x.reshape(C, dp)
            y = jnp.einsum("cij,cj->ci", Hpp, xb)
            for PP, pi, pj in couplings:
                y = y + _seg(jnp.einsum("eij,ej->ei", PP, xb[pj]), pi, C)
                y = y + _seg(jnp.einsum("eij,ei->ej", PP, xb[pi]), pj, C)
            tt = _seg(jnp.einsum("mij,mi->mj", W, xb[ci]), pl, Lb)
            tt = jnp.einsum("lij,lj->li", Hll_inv, tt)
            y = y - jax.lax.psum(_seg(jnp.einsum("mij,mj->mi", W, tt[pl]), ci, C), axis)
            return y.reshape(-1)

        def precond(rr):
            return _binv_apply(L_d, rr.reshape(C, dp)).reshape(-1)

        aux = dict(Hll_inv=Hll_inv, W=W, ci=ci, pl=pl, Lb=Lb)
        return matvec, precond, aux

    return build


def sharded_pose_marginals(
    graph: FactorGraph,
    mesh: Mesh,
    indices=None,
    axis: str = "l",
    pose_name: str = "poses",
    lm_name: str = "landmarks",
    partition: Partition | None = None,
    pcg_rtol: float = 1e-10,
    pcg_max_iters: int = 500,
    chunk: int = 64,
):
    """(k, dp, dp) pose marginal covariances of a SHARDED camera+landmark
    graph — distributed covariance over the same landmark-sharded layout
    the solve uses.  Sigma_pp = S^-1, so each requested tangent column is
    one SCHUR_JACOBI-preconditioned PCG solve whose matvec does chip-local
    work plus ONE psum per application (identical comm pattern to the
    solver's inner loop).  Landmark elimination stays chip-local; no chip
    ever materializes the landmark side of H.

    Constant (gauge-anchor) poses return unit blocks, matching the
    single-chip ``pose_marginal_covariances`` masking convention."""
    sb = shard_ba(graph, mesh, axis, pose_name, lm_name, partition)
    C, dp = sb.C, sb.dp
    _builder = _make_S_pieces_builder(sb, axis)

    in_specs = _marginal_in_specs(sb, axis)

    @partial(shard_map, mesh=sb.mesh, in_specs=in_specs, out_specs=P(), check_vma=False)
    def solve_cols(poses, lm_slab, od, ci, pl, w_pad, free_l, col_ids):
        matvec, precond, _aux = _builder(poses, lm_slab, od, ci, pl, w_pad, free_l)
        dtype = poses.dtype

        def solve_col(col):
            e = jnp.zeros(C * dp, dtype).at[col].set(1.0)
            x, _ = pcg_solve(
                matvec, e, precond=precond, rtol=pcg_rtol, max_iters=pcg_max_iters
            )
            return x

        return jax.vmap(solve_col)(col_ids)  # (k, C*dp), replicated

    if indices is None:
        indices = np.arange(C)
    indices = np.asarray(indices)
    col_ids = (indices[:, None] * dp + np.arange(dp)[None, :]).reshape(-1)
    cols_per_chunk = max(dp, chunk - chunk % dp)
    pieces = []
    for s in range(0, len(col_ids), cols_per_chunk):
        pieces.append(
            solve_cols(
                sb.poses, sb.lm_slab, sb.obs_data, sb.cam_idx, sb.pt_local,
                sb.weight, sb.free_l,
                jnp.asarray(col_ids[s : s + cols_per_chunk], jnp.int32),
            )
        )
    X = jnp.concatenate(pieces, axis=0).reshape(len(indices), dp, C, dp)
    rows = jnp.asarray(indices, jnp.int32)
    out = X[jnp.arange(len(indices)), :, rows, :]
    return 0.5 * (out + jnp.swapaxes(out, -1, -2))


def sharded_landmark_marginals(
    graph: FactorGraph,
    mesh: Mesh,
    indices,
    axis: str = "l",
    pose_name: str = "poses",
    lm_name: str = "landmarks",
    partition: Partition | None = None,
    pcg_rtol: float = 1e-10,
    pcg_max_iters: int = 500,
):
    """(k, dl, dl) landmark marginal covariances of a SHARDED graph, by the
    block-inverse identity Sigma_ll,ii = (Hll^-1)_ii + B_i^T S^-1 B_i with
    B_i = [W Hll^-1] block-column i.  B_i and (Hll^-1)_ii live entirely on
    the landmark's owner chip (observations are co-located); one psum
    replicates them, then the dl S-solves run with the solver's own
    one-psum-per-matvec pattern.  Unobserved landmarks return the masked
    unit block, matching the single-chip convention."""
    sb = shard_ba(graph, mesh, axis, pose_name, lm_name, partition)
    C, dp, dl = sb.C, sb.dp, sb.dl
    _builder = _make_S_pieces_builder(sb, axis)
    slots = np.asarray(sb.lm_perm)[np.asarray(indices)]  # global slab slots

    in_specs = _marginal_in_specs(sb, axis)

    @partial(shard_map, mesh=sb.mesh, in_specs=in_specs, out_specs=P(), check_vma=False)
    def solve_lms(poses, lm_slab, od, ci, pl, w_pad, free_l, slots_q):
        matvec, precond, aux = _builder(poses, lm_slab, od, ci, pl, w_pad, free_l)
        Hll_inv, W, Lb = aux["Hll_inv"], aux["W"], aux["Lb"]
        dtype = poses.dtype
        rank = jax.lax.axis_index(axis)

        def one(g):
            local = g - rank * Lb
            mine = jnp.logical_and(local >= 0, local < Lb)
            lc = jnp.clip(local, 0, Lb - 1)
            m = mine.astype(dtype)
            Hi = jax.lax.psum(Hll_inv[lc] * m, axis)  # (dl, dl)
            sel = ((pl == lc) & mine).astype(dtype)
            Bm = jnp.einsum("mij,jk->mik", W * sel[:, None, None], Hll_inv[lc])
            B = jax.lax.psum(
                jax.ops.segment_sum(Bm, ci, num_segments=C), axis
            ).reshape(C * dp, dl)

            def solve_rhs(b):
                x, _ = pcg_solve(
                    matvec, b, precond=precond, rtol=pcg_rtol,
                    max_iters=pcg_max_iters,
                )
                return x

            X = jax.vmap(solve_rhs, in_axes=1, out_axes=1)(B)  # (C*dp, dl)
            cov = Hi + B.T @ X
            return 0.5 * (cov + cov.T)

        return jax.vmap(one)(slots_q)

    return solve_lms(
        sb.poses, sb.lm_slab, sb.obs_data, sb.cam_idx, sb.pt_local,
        sb.weight, sb.free_l, jnp.asarray(slots, jnp.int32),
    )


__all__ = ["ShardedBA", "shard_ba", "make_sharded_schur_step", "solve_schur_sharded",
           "sharded_pose_marginals", "sharded_landmark_marginals"]
