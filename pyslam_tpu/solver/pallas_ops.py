"""Pallas TPU kernels for the block-sparse hot ops (BASELINE.json north star:
"sparse normal equations J^T J assembled as block-sparse Pallas kernels").

What is here and what is deliberately not — with chip measurements:

* ``ell_matvec_lane_major`` — the symmetric-ELL SpMV contraction
  y[i, r] = sum_{k, j} He[k, i, j, r] * xg[k, j, r] in LANE-MAJOR layout:
  the block-row index r rides the 128-lane axis, so all 36*K
  multiply-accumulates run at full VPU width with zero gathers inside the
  kernel.  Measured on TPU v5 lite at sphere2500 scale (nb=2560, K=9, d=6):
  312 us standalone vs 412 us for the row-major XLA einsum (1.3x), and
  parity (72.7 vs 71.1 us) inside a fused CG loop where the x-gather and
  layout transpose dominate — which is why solve_ell's default stays on the
  XLA einsum and this kernel is opt-in.

* No in-kernel sparse gather/scatter: this environment's TPU toolchain
  (axon remote-compile) rejects every Mosaic dynamic-gather form
  (``x[idx]``, ``jnp.take``, ``take_along_axis`` on either axis — all fail
  to compile), so a fully-fused in-VMEM PCG is not expressible here.  The
  gather stays in XLA (where it is hardware-lowered) and kernels receive
  pre-gathered operands.

Kernels run in interpret mode on the CPU backend, which is how the test
suite exercises them (SURVEY.md §5 race-detection row).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _is_tpu() -> bool:
    return jax.default_backend() == "tpu"


def _ell_kernel_body(K: int):
    def kern(He_ref, xg_ref, o_ref):
        acc = jnp.zeros(o_ref.shape, o_ref.dtype)
        for k in range(K):  # static unroll: K is a layout constant
            # (d, d, NB) * (1, d, NB) summed over j -> (d, NB), full VPU width
            acc = acc + jnp.sum(He_ref[k] * xg_ref[k][None, :, :], axis=1)
        o_ref[:] = acc

    return kern


@partial(jax.jit, static_argnames=("interpret",))
def ell_matvec_lane_major(He_t, xg_t, interpret: bool | None = None):
    """y (d, nb) = sum_k He_t[k] @_j xg_t[k]  with He_t (K, d, d, nb) and
    xg_t (K, d, nb) — block-row index on the lane axis."""
    K, d, _, nb = He_t.shape
    if interpret is None:
        interpret = not _is_tpu()
    return pl.pallas_call(
        _ell_kernel_body(K),
        out_shape=jax.ShapeDtypeStruct((d, nb), He_t.dtype),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        interpret=interpret,
    )(He_t, xg_t)


def ell_matvec_pallas(He, cols, x, interpret: bool | None = None):
    """Drop-in ELL matvec: He (nb, K, d, d) row-major blocks, cols (nb, K),
    x (nb*d,).  The gather and layout transposes run in XLA; the contraction
    runs in the Pallas kernel."""
    nb, K, d, _ = He.shape
    He_t = jnp.transpose(He, (1, 2, 3, 0))
    xg_t = jnp.transpose(x.reshape(nb, d)[cols], (1, 2, 0))
    y = ell_matvec_lane_major(He_t, xg_t, interpret=interpret)
    return y.T.reshape(-1)


__all__ = ["ell_matvec_lane_major", "ell_matvec_pallas"]


# --------------------------------------------------------------------------
# Scatter-as-matmul assembly (round-2 experiment, VERDICT item 7).
#
# Mosaic rejects dynamic gathers AND vector scatters, so a literal fused
# linearize+scatter kernel is not expressible on this toolchain.  What IS
# expressible: sort the per-factor block contributions by destination ELL
# slot at plan-build time (static permutation), then for each tile of T
# output slots load its contiguous contribution window with ONE dynamic
# sublane slice (supported), build a (T, W) one-hot matrix by iota/compare
# (vectorizable), and reduce with jnp.dot on the MXU — the scatter becomes
# a dense matmul with no gather/scatter inside the kernel.
#
# Correctness needs no masking: the window starts at the tile's first
# contribution (exact static bound) and later tiles' contributions fail the
# one-hot comparison automatically.
# --------------------------------------------------------------------------


def _scatter_mm_kernel(T: int, W: int):
    def kern(bblk_ref, sid_lo, sid_hi, con_lo, con_hi, o_ref):
        # NOTE: no jnp.concatenate here — in-kernel sublane concat is
        # rejected by this toolchain's remote Mosaic compiler (isolated
        # round 2; everything else in this kernel compiles) — so the two
        # aligned W-blocks are reduced by two dots and an add.
        t = pl.program_id(0)
        rows = jax.lax.broadcasted_iota(jnp.int32, (T, W), 0) + t * T
        dtype = o_ref.dtype
        oh_lo = (rows == sid_lo[:, 0][None, :]).astype(dtype)  # (T, W)
        oh_hi = (rows == sid_hi[:, 0][None, :]).astype(dtype)
        o_ref[:, :] = jnp.dot(
            oh_lo, con_lo[:, :], preferred_element_type=dtype
        ) + jnp.dot(oh_hi, con_hi[:, :], preferred_element_type=dtype)

    return kern


@partial(jax.jit, static_argnames=("S_pad", "T", "W", "interpret"))
def scatter_matmul(
    bounds_blk, slot_id, contrib, S_pad: int, T: int, W: int,
    interpret: bool | None = None,
):
    """(S_pad, C) dense accumulation of slot-sorted contributions.

    The per-tile contribution window is selected by BLOCK via the scalar-
    prefetched ``bounds_blk`` (grid,) i32 = first-contribution-row // W:
    each array is passed twice with (W, C) blocks at block indices
    ``bblk[t]`` and ``bblk[t] + 1``, so the kernel sees the two aligned
    W-blocks covering the true window (any run of <= W rows spans at most
    two) — no dynamic loads inside the kernel; rows belonging to other
    tiles fail the one-hot comparison.  slot_id (E_pad, 1) i32 sorted
    ascending, padding rows -1; contrib (E_pad, C) with E_pad a multiple of
    W plus >= 2W slack of zero/-1 rows; T = output slots per tile
    (S_pad % T == 0)."""
    if interpret is None:
        interpret = not _is_tpu()
    grid = S_pad // T
    C = contrib.shape[1]
    return pl.pallas_call(
        _scatter_mm_kernel(T, W),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(grid,),
            in_specs=[
                pl.BlockSpec((W, 1), lambda t, bblk: (bblk[t], 0)),
                pl.BlockSpec((W, 1), lambda t, bblk: (bblk[t] + 1, 0)),
                pl.BlockSpec((W, C), lambda t, bblk: (bblk[t], 0)),
                pl.BlockSpec((W, C), lambda t, bblk: (bblk[t] + 1, 0)),
            ],
            out_specs=pl.BlockSpec((T, C), lambda t, bblk: (t, 0)),
        ),
        out_shape=jax.ShapeDtypeStruct((S_pad, C), contrib.dtype),
        interpret=interpret,
    )(bounds_blk, slot_id, slot_id, contrib, contrib)


__all__ += ["scatter_matmul"]
