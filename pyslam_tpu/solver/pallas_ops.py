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
