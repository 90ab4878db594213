"""Dense photometric residual (reference ``PhotometricResidualSE3``,
pyslam/residuals.py per SURVEY.md §2.1/§3.2 — "the reference's only genuinely
batched residual and the template for how ALL residuals become batched").

One factor = one keyframe->frame photometric constraint over P pixels:

    r_p = stiffness * ( I_track( proj(T * pt_ref_p) ) - I_ref(p) )

with the analytic Jacobian chained through bilinear image gradients, the
camera projection Jacobian, and the SE(3) odot operator.  Pixels are never
compacted: invalid / out-of-bounds pixels are masked to zero residual and
Jacobian, keeping shapes static across frames (SURVEY.md §7 "static shapes")
so one jit covers a whole tracking run.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ..graph.core import register_factor
from ..lie import se3
from ..residuals import _ResidualBase
from ..utils import bilinear_interpolate, bilinear_interpolate_packed


def _warp_and_sample(data, T, need_jac):
    """Shared warp + bilinear-sampling stage of the photometric kernels:
    returns (I_w, gu, gv, valid, cam_jac, p_safe).  Only cam_jac is None
    when Jacobians are skipped; gu/gv are always sampled (the residual-only
    path relies on XLA dead-code elimination to drop them under jit)."""
    cam = data["camera"]
    pt_ref, mask = data["pt_ref"], data["mask"]
    im = data["im_track"]
    H, W = im.shape[-2], im.shape[-1]
    p_track = se3.act(T[:, None], pt_ref)  # (F, P, 3)
    z = p_track[..., 2]
    eps = jnp.asarray(1e-6, z.dtype)
    z_safe = jnp.where(z > eps, z, 1.0)
    p_safe = p_track.at[..., 2].set(z_safe)

    if need_jac:
        obs, cam_jac = cam.project(p_safe, compute_jacobians=True)
    else:
        obs = cam.project(p_safe)
        cam_jac = None
    u, v = obs[..., 0], obs[..., 1]
    in_bounds = (u >= 0.0) & (u <= W - 1.0) & (v >= 0.0) & (v <= H - 1.0)
    valid = mask.astype(u.dtype) * in_bounds.astype(u.dtype) * (z > eps).astype(u.dtype)

    if "im_track4" in data:
        # corner-packed fast path: ONE gather row per pixel instead of four
        # (utils.pack_corners rationale); arithmetic — and results — are
        # identical to the 4-gather path
        sample = jax.vmap(
            lambda im4_f, u_f, v_f: bilinear_interpolate_packed(
                im4_f, H, W, u_f, v_f, True
            )
        )
        I_w, gu, gv = sample(data["im_track4"], u, v)
    else:
        sample = jax.vmap(
            lambda im_f, u_f, v_f: bilinear_interpolate(im_f, u_f, v_f, True)
        )
        I_w, gu, gv = sample(im, u, v)
    return I_w, gu, gv, valid, cam_jac, p_safe


@register_factor("photometric_se3")
def photometric_se3(data, T, compute_jacobians=True):
    """Batched dense photometric kernel.

    data (leading F = #factors, P = pixels per factor):
      pt_ref   (F, P, 3)  keyframe-frame 3D points (from depth/disparity)
      I_ref    (F, P)     reference intensities
      mask     (F, P)     static validity (depth valid, texture threshold)
      im_track (F, H, W)  tracking image
      stiffness (F,)      intensity inverse-noise scale
      camera              sensors.* pytree (shared)
    T: (F, 4, 4) — T_track_ref (maps keyframe coords into tracking frame).
    Returns r (F, P) and J (F, P, 6).
    """
    I_ref = data["I_ref"]
    I_w, gu, gv, valid, cam_jac, p_safe = _warp_and_sample(
        data, T, compute_jacobians
    )
    s = data["stiffness"][:, None] * valid
    r = s * (I_w - I_ref)
    if not compute_jacobians:
        return r, None
    # dI/d p_cam = [gu, gv] . dproj_{u,v}/dp  -> (F, P, 3)
    J_pix = gu[..., None] * cam_jac[..., 0, :] + gv[..., None] * cam_jac[..., 1, :]
    J = jnp.einsum("fpk,fpkd->fpd", J_pix, se3.odot(p_safe))
    return r, (s[..., None] * J,)


@register_factor("photometric_affine_se3")
def photometric_affine_se3(data, T, compute_jacobians=True):
    """Photometric kernel with per-factor affine illumination (gain a,
    bias b) eliminated by VARIABLE PROJECTION (PAPERS.md arXiv 2512.07969;
    the DSO-style brightness transfer):

        r_p = s * ( a* I_w(p) + b* - I_ref(p) ),
        (a*, b*) = argmin_{a,b} sum_p valid_p (a I_w + b - I_ref)^2

    The conditional optimum is a closed-form 2x2 solve per factor — the
    illumination parameters never enter the outer solver's state, so the
    graph and every compiled executable are identical to the plain kernel's.
    Jacobians use the Kaufman approximation (a*, b* held fixed via
    stop_gradient), the standard VarPro trick — autodiff of this kernel
    therefore matches the analytic blocks exactly.  Camera exposure or
    lighting changes that break brightness constancy (where the plain
    kernel's optimum is biased) are absorbed here.
    """
    I_ref = data["I_ref"]
    I_w, gu, gv, valid, cam_jac, p_safe = _warp_and_sample(
        data, T, compute_jacobians
    )
    w = valid
    Sw = jnp.sum(w, axis=-1)
    S1 = jnp.sum(w * I_w, axis=-1)
    S2 = jnp.sum(w * I_w * I_w, axis=-1)
    Sr = jnp.sum(w * I_ref, axis=-1)
    Sx = jnp.sum(w * I_w * I_ref, axis=-1)
    det = S2 * Sw - S1 * S1
    ok = det > 1e-12 * jnp.maximum(S2 * Sw, 1.0)
    det_safe = jnp.where(ok, det, 1.0)
    a = jnp.where(ok, (Sx * Sw - S1 * Sr) / det_safe, 1.0)
    b = jnp.where(ok, (S2 * Sr - S1 * Sx) / det_safe, 0.0)
    a = jax.lax.stop_gradient(a)[:, None]
    b = jax.lax.stop_gradient(b)[:, None]

    s = data["stiffness"][:, None] * valid
    r = s * (a * I_w + b - I_ref)
    if not compute_jacobians:
        return r, None
    J_pix = gu[..., None] * cam_jac[..., 0, :] + gv[..., None] * cam_jac[..., 1, :]
    J = jnp.einsum("fpk,fpkd->fpd", J_pix, se3.odot(p_safe))
    return r, ((s * a)[..., None] * J,)


class PhotometricResidualSE3(_ResidualBase):
    """Dense direct residual over one keyframe->frame pair (reference
    PhotometricResidualSE3).  Parameter: [T_track_ref (SE3)].

    ``depth_or_disp`` follows the camera's triangulate convention: disparity
    for StereoCamera, depth for RGBDCamera.  ``min_grad`` masks out weakly
    textured pixels (the reference's pixel-subsampling knob) without changing
    array shapes.
    """

    factor_kind = "photometric_se3"
    param_kinds = ("se3",)

    def __init__(self, camera, im_ref, depth_or_disp, im_track, stiffness, min_grad=0.0):
        self.camera = camera
        im_ref = jnp.asarray(im_ref)
        dd = jnp.asarray(depth_or_disp)
        self.im_track = jnp.asarray(im_track)
        Hh, Ww = im_ref.shape
        vv, uu = jnp.meshgrid(
            jnp.arange(Hh, dtype=im_ref.dtype), jnp.arange(Ww, dtype=im_ref.dtype),
            indexing="ij",
        )
        obs = jnp.stack([uu, vv, dd], axis=-1).reshape(-1, 3)
        valid = camera.is_valid_measurement(obs) & jnp.isfinite(obs[:, 2])
        if min_grad > 0.0:
            gy, gx = jnp.gradient(im_ref)
            gmag = jnp.sqrt(gx * gx + gy * gy).reshape(-1)
            valid = valid & (gmag >= min_grad)
        obs_safe = jnp.where(valid[:, None], obs, jnp.asarray([0.0, 0.0, 1.0], obs.dtype))
        self.pt_ref = camera.triangulate(obs_safe)
        self.I_ref = im_ref.reshape(-1)
        self.mask = valid
        self.stiffness = float(stiffness)

    def batch_data(self):
        return {
            "camera": self.camera,
            "pt_ref": self.pt_ref,
            "I_ref": self.I_ref,
            "mask": self.mask,
            "im_track": self.im_track,
            "stiffness": self.stiffness,
        }


__all__ = ["PhotometricResidualSE3", "photometric_se3"]
