"""The comm-payload model (bench/scaling.py comm_model) vs compiled HLO
(VERDICT r2 weak #8): lower every sharded step on the 8-device mesh and
assert the StableHLO collective payloads equal the model EXACTLY — the
model is the hardware-independent artifact docs/DISTRIBUTED.md presents;
it must not silently drift from the implementations it describes."""

import re
import sys
import pathlib

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1] / "bench"))
from scaling import comm_model  # noqa: E402

from pyslam_tpu.dist import make_mesh
from pyslam_tpu.graph import build
from pyslam_tpu.io import synth
from pyslam_tpu.solver import Options

COLLECTIVES = ("all_reduce", "all_gather", "reduce_scatter", "collective_permute")


def collective_payload(lowered_text):
    """Total collective payload (elements) in a StableHLO module.  CG-loop
    collectives appear once in the static text, so the total equals
    psum_per_lm_it + per_cg_it of the model."""
    total = 0
    count = 0
    lines = lowered_text.splitlines()
    for i, line in enumerate(lines):
        m = re.search(r'stablehlo\.(%s)"' % "|".join(COLLECTIVES), line)
        if not m:
            continue
        for j in range(i, min(i + 14, len(lines))):
            mt = re.search(r"->\s*tensor<([^>]*)>", lines[j])
            if mt:
                n = 1
                for p in mt.group(1).split("x")[:-1]:
                    if p.isdigit():
                        n *= int(p)
                total += n
                count += 1
                break
    return total, count


def model_total(path, stats):
    m = comm_model(path, 8, stats)
    return m["psum_per_lm_it"] + m["per_cg_it"]


class TestCommModelMatchesHLO:
    def test_factor_parallel(self):
        from pyslam_tpu.dist.factor_parallel import make_sharded_lm_step

        mesh = make_mesh(8)
        g0 = build.pose_graph(
            synth.se3_sphere(n_poses=24, n_loops=10, seed=0), dtype=jnp.float64
        )
        step, g = make_sharded_lm_step(g0, mesh, Options(method="lm"))
        txt = (
            jax.jit(step)
            .lower(dict(g.blocks), tuple(g.batches), jnp.asarray(1e-4, jnp.float64))
            .as_text()
        )
        total, _ = collective_payload(txt)
        assert total == model_total("factor_parallel", dict(D=g.total_dof))

    def test_schur_reduce(self):
        from pyslam_tpu.dist.schur_reduce import make_sharded_schur_step, shard_ba

        for nc in (8, 12):  # two sizes pin the C-coefficient, not just the sum
            g = build.ba_graph(
                synth.ba_synthetic(n_cams=nc, n_pts=64, seed=3), dtype=jnp.float64
            )
            sb = shard_ba(g, make_mesh(8, axis_name="l"))
            step = make_sharded_schur_step(sb, Options(method="lm"), 1e-8, 50)
            txt = (
                jax.jit(step)
                .lower(
                    sb.poses, sb.lm_slab, sb.obs_data, sb.cam_idx, sb.pt_local,
                    sb.weight, sb.free_l, jnp.asarray(1e-4, jnp.float64),
                )
                .as_text()
            )
            total, _ = collective_payload(txt)
            assert total == model_total("schur_reduce", dict(C=nc)), f"C={nc}"

    def test_schur_cm(self):
        from pyslam_tpu.dist.schur_cm import make_cm_step, shard_ba_cm

        for nc in (8, 12):
            g = build.ba_graph(
                synth.ba_synthetic(n_cams=nc, n_pts=64, seed=3), dtype=jnp.float64
            )
            sb = shard_ba_cm(g, make_mesh(8, axis_name="l"), 2)
            step = make_cm_step(sb, Options(method="lm"), 1e-8, 50)
            txt = (
                jax.jit(step)
                .lower(
                    sb.poses, sb.lm_slab, sb.obs_data, sb.ci, sb.li, sb.w_pad,
                    sb.free_l, sb.cam_bounds, jnp.asarray(1e-4, jnp.float64),
                )
                .as_text()
            )
            total, _ = collective_payload(txt)
            assert total == model_total("schur_cm", dict(C=nc)), f"C={nc}"

    def test_pose_sharded(self):
        from pyslam_tpu.dist.pose_sharded import (
            make_pose_sharded_step,
            shard_pose_graph,
        )

        for n_poses in (24, 40):
            g = build.pose_graph(
                synth.se3_sphere(n_poses=n_poses, n_loops=10, seed=0),
                dtype=jnp.float64,
            )
            sp = shard_pose_graph(g, make_mesh(8, axis_name="p"))
            step = make_pose_sharded_step(sp, Options(method="lm"), 1e-8, 50)
            txt = (
                jax.jit(step)
                .lower(
                    sp.pose_slab, sp.free_slab, sp.cols, sp.batch_arrays,
                    jnp.asarray(1e-4, jnp.float64),
                )
                .as_text()
            )
            total, _ = collective_payload(txt)
            stats = dict(Nslab=8 * sp.Pb, d=sp.d, elem=16)
            assert total == model_total("pose_sharded", stats), f"n={n_poses}"
