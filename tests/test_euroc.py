"""EuRoC ASL-format I/O (io/euroc.py): format round trips and the
file -> preintegration -> VIO path on a synthetic sequence."""

import jax.numpy as jnp
import numpy as np

from pyslam_tpu import imu as M
from pyslam_tpu.io import euroc, synth


def _flat_stream(d):
    """ImuData per-interval samples -> one continuous (t, omega, accel)."""
    n_int, K = d.dts.shape
    dt = d.dts[0, 0]
    t = np.arange(n_int * K) * dt
    return t, d.omega.reshape(-1, 3), d.accel.reshape(-1, 3)


class TestRoundTrip:
    def test_imu_csv(self, tmp_path):
        d = synth.imu_circle(n_keyframes=3, kf_dt=0.25, imu_rate=100, seed=1)
        t, w, a = _flat_stream(d)
        path = str(tmp_path / "imu.csv")
        euroc.write_imu(path, t, w, a)
        t2, w2, a2 = euroc.read_imu(path)
        np.testing.assert_allclose(t2, t, atol=2e-9)  # ns quantization
        np.testing.assert_allclose(w2, w, rtol=1e-6)
        np.testing.assert_allclose(a2, a, rtol=1e-6)

    def test_groundtruth_csv(self, tmp_path):
        d = synth.imu_circle(n_keyframes=5, kf_dt=0.5, imu_rate=50, seed=2)
        t_kf = np.arange(5) * 0.5
        path = str(tmp_path / "gt.csv")
        bg = np.array([1e-3, -2e-3, 5e-4])
        euroc.write_groundtruth(path, t_kf, d.T_gt, d.v_gt, b_gyro=bg)
        t2, T2, v2, bg2, ba2 = euroc.read_groundtruth(path)
        np.testing.assert_allclose(t2, t_kf, atol=2e-9)
        np.testing.assert_allclose(T2, d.T_gt, atol=1e-6)
        np.testing.assert_allclose(v2, d.v_gt, atol=1e-6)
        np.testing.assert_allclose(bg2, np.broadcast_to(bg, (5, 3)), atol=1e-9)


class TestFileToVio:
    def test_preintegration_from_files_matches_direct(self, tmp_path):
        # write the synthetic sequence in EuRoC layout, read it back,
        # re-segment by keyframe times, preintegrate: identical to
        # preintegrating the generator's own segments
        d = synth.imu_circle(n_keyframes=4, kf_dt=0.5, imu_rate=200, seed=3)
        t, w, a = _flat_stream(d)
        path = str(tmp_path / "imu.csv")
        euroc.write_imu(path, t, w, a)
        t2, w2, a2 = euroc.read_imu(path)
        t_kf = np.arange(4) * 0.5
        segs = euroc.segment_imu(t2, w2, a2, t_kf)
        z = np.zeros(3)
        for i, (wi, ai, dti) in enumerate(segs):
            pim_file = M.preintegrate(wi, ai, dti, z, z)
            pim_direct = M.preintegrate(d.omega[i], d.accel[i], d.dts[i], z, z)
            np.testing.assert_allclose(
                np.asarray(pim_file.dR), np.asarray(pim_direct.dR), atol=1e-9
            )
            np.testing.assert_allclose(
                np.asarray(pim_file.dv), np.asarray(pim_direct.dv), atol=1e-7
            )
            np.testing.assert_allclose(
                np.asarray(pim_file.dp), np.asarray(pim_direct.dp), atol=1e-7
            )

    def test_segment_requires_coverage(self):
        with np.testing.assert_raises(ValueError):
            euroc.segment_imu(
                np.array([0.0, 0.1]), np.zeros((2, 3)), np.zeros((2, 3)),
                np.array([0.0, 0.05, 0.07, 0.2]),
            )


class TestMisalignedBoundaries:
    def test_segments_cover_exact_intervals(self):
        # real camera timestamps do NOT coincide with IMU sample times:
        # each segment's dts must still sum exactly to the keyframe gap
        # (zero-order hold over the leading gap), or gravity integration
        # loses up to one IMU period per interval
        rng = np.random.default_rng(0)
        t = np.arange(400) * 0.005  # 200 Hz
        w = rng.normal(0, 0.1, (400, 3))
        a = rng.normal(0, 1.0, (400, 3)) + np.array([0, 0, 9.81])
        t_kf = np.array([0.0, 0.5012, 1.0031, 1.4987])  # off-grid boundaries
        segs = euroc.segment_imu(t, w, a, t_kf)
        for i, (wi, ai, dti) in enumerate(segs):
            np.testing.assert_allclose(
                dti.sum(), t_kf[i + 1] - t_kf[i], atol=1e-12
            )
            assert (dti >= 0).all()
        # total integrated time over all segments == total span
        np.testing.assert_allclose(
            sum(s[2].sum() for s in segs), t_kf[-1] - t_kf[0], atol=1e-12
        )

    def test_int64_timestamps_survive(self, tmp_path):
        # real EuRoC epochs (~1.4e18 ns) exceed float64's integer range;
        # relative seconds must come back exact
        t0 = 1403636579758555392
        t_ns = t0 + (np.arange(100) * 5_000_000)  # 5 ms
        path = str(tmp_path / "imu.csv")
        with open(path, "w") as f:
            f.write("#ts\n")
            for k in range(100):
                f.write(f"{t_ns[k]},0,0,0,0,0,9.81\n")
        t, w, a = euroc.read_imu(path)
        np.testing.assert_allclose(np.diff(t), 0.005, atol=1e-15)
        assert euroc.first_timestamp_ns(path) == t0
