"""Native (C++) IO fast-path: kernel correctness + native==Python parser
equality on every g2o family and on BAL files.

The native library compiles on first use (pyslam_tpu/native/__init__.py);
if the toolchain were missing these tests would be skipped and the readers
would use their pure-Python fallbacks — also exercised here by forcing
``native._lib = None``.
"""

import numpy as np
import pytest

from pyslam_tpu import native
from pyslam_tpu.io import bal, g2o, synth

needs_native = pytest.mark.skipif(
    not native.available(), reason="native fastio did not build"
)


@pytest.fixture
def no_native(monkeypatch):
    """Force the pure-Python fallback paths."""
    monkeypatch.setattr(native, "_lib", None)
    monkeypatch.setattr(native, "_tried", True)


@needs_native
class TestKernels:
    def test_parse_doubles_values(self):
        buf = b" 1.5\t2e3\n-4.25 +6 7.0e-2 8 \n\n.5 -.5 1e-300 12345678901234.5"
        got = native.parse_doubles(buf)
        exp = np.array(buf.split(), dtype=np.float64)
        np.testing.assert_array_equal(got, exp)

    def test_parse_doubles_empty_and_bad(self):
        assert len(native.parse_doubles(b"")) == 0
        assert len(native.parse_doubles(b"  \n \t ")) == 0
        with pytest.raises(ValueError, match="byte 4"):
            native.parse_doubles(b"1 2 x 3")

    def test_scan_tagged_structure(self):
        buf = (b"# comment line\n"
               b"TAG_A 1 2.5 -3\n"
               b"UNKNOWN stuff that is not numeric\n"
               b"TAG_B 4\n"
               b"   TAG_A 5 6 7\n"
               b"TAG_A 8 9 10")  # no trailing newline
        ids, offs, cnts, fields = native.scan_tagged(buf, ["TAG_A", "TAG_B"])
        assert ids.tolist() == [0, 1, 0, 0]
        assert cnts.tolist() == [3, 1, 3, 3]
        rows = [fields[o:o + c].tolist() for o, c in zip(offs, cnts)]
        assert rows == [[1, 2.5, -3], [4], [5, 6, 7], [8, 9, 10]]

    def test_scan_tagged_bad_numeric(self):
        with pytest.raises(ValueError, match="bad token"):
            native.scan_tagged(b"TAG_A 1 oops\n", ["TAG_A"])


def _pose_graph_equal(a, b):
    assert a.dim == b.dim
    np.testing.assert_allclose(a.T_init, b.T_init, rtol=0, atol=0)
    np.testing.assert_array_equal(a.edges_i, b.edges_i)
    np.testing.assert_array_equal(a.edges_j, b.edges_j)
    np.testing.assert_allclose(a.T_meas, b.T_meas, rtol=0, atol=0)
    np.testing.assert_allclose(a.sqrt_info, b.sqrt_info, rtol=0, atol=1e-13)


@needs_native
class TestNativeEqualsPython:
    """Same file through the native scanner and the Python fallback."""

    def _compare_g2o(self, path, monkeypatch):
        fast = g2o.read_g2o(path)
        monkeypatch.setattr(native, "_lib", None)
        monkeypatch.setattr(native, "_tried", True)
        slow = g2o.read_g2o(path)
        return fast, slow

    def test_se2(self, tmp_path, monkeypatch):
        data = synth.se2_loop(40, seed=3)
        p = tmp_path / "a.g2o"
        g2o.write_g2o(p, data)
        fast, slow = self._compare_g2o(p, monkeypatch)
        _pose_graph_equal(fast, slow)

    def test_se3(self, tmp_path, monkeypatch):
        data = synth.se3_sphere(60, seed=4)
        p = tmp_path / "a.g2o"
        g2o.write_g2o(p, data)
        fast, slow = self._compare_g2o(p, monkeypatch)
        _pose_graph_equal(fast, slow)

    def test_sim3(self, tmp_path, monkeypatch):
        data = synth.sim3_loop(30, seed=5)
        p = tmp_path / "a.g2o"
        g2o.write_g2o(p, data)
        fast, slow = self._compare_g2o(p, monkeypatch)
        _pose_graph_equal(fast, slow)
        assert fast.sqrt_info.shape[-1] == 7

    def test_landmarks(self, tmp_path, monkeypatch):
        data = synth.landmark_slam_2d(30, n_landmarks=12, obs_type="xy", seed=6)
        p = tmp_path / "a.g2o"
        g2o.write_g2o_landmarks(p, data)
        fast, slow = self._compare_g2o(p, monkeypatch)
        np.testing.assert_allclose(fast.T_init, slow.T_init)
        np.testing.assert_allclose(fast.lm_init, slow.lm_init)
        np.testing.assert_array_equal(fast.obs_pose, slow.obs_pose)
        np.testing.assert_array_equal(fast.obs_lm, slow.obs_lm)
        np.testing.assert_allclose(fast.obs_sqrt_info, slow.obs_sqrt_info,
                                   atol=1e-13)

    def test_bal(self, tmp_path, monkeypatch):
        data = bal.synthetic_bal(6, 50, obs_per_pt=3, seed=7)
        p = tmp_path / "a.bal"
        bal.write_bal(str(p), data)
        fast = bal.read_bal(str(p))
        monkeypatch.setattr(native, "_lib", None)
        monkeypatch.setattr(native, "_tried", True)
        slow = bal.read_bal(str(p))
        for f in ("T", "intrinsics", "pts", "obs"):
            np.testing.assert_array_equal(getattr(fast, f), getattr(slow, f))
        np.testing.assert_array_equal(fast.cam_idx, slow.cam_idx)
        np.testing.assert_array_equal(fast.pt_idx, slow.pt_idx)


class TestFallbackReaders:
    """The pure-Python paths still round-trip when native is unavailable."""

    def test_g2o_se2_roundtrip(self, tmp_path, no_native):
        data = synth.se2_loop(25, seed=8)
        p = tmp_path / "a.g2o"
        g2o.write_g2o(p, data)
        back = g2o.read_g2o(p)
        np.testing.assert_allclose(back.T_init, data.T_init, atol=1e-7)

    def test_bal_roundtrip(self, tmp_path, no_native):
        data = bal.synthetic_bal(4, 30, obs_per_pt=3, seed=9)
        p = tmp_path / "a.bal"
        bal.write_bal(str(p), data)
        back = bal.read_bal(str(p))
        np.testing.assert_allclose(back.T, data.T, atol=1e-12)


class TestReaderValidation:
    def test_missing_vertex_raises(self, tmp_path):
        p = tmp_path / "bad.g2o"
        p.write_text("VERTEX_SE2 0 0 0 0\nVERTEX_SE2 2 1 0 0\n")
        with pytest.raises(ValueError, match="missing vertex id 1"):
            g2o.read_g2o(p)

    def test_wrong_field_count_raises(self, tmp_path):
        p = tmp_path / "bad.g2o"
        p.write_text("VERTEX_SE2 0 0 0\n")
        with pytest.raises(ValueError, match="expected 4"):
            g2o.read_g2o(p)

    def test_unknown_edge_endpoint_raises(self, tmp_path):
        p = tmp_path / "bad.g2o"
        p.write_text(
            "VERTEX_SE2 0 0 0 0\nVERTEX_XY 1 1 1\n"
            "EDGE_SE2_XY 5 1 0.5 0.5 1 0 1\n")
        with pytest.raises(ValueError, match="unknown pose id 5"):
            g2o.read_g2o(p)
