"""Utils tests: geometry vs scipy, metric semantics, spec roundtrip."""

import logging

import jax.numpy as jnp
import numpy as np
import pytest

from open_pi_zero_tpu.utils import geometry as geo
from open_pi_zero_tpu.utils import spec as spec_lib
from open_pi_zero_tpu.utils.metric import get_action_accuracy, l1_loss
from open_pi_zero_tpu.utils.monitor import MainRankFilter, Timer


class TestGeometry:
    """Validated against scipy (extrinsic xyz == transforms3d 'sxyz';
    scipy quats are xyzw, ours wxyz)."""

    rng = np.random.default_rng(0)

    def rand_euler(self):
        return self.rng.uniform(-np.pi, np.pi, 3) * [1, 0.49, 1]  # avoid lock

    def test_euler2mat_vs_scipy(self):
        from scipy.spatial.transform import Rotation as R

        for _ in range(20):
            e = self.rand_euler()
            np.testing.assert_allclose(
                geo.euler2mat(*e), R.from_euler("xyz", e).as_matrix(), atol=1e-10
            )

    def test_mat2euler_roundtrip(self):
        for _ in range(20):
            e = self.rand_euler()
            out = geo.mat2euler(geo.euler2mat(*e))
            np.testing.assert_allclose(out, e, atol=1e-9)

    def test_quat_conversions_vs_scipy(self):
        from scipy.spatial.transform import Rotation as R

        for _ in range(20):
            e = self.rand_euler()
            r = R.from_euler("xyz", e)
            q_scipy = r.as_quat()  # xyzw
            q = np.concatenate([[q_scipy[3]], q_scipy[:3]])  # wxyz
            np.testing.assert_allclose(geo.quat2mat(q), r.as_matrix(), atol=1e-10)
            np.testing.assert_allclose(geo.quat2euler(q), e, atol=1e-9)
            q_back = geo.mat2quat(r.as_matrix())
            sign = np.sign(q_back[0]) * np.sign(q[0]) or 1.0
            np.testing.assert_allclose(q_back, sign * q, atol=1e-9)

    def test_euler2axangle_vs_scipy(self):
        from scipy.spatial.transform import Rotation as R

        for _ in range(20):
            e = self.rand_euler()
            axis, angle = geo.euler2axangle(*e)
            rotvec = R.from_euler("xyz", e).as_rotvec()
            np.testing.assert_allclose(axis * angle, rotvec, atol=1e-8)

    def test_axangle2mat(self):
        axis, angle = np.array([0.0, 0.0, 1.0]), np.pi / 2
        m = geo.axangle2mat(axis, angle)
        np.testing.assert_allclose(m @ [1, 0, 0], [0, 1, 0], atol=1e-12)
        assert geo.isrotation(m)

    def test_identity_quat_axangle(self):
        axis, angle = geo.quat2axangle(np.array([1.0, 0, 0, 0]))
        assert angle == 0.0


class TestMetric:
    def test_action_accuracy_thresholds(self):
        gt = jnp.zeros((2, 2, 3))
        pred = jnp.asarray(
            [
                [[0.05, 0.05, 0.05], [0.5, 0.0, 0.0]],  # within 0.1 / one dim off
                [[0.15, 0.0, 0.0], [0.0, 0.0, 0.0]],  # within 0.2 / exact
            ]
        )
        accs = np.asarray(get_action_accuracy(gt, pred, [0.1, 0.2, 1.0]))
        np.testing.assert_allclose(accs, [0.5, 0.75, 1.0])

    def test_l1(self):
        np.testing.assert_allclose(
            float(l1_loss(jnp.ones((2, 2)), jnp.zeros((2, 2)))), 1.0
        )


def test_spec_roundtrip():
    s = spec_lib.create("math:sqrt")
    fn = spec_lib.instantiate(s)
    assert fn(4.0) == 2.0
    s2 = spec_lib.create(np.clip, a_min=0, a_max=1)
    fn2 = spec_lib.instantiate(s2)
    np.testing.assert_allclose(fn2(np.asarray([-1.0, 2.0])), [0.0, 1.0])
    assert "clip" in spec_lib.to_string(s2)
    with pytest.raises(ValueError):
        spec_lib.instantiate({"module": "math"})


def test_monitor():
    t = Timer()
    assert t() >= 0
    f = MainRankFilter(main_rank=True)
    rec = logging.LogRecord("x", logging.INFO, "", 0, "msg", (), None)
    assert f.filter(rec)
    assert not MainRankFilter(main_rank=False).filter(rec)
