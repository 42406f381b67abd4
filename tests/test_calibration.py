"""Scheme-2 data-driven calibration: moment collection + end-to-end hook."""

import jax
import jax.numpy as jnp
import numpy as np

from convnet_approximater_tpu.hooks.calibration import strip_second_moment
from convnet_approximater_tpu.runner import Runner
from convnet_approximater_tpu.utils import init_cfg, update_cfg


def test_strip_second_moment_shape_and_psd():
    x = jax.random.normal(jax.random.key(0), (2, 10, 8, 4))
    sm = strip_second_moment(x, 3)
    assert sm.shape == (12, 12)
    np.testing.assert_allclose(np.asarray(sm), np.asarray(sm.T), atol=1e-5)
    evals = np.linalg.eigvalsh(np.asarray(sm))
    assert evals.min() > -1e-5


def test_calibration_hook_pipeline(tmp_path):
    cfg = tmp_path / "cal.py"
    cfg.write_text("""
model = dict(type="TinyNet", num_classes=4)
app = dict(type="LowRankExpV2", num_bases=(4, 4), data_driven_iters=10)
filters = [dict(type="SimpleConvFilter"), dict(type="IndicesFilter", indices=(2, 3))]
hooks = [dict(type="CalibrationHook", priority=40, num_batches=1, batch_size=4,
              image_size=(16, 16))]
""")
    import tests.test_finetune  # registers TinyNet

    init_cfg(str(cfg))
    update_cfg(work_dir=str(tmp_path / "work"), config_name="cal", seed=0)
    runner = Runner(skip_post=True)
    runner.run()
    assert sorted(runner.app._xcov) == [0, 1]
    # xcov shape: C*kh for the first substituted conv (8 ch, k=3) = 24
    assert runner.app._xcov[0].shape == (24, 24)
