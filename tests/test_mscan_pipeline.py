"""End-to-end msca-rep pipeline on a small MSCAN through the Runner: the
re-parameterized model must stay close to the original on real forwards, and
the deploy round-trip must reproduce outputs (BN state included)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from convnet_approximater_tpu.runner import Runner
from convnet_approximater_tpu.utils import init_cfg, update_cfg

SMALL_MSCAN = """
model = dict(
    type="MSCAN_Classifier",
    num_channels=(8, 16),
    num_blocks=(1, 1),
    exp_ratios=(2, 2),
    num_classes=5,
)
filters = []
"""


def _run(tmp_path, app_line, **kw):
    p = tmp_path / "m.py"
    p.write_text(SMALL_MSCAN + app_line)
    init_cfg(str(p))
    update_cfg(work_dir=str(tmp_path / "work"), config_name="m", seed=0, **kw)
    runner = Runner(**{k: v for k, v in kw.items() if k in ("deploy", "skip_optim", "skip_post")})
    runner.run()
    return runner


def test_msca_rep_pipeline_quality(tmp_path):
    x = jax.random.normal(jax.random.key(1), (2, 64, 64, 3))

    runner0 = _run(tmp_path, "app = dict(type='Dummy')\n")
    # Dummy app finds no DummyLayer switchables in MSCAN
    assert runner0.model.length_switchable == 0
    y_orig, _, _ = runner0.model.apply(
        runner0.variables["params"], x, state=runner0.variables["state"]
    )

    runner = _run(tmp_path, "app = dict(type='MscaRep', decomp=1, fix=True)\n")
    assert runner.model.length_switchable == 2
    y_rep, _, _ = runner.model.apply(
        runner.variables["params"], x, state=runner.variables["state"]
    )
    assert y_rep.shape == y_orig.shape
    # note: runner0 and runner use the same seed, so non-substituted weights
    # coincide; the rep model should stay reasonably close
    rel = float(jnp.linalg.norm(y_rep - y_orig) / jnp.linalg.norm(y_orig))
    assert rel < 0.9, rel


def test_msca_rep_deploy_roundtrip(tmp_path):
    runner = _run(tmp_path, "app = dict(type='MscaRep', decomp=1, fix=True)\n")
    ckpt = runner.output_path
    x = jax.random.normal(jax.random.key(2), (1, 64, 64, 3))
    y1, _, _ = runner.model.apply(
        runner.variables["params"], x, state=runner.variables["state"]
    )
    runner2 = _run(
        tmp_path, "app = dict(type='MscaRep', decomp=1, fix=True)\n",
        checkpoint=ckpt, deploy=True, skip_optim=True, skip_post=True,
    )
    y2, _, _ = runner2.model.apply(
        runner2.variables["params"], x, state=runner2.variables["state"]
    )
    np.testing.assert_allclose(np.asarray(y1), np.asarray(y2), rtol=1e-4, atol=1e-5)


def test_msca_profile_pipeline(tmp_path):
    runner = _run(tmp_path, "app = dict(type='MscaProfile')\n")
    from convnet_approximater_tpu.layers import MSCAProfile

    for mod in runner.model.switchable_modules():
        assert isinstance(mod, MSCAProfile)
    x = jnp.ones((1, 32, 32, 3))
    y, _, _ = runner.model.apply(
        runner.variables["params"], x, state=runner.variables["state"]
    )
    assert y.shape == (1, 5)


def test_scan_blocks_matches_unrolled():
    """The lax.scan stage path must be numerically identical to unrolled."""
    from convnet_approximater_tpu.models import MSCAN_Classifier

    kw = dict(num_channels=(8, 16), num_blocks=(3, 2), exp_ratios=(2, 2),
              num_classes=5, drop_path_rate=0.1)
    m_scan = MSCAN_Classifier(scan_blocks="auto", **kw)
    m_flat = MSCAN_Classifier(scan_blocks="off", **kw)
    params = m_scan.init(jax.random.key(0))
    state = m_scan.init_state()
    x = jax.random.normal(jax.random.key(1), (2, 32, 32, 3))
    y_scan, _, _ = m_scan.apply(params, x, state=state)
    y_flat, _, _ = m_flat.apply(params, x, state=state)
    np.testing.assert_allclose(np.asarray(y_scan), np.asarray(y_flat), rtol=2e-5, atol=1e-5)
    # training path must NOT scan (BN state updates must escape)
    y_tr, new_state, _ = m_scan.apply(params, x, state=state, training=True,
                                      rng=jax.random.key(2))
    assert not np.allclose(
        np.asarray(new_state["backbone"]["layers"]["0"]["1"]["0"]["norm1"]["mean"]), 0.0
    )


def test_scan_blocks_after_rep(tmp_path):
    """Post-rep (homogeneous substitution) models still scan; outputs match."""
    runner = _run(tmp_path, "app = dict(type='MscaRep', decomp=1, fix=True)\n")
    model = runner.model
    x = jax.random.normal(jax.random.key(3), (1, 64, 64, 3))
    y_auto, _, _ = model.apply(runner.variables["params"], x, state=runner.variables["state"])
    model.backbone.scan_blocks = "off"
    y_flat, _, _ = model.apply(runner.variables["params"], x, state=runner.variables["state"])
    model.backbone.scan_blocks = "auto"
    np.testing.assert_allclose(np.asarray(y_auto), np.asarray(y_flat), rtol=2e-5, atol=1e-5)
