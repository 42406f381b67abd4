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
    # training path scans too: BN state updates escape via the scan outputs
    y_tr, new_state, _ = m_scan.apply(params, x, state=state, training=True,
                                      rng=jax.random.key(2))
    assert not np.allclose(
        np.asarray(new_state["backbone"]["layers"]["0"]["1"]["0"]["norm1"]["mean"]), 0.0
    )


def test_scan_blocks_training_matches_unrolled():
    """Deterministic training (no dropout/drop-path): the scanned train step
    must equal the unrolled one — outputs, per-block BN state updates, AND
    loss gradients (VERDICT r1 next-step #5)."""
    from convnet_approximater_tpu.models import MSCAN_Classifier

    kw = dict(num_channels=(8, 16), num_blocks=(3, 2), exp_ratios=(2, 2),
              num_classes=5, drop_rate=0.0, drop_path_rate=0.0)
    m_scan = MSCAN_Classifier(scan_blocks="auto", **kw)
    m_flat = MSCAN_Classifier(scan_blocks="off", **kw)
    params = m_scan.init(jax.random.key(0))
    state = m_scan.init_state()
    x = jax.random.normal(jax.random.key(1), (4, 32, 32, 3))
    labels = jnp.asarray([0, 1, 2, 3])

    def make_loss(model):
        def loss_fn(params, state, x):
            y, new_state, _ = model.apply(params, x, state=state, training=True,
                                          rng=jax.random.key(7))
            one_hot = jax.nn.one_hot(labels, y.shape[-1])
            return -jnp.mean(jnp.sum(jax.nn.log_softmax(y) * one_hot, axis=-1)), new_state
        return loss_fn

    (l_s, st_s), g_s = jax.value_and_grad(make_loss(m_scan), has_aux=True)(params, state, x)
    (l_f, st_f), g_f = jax.value_and_grad(make_loss(m_flat), has_aux=True)(params, state, x)
    np.testing.assert_allclose(float(l_s), float(l_f), rtol=1e-5)
    for a, b in zip(jax.tree_util.tree_leaves(st_s), jax.tree_util.tree_leaves(st_f)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=2e-5, atol=1e-5)
    for a, b in zip(jax.tree_util.tree_leaves(g_s), jax.tree_util.tree_leaves(g_f)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=5e-4, atol=5e-5)
    # per-block BN stats actually moved and differ across blocks
    stage0 = st_s["backbone"]["layers"]["0"]["1"]
    m0 = np.asarray(stage0["0"]["norm1"]["mean"])
    m1 = np.asarray(stage0["1"]["norm1"]["mean"])
    assert not np.allclose(m0, 0.0) and not np.allclose(m0, m1)


def test_scan_blocks_training_stochastic_depth():
    """drop_path_rate > 0 (heterogeneous per-block rates) still scans in
    training: rates ride the scan as data; dropped paths keep outputs finite
    and the step remains differentiable."""
    from convnet_approximater_tpu.models import MSCAN_Classifier

    kw = dict(num_channels=(8, 16), num_blocks=(3, 2), exp_ratios=(2, 2),
              num_classes=5, drop_path_rate=0.5)
    m = MSCAN_Classifier(scan_blocks="auto", **kw)
    params = m.init(jax.random.key(0))
    state = m.init_state()
    x = jax.random.normal(jax.random.key(1), (4, 32, 32, 3))

    def loss_fn(params):
        y, _, _ = m.apply(params, x, state=state, training=True, rng=jax.random.key(3))
        return jnp.sum(y**2)

    val, grads = jax.value_and_grad(loss_fn)(params)
    assert np.isfinite(float(val))
    assert all(np.all(np.isfinite(np.asarray(g))) for g in jax.tree_util.tree_leaves(grads))
    # different rng keys give different stochastic-depth masks
    y1, _, _ = m.apply(params, x, state=state, training=True, rng=jax.random.key(4))
    y2, _, _ = m.apply(params, x, state=state, training=True, rng=jax.random.key(5))
    assert not np.allclose(np.asarray(y1), np.asarray(y2))


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


def test_scan_remat_gradients_match():
    """remat=True (jax.checkpoint over the scan body) must not change
    gradients — only the backward-pass memory/recompute trade."""
    import jax.numpy as jnp
    from convnet_approximater_tpu.models import MSCAN_Classifier

    kw = dict(num_channels=(8, 16), num_blocks=(2, 2), exp_ratios=(2, 2),
              num_classes=5, drop_path_rate=0.0)
    m0 = MSCAN_Classifier(**kw)
    m1 = MSCAN_Classifier(**kw, remat=True)
    key = jax.random.key(0)
    variables = {"params": m0.init(key), "state": m0.init_state()}
    x = jax.random.normal(jax.random.key(1), (2, 32, 32, 3))

    def loss(model):
        def f(params):
            y, _, _ = model.apply(params, x, state=variables["state"],
                                  training=True, rng=jax.random.key(2))
            return jnp.sum(y ** 2)
        return f

    l0, g0 = jax.value_and_grad(loss(m0))(variables["params"])
    l1, g1 = jax.value_and_grad(loss(m1))(variables["params"])
    assert float(abs(l0 - l1)) < 1e-4 * max(1.0, float(abs(l0)))
    for a, b in zip(jax.tree_util.tree_leaves(g0), jax.tree_util.tree_leaves(g1)):
        np.testing.assert_allclose(np.asarray(b), np.asarray(a),
                                   rtol=1e-4, atol=1e-5)
