"""Quantization-aware training (fake-quant STE) tests.

The reference has no quant axis at all; QAT here extends its fine-tune
recovery protocol (``/root/reference/src/approx/hooks/finetune.py:95-420``,
L2 then CE) to the framework's biggest measured TPU win (int8 PTQ serving)
so the int8 surface can be *recovered*, not just calibrated (VERDICT r3 #1).
"""

import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest

from convnet_approximater_tpu.layers.quant import (
    INT8_MAX,
    QATConv2d,
    QATLinear,
    QuantConv2d,
    QuantLinear,
    fake_quant,
    fake_quant_weight,
    quantize_weight_per_channel,
)
from convnet_approximater_tpu.nn.layers import Conv2d, Linear
from convnet_approximater_tpu.nn.module import Sequential


# ---------------------------------------------------------------------------
# STE primitive
# ---------------------------------------------------------------------------

def test_fake_quant_values_on_grid():
    """Forward values land exactly on the scale*{-127..127} grid and clip."""
    s = 0.5
    x = jnp.array([0.1, 0.26, -0.74, 63.49, 64.0, -100.0])
    y = fake_quant(x, s)
    expect = np.clip(np.round(np.asarray(x) / s), -127, 127) * s
    np.testing.assert_allclose(np.asarray(y), expect, rtol=0, atol=1e-6)


def test_fake_quant_ste_gradient_mask():
    """Backward is identity inside the representable range, zero outside
    the clip boundary (the straight-through estimator)."""
    s = 1.0  # range +-127
    x = jnp.array([0.3, -5.2, 126.9, 127.0, 128.5, -400.0])
    g = jax.grad(lambda v: jnp.sum(fake_quant(v, s)))(x)
    np.testing.assert_allclose(np.asarray(g), [1, 1, 1, 1, 0, 0], atol=1e-6)


def test_fake_quant_weight_matches_ptq_grid():
    """QAT's weight grid dequantizes to exactly what quantize_weight_per_
    channel (the PTQ/serving path) would produce — train-time numerics ==
    export numerics."""
    w = jax.random.normal(jax.random.PRNGKey(0), (3, 3, 4, 8)) * \
        jnp.arange(1, 9)  # distinct per-channel ranges
    w_fq = fake_quant_weight(w, reduce_axes=(0, 1, 2))
    w_q, scale = quantize_weight_per_channel(w)
    np.testing.assert_allclose(np.asarray(w_fq),
                               np.asarray(w_q, np.float32) * np.asarray(scale),
                               rtol=0, atol=1e-6)


# ---------------------------------------------------------------------------
# QAT modules
# ---------------------------------------------------------------------------

def _dense_conv_net(key):
    model = Sequential(Conv2d(3, 8, 3, padding=1), Conv2d(8, 8, 3, padding=1))
    params = model.init(key)
    return model, params


def test_qat_conv_param_tree_identical_to_dense():
    """prepare_qat must not disturb the param tree (optimizer/checkpoint
    compatibility): QAT twins share the dense structure exactly."""
    model, params = _dense_conv_net(jax.random.PRNGKey(0))
    qat = QATConv2d.from_conv(model[0])
    ref = model[0].init_params(jax.random.PRNGKey(1))
    got = qat.init_params(jax.random.PRNGKey(1))
    assert jax.tree_util.tree_structure(ref) == jax.tree_util.tree_structure(got)
    for a, b in zip(jax.tree_util.tree_leaves(ref), jax.tree_util.tree_leaves(got)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_qat_observer_updates_and_eval_freezes():
    conv = QATConv2d(3, 4, 3, padding=1)
    params = conv.init(jax.random.PRNGKey(0))
    state = conv.init_state()
    x = jax.random.normal(jax.random.PRNGKey(1), (2, 8, 8, 3))
    _, new_state, _ = conv.apply(params, x, state=state, training=True)
    absmax = float(new_state["act_absmax"])
    assert absmax == pytest.approx(float(jnp.max(jnp.abs(x))))  # warm start
    # second batch: EMA, not replace
    x2 = x * 2.0
    _, s2, _ = conv.apply(params, x2, state=new_state, training=True)
    assert float(s2["act_absmax"]) == pytest.approx(
        0.9 * absmax + 0.1 * 2 * absmax)
    # eval leaves state untouched
    _, s3, _ = conv.apply(params, x, state=s2, training=False)
    assert float(s3["act_absmax"]) == pytest.approx(float(s2["act_absmax"]))


def test_qat_eval_matches_int8_serving_forward():
    """QATConv2d at eval (fake-quant f32 math) must equal QuantConv2d (real
    int8 conv, int32 accumulate) given the same scales — small sizes keep
    every f32 product/sum exact, so the match is bit-level."""
    conv = QATConv2d(3, 4, 3, padding=1)
    params = conv.init(jax.random.PRNGKey(0))
    x = jax.random.normal(jax.random.PRNGKey(1), (2, 6, 6, 3))
    absmax = float(jnp.max(jnp.abs(x)))
    state = {"act_absmax": jnp.float32(absmax)}
    y_qat, _, _ = conv.apply(params, x, state=state, training=False)

    qmod, qparams = QuantConv2d.from_conv(
        Conv2d(3, 4, 3, padding=1), params, absmax / 127.0)
    y_int8, _, _ = qmod.apply(qparams, x, training=False)
    np.testing.assert_allclose(np.asarray(y_qat), np.asarray(y_int8),
                               rtol=0, atol=1e-5)


def test_qat_linear_eval_matches_int8_serving_forward():
    lin = QATLinear(16, 8)
    params = lin.init(jax.random.PRNGKey(0))
    x = jax.random.normal(jax.random.PRNGKey(1), (4, 16))
    absmax = float(jnp.max(jnp.abs(x)))
    y_qat, _, _ = lin.apply(params, x, state={"act_absmax": jnp.float32(absmax)},
                            training=False)
    qmod, qparams = QuantLinear.from_linear(Linear(16, 8), params, absmax / 127.0)
    y_int8, _, _ = qmod.apply(qparams, x, training=False)
    np.testing.assert_allclose(np.asarray(y_qat), np.asarray(y_int8),
                               rtol=0, atol=1e-5)


def test_qat_weight_gradient_flows():
    """STE lets loss gradients reach the float weights (and they are not
    the dense gradients — the grid is in the path)."""
    conv = QATConv2d(3, 4, 3, padding=1)
    params = conv.init(jax.random.PRNGKey(0))
    state = {"act_absmax": jnp.float32(3.0)}
    x = jax.random.normal(jax.random.PRNGKey(1), (2, 6, 6, 3))

    def loss(p):
        y, _, _ = conv.apply(p, x, state=state, training=False)
        return jnp.sum(y ** 2)

    g = jax.grad(loss)(params)
    assert float(jnp.max(jnp.abs(g["weight"]))) > 0
    assert float(jnp.max(jnp.abs(g["bias"]))) > 0


# ---------------------------------------------------------------------------
# deploy passes: prepare_qat / convert_qat_to_int8
# ---------------------------------------------------------------------------

def test_prepare_and_convert_roundtrip():
    from convnet_approximater_tpu import deploy

    model = Sequential(Conv2d(3, 8, 3, padding=1), Conv2d(8, 8, 3, padding=1,
                                                          groups=8),
                       Linear(8, 4))
    variables = {"params": model.init(jax.random.PRNGKey(0)), "state": {}}
    params_before = jax.tree_util.tree_structure(variables["params"])

    n = deploy.prepare_qat(model, variables)
    assert n == 2  # dense conv + linear; the depthwise conv stays
    assert isinstance(model[0], QATConv2d)
    assert type(model[1]) is Conv2d
    assert isinstance(model[2], QATLinear)
    # param tree untouched; state seeded for stable jit signatures
    assert jax.tree_util.tree_structure(variables["params"]) == params_before
    assert "act_absmax" in variables["state"]["0"]
    assert "act_absmax" in variables["state"]["2"]

    # one training batch populates the observers
    x = jax.random.normal(jax.random.PRNGKey(1), (2, 6, 6, 3))
    xl = jax.random.normal(jax.random.PRNGKey(2), (2, 8))
    _, s, _ = model[0].apply(variables["params"]["0"], x,
                             state=variables["state"]["0"], training=True)
    variables["state"]["0"] = s
    _, s, _ = model[2].apply(variables["params"]["2"], xl,
                             state=variables["state"]["2"], training=True)
    variables["state"]["2"] = s

    n = deploy.convert_qat_to_int8(model, variables)
    assert n == 2
    assert isinstance(model[0], QuantConv2d)
    assert isinstance(model[2], QuantLinear)
    assert variables["params"]["0"]["weight_q"].dtype == jnp.int8
    assert "act_absmax" not in variables["state"].get("0", {})
    # converted model serves
    y, _, _ = model[0].apply(variables["params"]["0"], x, training=False)
    assert y.shape == (2, 6, 6, 8)


def test_convert_without_training_raises():
    from convnet_approximater_tpu import deploy

    model = Sequential(Conv2d(3, 4, 3, padding=1))
    variables = {"params": model.init(jax.random.PRNGKey(0)), "state": {}}
    deploy.prepare_qat(model, variables)
    with pytest.raises(RuntimeError, match="never saw a training batch"):
        deploy.convert_qat_to_int8(model, variables)


# ---------------------------------------------------------------------------
# The point of QAT: recovered int8 accuracy >= PTQ
# ---------------------------------------------------------------------------

def test_qat_finetune_beats_ptq_on_quant_hostile_task():
    """End-to-end: train a float MLP, int8-PTQ it (accuracy drops because
    one input feature dominates the per-tensor act scale), then QAT
    fine-tune the same float weights and convert — the QAT int8 model must
    reconstruct better than the PTQ int8 model.  This is the synthetic
    analog of VERDICT r3 #1's 'QAT top-1 >= PTQ top-1' requirement."""
    from convnet_approximater_tpu import deploy

    key = jax.random.PRNGKey(0)
    k1, k2, k3 = jax.random.split(key, 3)
    # inputs with a huge-dynamic-range nuisance feature: per-tensor int8
    # activation grids starve the small features -> real PTQ damage
    n, d = 256, 16
    x = jax.random.normal(k1, (n, d))
    x = x.at[:, 0].multiply(50.0)
    w_true = jax.random.normal(k2, (d, 4)) / jnp.sqrt(d)
    w_true = w_true.at[0, :].multiply(0.01)  # the big feature barely matters
    y_true = jnp.tanh(x @ w_true)

    def make_model():
        from convnet_approximater_tpu.nn.layers import ReLU

        return Sequential(Linear(d, 32), ReLU(), Linear(32, 4))

    def mse(model, variables, xb, yb):
        out, _, _ = model.apply(variables["params"], xb,
                                state=variables.get("state", {}),
                                training=False)
        return float(jnp.mean((out - yb) ** 2))

    # -- float training ----------------------------------------------------
    model = make_model()
    variables = {"params": model.init(k3), "state": {}}
    tx = optax.adam(1e-2)

    def fit(model, variables, steps, training):
        opt_state = tx.init(variables["params"])
        state = variables.get("state", {})

        @jax.jit
        def step(params, state, opt_state):
            def loss_fn(p):
                out, new_s, _ = model.apply(p, x, state=state,
                                            training=training)
                return jnp.mean((out - y_true) ** 2), new_s

            (l, new_s), g = jax.value_and_grad(loss_fn, has_aux=True)(params)
            updates, opt_state = tx.update(g, opt_state, params)
            return optax.apply_updates(params, updates), new_s, opt_state, l

        params = variables["params"]
        for _ in range(steps):
            params, state, opt_state, l = step(params, state, opt_state)
        return {"params": params, "state": state}, float(l)

    variables, float_loss = fit(model, variables, 1500, training=False)
    assert float_loss < 2e-2  # float model fits the task

    # -- PTQ ---------------------------------------------------------------
    import copy

    ptq_model = make_model()
    # rebuild module tree around the SAME trained params
    ptq_vars = {"params": copy.deepcopy(variables["params"]), "state": {}}
    deploy.quantize_int8(ptq_model, ptq_vars, [x])
    ptq_loss = mse(ptq_model, ptq_vars, x, y_true)
    assert ptq_loss > 1.5 * float_loss  # the task really is quant-hostile

    # -- QAT fine-tune from the float weights ------------------------------
    qat_model = make_model()
    qat_vars = {"params": copy.deepcopy(variables["params"]), "state": {}}
    deploy.prepare_qat(qat_model, qat_vars)
    qat_vars, _ = fit(qat_model, qat_vars, 800, training=True)
    deploy.convert_qat_to_int8(qat_model, qat_vars)
    qat_loss = mse(qat_model, qat_vars, x, y_true)

    assert qat_loss < ptq_loss, (qat_loss, ptq_loss)


def test_export_model_int8_qat_cli(tmp_path):
    """export_model --quantize int8-qat: a QAT fine-tune checkpoint (dense
    params + learned act_absmax observer state) exports to a verified int8
    StableHLO artifact via the learned scales — no calibration batches."""
    import os
    import subprocess
    import sys

    from convnet_approximater_tpu import deploy
    from convnet_approximater_tpu.models import build_model
    from convnet_approximater_tpu.utils.serialize import save_model

    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

    # forge the QAT fine-tune product: fold (no-op on AlexNet) + prepare_qat
    # + one training batch to populate the observers
    model = build_model(dict(type="AlexNet"))
    variables = {"params": model.init(jax.random.PRNGKey(0)),
                 "state": model.init_state()}
    deploy.fold_batchnorm(model, variables)
    n = deploy.prepare_qat(model, variables)
    assert n > 0
    x = jax.random.normal(jax.random.PRNGKey(1), (2, 64, 64, 3))
    _, new_state, _ = model.apply(variables["params"], x,
                                  state=variables["state"], training=True,
                                  rng=jax.random.PRNGKey(2))
    variables["state"] = new_state
    ckpt = str(tmp_path / "qat.ckpt.npz")
    save_model(variables, ckpt)

    art = str(tmp_path / "m.stablehlo")
    env = dict(os.environ, JAX_PLATFORMS="cpu")
    r = subprocess.run(
        [sys.executable, os.path.join(root, "scripts/export_model.py"),
         "--config", os.path.join(root, "configs/low-rank-exp/dummy_alexnet.py"),
         "--checkpoint", ckpt, "--out", art, "--batch", "2",
         "--input-size", "64", "64", "3", "--dtype", "float32",
         "--quantize", "int8-qat", "--platform", "cpu"],
        capture_output=True, text=True, timeout=420, env=env)
    assert r.returncode == 0, r.stderr[-2000:]
    out = r.stderr + r.stdout
    assert "convert_qat_to_int8" in out and "exported" in out


def test_prepare_qat_hook_with_l2_recovery(tmp_path):
    """The config-wired pipeline: approximate -> PrepareQAT (dense
    remainder only, per the disjoint-layer rule) -> L2Reconstruct CE
    recovery trains under fake-quant and populates the observers."""
    from convnet_approximater_tpu.layers.quant import QATConv2d, QATLinear
    from convnet_approximater_tpu.runner import Runner
    from convnet_approximater_tpu.utils import init_cfg, update_cfg

    import tests.test_finetune as tf

    cfg_text = tf.TINY_MODEL + f"""
hooks = [dict(type="PrepareQAT", priority=48),
         dict(type="L2Reconstruct", priority=50, asym=True, no_norm=True,
              l2_weight=0.0, cls_weight=1.0,
{tf.FT_COMMON.format(use_mesh=False, extra_other="")})]
"""
    p = tmp_path / "qat_ft.py"
    p.write_text(cfg_text)
    init_cfg(str(p))
    update_cfg(work_dir=str(tmp_path / "work"), config_name="qat_ft", seed=0)
    runner = Runner(skip_post=True)
    runner.run()

    qat_mods = [(path, m) for path, m in runner.model.named_modules()
                if isinstance(m, (QATConv2d, QATLinear))]
    assert qat_mods, "no QAT modules engaged"
    # disjoint-layer rule: nothing inside substituted branches
    for path, _ in qat_mods:
        assert ".new." not in path and ".old." not in path, path
    # the fine-tune populated every observer
    from convnet_approximater_tpu.deploy import _get

    for path, _ in qat_mods:
        st = _get(runner.variables["state"], path.split("."))
        assert st is not None and float(st["act_absmax"]) > 0, path
    hook = [h for h in runner.hooks if h.name == "L2Reconstruct"][0]
    assert hook.result["best_metric"] is not None


def test_prepare_qat_inside_mscan_scan_stage():
    """QAT observers must ride the scan-over-blocks path: per-block
    act_absmax state threads through the stage scan like BN stats do
    (stage_exec stacks per-block state), and a training forward populates
    every observer."""
    from convnet_approximater_tpu import deploy
    from convnet_approximater_tpu.models import MSCAN_Classifier

    model = MSCAN_Classifier(
        num_channels=(8, 16, 24, 32), num_blocks=(1, 1, 2, 1),
        exp_ratios=(2, 2, 2, 2), num_classes=8, scan_blocks="auto")
    variables = {"params": model.init(jax.random.PRNGKey(0)),
                 "state": model.init_state()}
    n = deploy.prepare_qat(model, variables)
    assert n > 0
    x = jax.random.normal(jax.random.PRNGKey(1), (2, 32, 32, 3))
    y, new_state, _ = model.apply(variables["params"], x,
                                  state=variables["state"], training=True,
                                  rng=jax.random.PRNGKey(2))
    assert bool(jnp.all(jnp.isfinite(y)))
    flat = jax.tree_util.tree_flatten_with_path(new_state)[0]
    observed = [(jax.tree_util.keystr(k), v) for k, v in flat
                if "act_absmax" in jax.tree_util.keystr(k)]
    assert len(observed) == n
    for k, v in observed:
        assert float(jnp.min(v)) > 0, k  # min over any stacked block axis


def test_qat_trains_under_amp(tmp_path):
    """QAT composes with mixed-precision training (bf16 compute casts the
    fake-quant grids too; observers still populate in f32)."""
    from convnet_approximater_tpu import deploy
    from convnet_approximater_tpu.classification import TrainHelper
    from convnet_approximater_tpu.models import build_model

    import tests.test_finetune  # registers TinyNet

    model = build_model(dict(type="TinyNet", num_classes=4))
    variables = {"params": model.init(jax.random.PRNGKey(0)),
                 "state": model.init_state()}
    n = deploy.prepare_qat(model, variables)
    assert n > 0
    helper = TrainHelper(model, variables, dict(
        batch_size=16, image_size=(16, 16), num_classes=4, epochs=1,
        lr=1e-3, sched=None, use_mesh=False, log_interval=100, amp=True,
        max_steps_per_epoch=2, max_eval_batches=1,
        work_dir=str(tmp_path / "qat_amp")))
    result = helper.train()
    assert result["best_metric"] is not None
    flat = jax.tree_util.tree_flatten_with_path(helper.variables["state"])[0]
    obs = [v for k, v in flat if "act_absmax" in jax.tree_util.keystr(k)]
    assert obs and all(float(jnp.min(v)) > 0 for v in obs)
