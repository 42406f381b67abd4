"""Never-lose deploy policy (VERDICT r2 #2): exact dense re-materialization
of low-rank layers + the model-level per-layer arbiter."""

import jax
import jax.numpy as jnp
import pytest

import convnet_approximater_tpu.nn as nn
from convnet_approximater_tpu.core import LowRankExpV1
from convnet_approximater_tpu.deploy import never_lose_deploy, rematerialize_dense
from convnet_approximater_tpu.filters import SimpleConvFilter
from convnet_approximater_tpu.layers import LowRankExpConvV1, LowRankExpConvV2
from convnet_approximater_tpu.models import MODEL, SwitchableModel
from convnet_approximater_tpu.nn.module import _stable_fold
from convnet_approximater_tpu.utils import tree_get

KEY = jax.random.PRNGKey(7)


def _rel_err(a, b):
    return float(jnp.linalg.norm(a - b) / (jnp.linalg.norm(a) + 1e-12))


@pytest.mark.parametrize("decomp", [False, True])
def test_rematerialize_v1_exact(decomp):
    mod = LowRankExpConvV1(in_channels=6, out_channels=10, kernel_size=5,
                           stride=2, padding=2, num_base=3, decomp=decomp)
    params = mod.init(KEY)
    # randomize: init leaves separable taps tiny but nonzero is fine
    params = jax.tree_util.tree_map(
        lambda a: jax.random.normal(KEY, a.shape, a.dtype) * 0.2, params)
    x = jax.random.normal(KEY, (2, 17, 17, 6))
    y_ref, _, _ = mod.apply(params, x, training=False)
    out = rematerialize_dense(mod, params)
    assert out is not None
    conv, cp = out
    assert conv.kernel_size == (5, 5) and conv.stride == (2, 2)
    y, _, _ = conv.apply(cp, x, training=False)
    assert y.shape == y_ref.shape
    assert _rel_err(y_ref, y) < 1e-5


def test_rematerialize_v2_exact():
    mod = LowRankExpConvV2(in_channels=5, out_channels=9, num_base=4,
                           kernel_size=3, stride=1, padding=1)
    params = mod.init(KEY)
    params = jax.tree_util.tree_map(
        lambda a: jax.random.normal(KEY, a.shape, a.dtype) * 0.2, params)
    x = jax.random.normal(KEY, (2, 11, 11, 5))
    y_ref, _, _ = mod.apply(params, x, training=False)
    conv, cp = rematerialize_dense(mod, params)
    y, _, _ = conv.apply(cp, x, training=False)
    assert _rel_err(y_ref, y) < 1e-5


def test_rematerialize_v2_grouped_unsupported():
    mod = LowRankExpConvV2(in_channels=5, out_channels=9, num_base=4,
                           kernel_size=3, stride=1, padding=1, grouped=True)
    params = mod.init(KEY)
    assert rematerialize_dense(mod, params) is None


if "ArbiterNet" not in MODEL:

    @MODEL.register_module()
    class ArbiterNet(SwitchableModel):
        def __init__(self, init_cfg=None):
            super().__init__(init_cfg=init_cfg)
            self.features = nn.Sequential(
                nn.Conv2d(3, 8, 5, padding=2),
                nn.ReLU(),
                nn.Conv2d(8, 12, 5, padding=2),
                nn.ReLU(),
            )
            self.head = nn.Linear(12, 4)

        def __call__(self, params, x, ctx):
            x = self.child("features", params, x, ctx)
            x = x.mean(axis=(1, 2))
            return self.child("head", params, x, ctx)


def _decomposed_arbiter_net():
    model = MODEL.get("ArbiterNet")()
    variables = {"params": model.init(KEY)}
    app = LowRankExpV1(num_bases=(3, 3), max_iter=0, lmda_length=1,
                       min_lmda=0, max_lmda=0, init_method="svd",
                       do_decomp=True)
    model.register_switchable(app.src_type, [SimpleConvFilter()])
    assert model.length_switchable == 2
    for idx in range(model.length_switchable):
        name = model.switchable_names[idx]
        src = model.get_switchable_module(idx)
        sub, sp = app.initialize(src, tree_get(variables["params"], name),
                                 _stable_fold(KEY, name))
        model.set_switchable_module(idx, sub, variables, {"params": sp})
        app.optimize(sub, sp)
        mod, np_ = app.postprocess(sub, sp)
        model.set_switchable_module(idx, mod, variables, {"params": np_})
    return model, variables


def _fake_timer(per_layer_delta):
    """Deterministic model-level 'timer': 1.0 s base + a delta per switchable
    that is still in decomposed (LowRankExpConvV1) form."""

    def time_fn(model, variables, shape, dtype):
        t = 1.0
        for idx in range(model.length_switchable):
            if isinstance(model.get_switchable_module(idx), LowRankExpConvV1):
                t += per_layer_delta[idx]
        return t

    return time_fn


def test_never_lose_keeps_winning_decomposition():
    model, variables = _decomposed_arbiter_net()
    x = jax.random.normal(KEY, (2, 16, 16, 3))
    y_before, _, _ = model.apply(variables["params"], x, training=False)
    # both layers make the model faster -> keep everything decomposed
    res = never_lose_deploy(model, variables, (2, 16, 16, 3),
                            time_fn=_fake_timer({0: -0.2, 1: -0.1}),
                            verbose=False)
    assert res["kept_decomposed"] == 2
    assert all(l["kept"] == "decomposed" for l in res["layers"])
    y_after, _, _ = model.apply(variables["params"], x, training=False)
    assert _rel_err(y_before, y_after) < 1e-6  # untouched


def test_never_lose_rematerializes_losers():
    model, variables = _decomposed_arbiter_net()
    x = jax.random.normal(KEY, (2, 16, 16, 3))
    y_before, _, _ = model.apply(variables["params"], x, training=False)
    # layer 0 loses 0.5, layer 1 wins 0.2: arbiter must keep only layer 1
    res = never_lose_deploy(model, variables, (2, 16, 16, 3),
                            time_fn=_fake_timer({0: 0.5, 1: -0.2}),
                            verbose=False)
    assert res["kept_decomposed"] == 1
    kept = {l["name"]: l["kept"] for l in res["layers"]}
    names = model.switchable_names
    assert kept[names[0]] == "dense" and kept[names[1]] == "decomposed"
    assert isinstance(model.get_switchable_module(0), nn.Conv2d)
    assert isinstance(model.get_switchable_module(1), LowRankExpConvV1)
    assert res["t_final"] == pytest.approx(0.8)
    # the re-materialization is exact -> whole-model outputs unchanged
    y_after, _, _ = model.apply(variables["params"], x, training=False)
    assert _rel_err(y_before, y_after) < 1e-5


def test_never_lose_all_dense_when_everything_loses():
    model, variables = _decomposed_arbiter_net()
    res = never_lose_deploy(model, variables, (2, 16, 16, 3),
                            time_fn=_fake_timer({0: 0.5, 1: 0.4}),
                            verbose=False)
    assert res["kept_decomposed"] == 0
    assert all(isinstance(m, nn.Conv2d) for m in model.switchable_modules())
    assert res["t_final"] == pytest.approx(1.0)
