"""int8 PTQ serving surface: quantization algebra, deploy rewrite, MSCAN
end-to-end (fold + quantize composition, scan-path compatibility)."""

import jax
import jax.numpy as jnp
import pytest

import convnet_approximater_tpu.nn as nn
from convnet_approximater_tpu.deploy import fold_batchnorm, quantize_int8
from convnet_approximater_tpu.layers.quant import (QuantConv2d,
                                                   quantize_weight_per_channel)
from convnet_approximater_tpu.models import MSCAN_Classifier

KEY = jax.random.PRNGKey(0)


def test_weight_quant_roundtrip_error():
    w = jax.random.normal(KEY, (3, 3, 8, 16)) * 0.3
    w_q, scale = quantize_weight_per_channel(w)
    assert w_q.dtype == jnp.int8
    w_hat = w_q.astype(jnp.float32) * scale
    # per-channel symmetric int8: error bounded by scale/2 per element
    assert float(jnp.max(jnp.abs(w_hat - w))) <= float(jnp.max(scale)) / 2 + 1e-7


def _calib_batches(shape, n=3):
    return [jax.random.normal(jax.random.fold_in(KEY, i), shape) * 0.8
            for i in range(n)]


def test_quantize_sequential_close_and_structured():
    model = nn.Sequential(
        nn.Conv2d(3, 16, 3, padding=1),
        nn.GELU(),
        nn.Conv2d(16, 16, 3, padding=1, groups=16),  # depthwise: must stay
        nn.Conv2d(16, 8, 1),
    )
    variables = {"params": model.init(KEY), "state": {}}
    x = jax.random.normal(jax.random.fold_in(KEY, 99), (2, 16, 16, 3))
    y0, _, _ = model.apply(variables["params"], x, training=False)

    n = quantize_int8(model, variables, _calib_batches((2, 16, 16, 3)))
    assert n == 2  # the two dense convs; depthwise untouched
    kinds = [type(m).__name__ for _, m in model.named_modules()
             if type(m).__name__ in ("Conv2d", "QuantConv2d")]
    assert kinds == ["QuantConv2d", "Conv2d", "QuantConv2d"]
    assert "weight_q" in variables["params"]["0"]
    assert variables["params"]["0"]["weight_q"].dtype == jnp.int8

    y1, _, _ = model.apply(variables["params"], x, training=False)
    rel = float(jnp.linalg.norm(y1 - y0) / (jnp.linalg.norm(y0) + 1e-9))
    assert rel < 0.05, rel


def test_quantized_conv_refuses_training():
    model = nn.Sequential(nn.Conv2d(3, 4, 1))
    variables = {"params": model.init(KEY), "state": {}}
    quantize_int8(model, variables, _calib_batches((1, 8, 8, 3), n=1))
    x = jnp.ones((1, 8, 8, 3))
    with pytest.raises(RuntimeError, match="inference-only"):
        model.apply(variables["params"], x, training=True)


def test_quantize_filter_fn():
    model = nn.Sequential(nn.Conv2d(3, 4, 1), nn.Conv2d(4, 4, 1))
    variables = {"params": model.init(KEY), "state": {}}
    n = quantize_int8(model, variables, _calib_batches((1, 8, 8, 3), n=1),
                      filter_fn=lambda path, conv: path == "1")
    assert n == 1
    assert type(model[0]).__name__ == "Conv2d"
    assert type(model[1]).__name__ == "QuantConv2d"


def test_quantize_mscan_fold_compose_scan_path():
    """fold_batchnorm -> quantize_int8 on a small MSCAN; the scanned stage
    stays uniform (every block's convs quantized) and logits stay close."""
    model = MSCAN_Classifier(num_classes=10, num_channels=(8, 12, 16, 20),
                             num_blocks=(2, 2, 2, 2), exp_ratios=(2, 2, 2, 2))
    variables = {"params": model.init(KEY), "state": model.init_state()}
    x = jax.random.normal(KEY, (2, 32, 32, 3))
    y0, _, _ = model.apply(variables["params"], x, state=variables["state"],
                           training=False)

    fold_batchnorm(model, variables)
    n = quantize_int8(model, variables, _calib_batches((2, 32, 32, 3), n=2))
    assert n > 10  # stem(2) + downsamples(3) + per-block proj/mix/fc convs

    y1, _, _ = model.apply(variables["params"], x, state=variables["state"],
                           training=False)
    rel = float(jnp.linalg.norm(y1 - y0) / (jnp.linalg.norm(y0) + 1e-9))
    assert rel < 0.1, rel
    # the scanned stages must still engage: all per-block structures uniform
    backbone = model.backbone
    for _, layer in backbone.layers.named_children():
        stage = layer[1]
        blocks = list(stage.named_children())
        s0 = repr(blocks[0][1])
        assert all(repr(b) == s0 for _, b in blocks[1:])


def test_quantized_checkpoint_roundtrip(tmp_path):
    from convnet_approximater_tpu.utils.serialize import load_ckpt, save_model

    model = nn.Sequential(nn.Conv2d(3, 8, 3, padding=1), nn.GELU(),
                          nn.Conv2d(8, 4, 1))
    variables = {"params": model.init(KEY), "state": {}}
    quantize_int8(model, variables, _calib_batches((1, 8, 8, 3), n=1))
    x = jax.random.normal(KEY, (1, 8, 8, 3))
    y0, _, _ = model.apply(variables["params"], x, training=False)

    p = str(tmp_path / "q.ckpt.npz")
    save_model(variables, p)
    loaded = load_ckpt(p)
    assert loaded["params"]["0"]["weight_q"].dtype == jnp.int8
    y1, _, _ = model.apply(loaded["params"], x, training=False)
    assert jnp.max(jnp.abs(y1 - y0)) == 0


def test_quantize_v3_decomposed_resnet_block():
    """int8 PTQ composes with V3 decomposition + BN fold-through: the
    quantizer finds V3's basis/mix child convs (both groups==1), and the
    quantized forward tracks the folded float forward.  (The TPU
    measurement says don't stack for SPEED — exp_int8_resnet --v3 — but
    the composition must stay correct for compressed+quantized ckpts.)"""
    from convnet_approximater_tpu.core import LowRankExpV3
    from convnet_approximater_tpu.filters import KernelSizeFilter
    from convnet_approximater_tpu.models import ResNet
    from convnet_approximater_tpu.utils.serialize import tree_get

    model = ResNet(depth=18, num_classes=10)
    variables = {"params": model.init(KEY), "state": model.init_state()}
    app = LowRankExpV3(num_bases=(32,) * 16, deploy=True)
    model.register_switchable(app.src_type,
                              [KernelSizeFilter(min_kernel=2, max_kernel=5)])
    for idx in range(model.length_switchable):
        name = model.switchable_names[idx]
        src = model.get_switchable_module(idx)
        sub, sp = app.initialize(src, tree_get(variables["params"], name), KEY)
        model.set_switchable_module(idx, sub, variables, {"params": sp})
    n = fold_batchnorm(model, variables)
    assert n == 20

    x = jax.random.normal(KEY, (2, 64, 64, 3))
    y_f, _, _ = model.apply(variables["params"], x,
                            state=variables["state"], training=False)
    nq = quantize_int8(model, variables, _calib_batches((2, 64, 64, 3)))
    # 16 V3 sites x 2 child convs + stem + 4 downsample projs + fc-adjacent
    assert nq >= 16 * 2
    y_q, _, _ = model.apply(variables["params"], x,
                            state=variables["state"], training=False)
    rel = float(jnp.max(jnp.abs(y_q - y_f)) / (jnp.max(jnp.abs(y_f)) + 1e-9))
    assert rel < 0.12, rel


def test_quantize_linear_fc_stack():
    """linears=True rewrites the fc-heavy classifier to QuantLinear: VGG-11's
    3 classifier Linears quantize alongside its 8 convs, the quantized
    forward tracks the float logits, and training is refused."""
    from convnet_approximater_tpu.layers.quant import QuantLinear
    from convnet_approximater_tpu.models import VGG
    from convnet_approximater_tpu.nn.module import Ctx

    model = VGG(depth=11, num_classes=10)
    variables = {"params": model.init(KEY)}
    x = jax.random.normal(KEY, (2, 64, 64, 3))
    y_f, _, _ = model.apply(variables["params"], x, training=False)
    nq = quantize_int8(model, variables, _calib_batches((2, 64, 64, 3)))
    qlin = [m for _, m in model.named_modules() if isinstance(m, QuantLinear)]
    assert len(qlin) == 3 and nq == 8 + 3
    y_q, _, _ = model.apply(variables["params"], x, training=False)
    rel = float(jnp.max(jnp.abs(y_q - y_f)) / (jnp.max(jnp.abs(y_f)) + 1e-9))
    assert rel < 0.12, rel
    with pytest.raises(RuntimeError):
        model.apply(variables["params"], x, training=True)

    # linears=False keeps the fc stack dense
    m2 = VGG(depth=11, num_classes=10)
    v2 = {"params": m2.init(KEY)}
    nq2 = quantize_int8(m2, v2, _calib_batches((2, 64, 64, 3)), linears=False)
    assert nq2 == 8


def test_export_serving_int8_model(tmp_path):
    """The int8 serving surface exports to a StableHLO artifact and
    reproduces exactly from the file — int8 leaves survive jax.export."""
    from convnet_approximater_tpu.deploy import export_serving, load_serving

    model = nn.Sequential(nn.Conv2d(3, 8, 3, padding=1), nn.GELU(),
                          nn.Conv2d(8, 4, 1))
    variables = {"params": model.init(KEY), "state": {}}
    quantize_int8(model, variables, _calib_batches((1, 8, 8, 3), n=1))
    x = jax.random.normal(KEY, (1, 8, 8, 3))

    def fwd(p, xx):
        y, _, _ = model.apply(p, xx, training=False)
        return y

    path = str(tmp_path / "int8.stablehlo")
    export_serving(fwd, (variables["params"], x), path=path)
    served = load_serving(path)
    # fp fusion-order noise only (int8 math itself is exact)
    assert jnp.max(jnp.abs(served(variables["params"], x)
                           - fwd(variables["params"], x))) < 1e-6
