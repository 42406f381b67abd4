"""Model construction, forward shapes, switchable registration order."""

import jax
import jax.numpy as jnp
import pytest

from convnet_approximater_tpu.filters import IndicesFilter, SimpleConvFilter
from convnet_approximater_tpu.layers import MSCA
from convnet_approximater_tpu.models import AlexNet, MSCAN_Classifier, ResNet, VGG, build_model
from convnet_approximater_tpu.nn import Conv2d


def test_alexnet_forward():
    model = AlexNet(num_classes=10)
    params = model.init(jax.random.key(0))
    x = jnp.ones((2, 224, 224, 3))
    y, _, _ = model.apply(params, x)
    assert y.shape == (2, 10)


def test_alexnet_register_order():
    model = AlexNet()
    model.register_switchable(Conv2d, [SimpleConvFilter()])
    # all 5 convs are eligible, in BFS order within features
    assert model.switchable_names == [
        "features.0", "features.3", "features.6", "features.8", "features.10",
    ]
    # IndicesFilter selects 1-based positions in the candidate stream
    f = IndicesFilter(indices=(2, 3, 4, 5))
    model.register_switchable(Conv2d, [SimpleConvFilter(), f])
    assert model.switchable_names == ["features.3", "features.6", "features.8", "features.10"]
    f.rewind()
    model.register_switchable(Conv2d, [SimpleConvFilter(), f])
    assert model.length_switchable == 4


def test_mscan_forward_and_register():
    model = MSCAN_Classifier(
        num_channels=(8, 16, 24, 32), num_blocks=(1, 1, 1, 1),
        exp_ratios=(2, 2, 2, 2), num_classes=7, drop_path_rate=0.1,
    )
    params = model.init(jax.random.key(0))
    state = model.init_state()
    x = jnp.ones((2, 64, 64, 3))
    y, new_state, _ = model.apply(params, x, state=state, training=True, rng=jax.random.key(1))
    assert y.shape == (2, 7)
    model.register_switchable(MSCA, [])
    assert model.length_switchable == 4
    first = model.switchable_names[0]
    assert first == "backbone.layers.0.1.0.attn.spatial_gating_unit"


def test_mscan_tiny_block_counts():
    # mscan-t: 13 switchable MSCA blocks (3+3+5+2) — matches the reference's
    # 13-layer each_layer sweep (configs/msca-rep/each_layer/*_l{1..13}_*)
    model = MSCAN_Classifier()
    model.register_switchable(MSCA, [])
    assert model.length_switchable == 13


def test_vgg_forward_and_register():
    model = VGG(depth=16, num_classes=10)
    params = model.init(jax.random.key(0))
    x = jnp.ones((1, 64, 64, 3))
    y, _, _ = model.apply(params, x)
    assert y.shape == (1, 10)
    model.register_switchable(Conv2d, [SimpleConvFilter()])
    assert model.length_switchable == 13  # VGG-16 has 13 convs


def test_build_model_from_cfg():
    model = build_model(dict(type="AlexNet", num_classes=5))
    assert isinstance(model, AlexNet)


def test_freeze_except_mask():
    model = AlexNet()
    model.register_switchable(Conv2d, [SimpleConvFilter()])
    params = model.init(jax.random.key(0))
    mask = model.freeze_except(params, 1)
    leaves_true = [
        p for p, v in _flat(mask) if v
    ]
    assert all(p.startswith("features.3") for p in leaves_true)
    assert any(p.startswith("features.3") for p in leaves_true)
    full = model.unfreeze(params)
    assert all(v for _, v in _flat(full))


def _flat(tree, prefix=""):
    out = []
    for k, v in tree.items():
        key = f"{prefix}.{k}" if prefix else k
        if isinstance(v, dict):
            out.extend(_flat(v, key))
        else:
            out.append((key, v))
    return out


def test_resnet_forward_and_register():
    model = ResNet(depth=18, num_classes=10)
    params = model.init(jax.random.key(0))
    state = model.init_state()
    x = jnp.ones((1, 64, 64, 3))
    y, _, _ = model.apply(params, x, state=state)
    assert y.shape == (1, 10)
    # ResNet convs carry no bias (BN absorbs it), so the scheme-1 bias
    # precondition filter is skipped; 1 stem + 16 block + 3 downsample convs.
    model.register_switchable(Conv2d, [])
    assert model.length_switchable == 20


def test_resnet_bottleneck_forward():
    model = ResNet(depth=50, num_classes=7)
    params = model.init(jax.random.key(1))
    state = model.init_state()
    y, new_state, _ = model.apply(
        params, jnp.ones((2, 32, 32, 3)), state=state, training=True,
        rng=jax.random.key(2),
    )
    assert y.shape == (2, 7)
    # BN running stats updated in training mode
    assert not jnp.allclose(new_state["bn1"]["mean"], state["bn1"]["mean"])
