"""Tests of the functional module system: tree ops, params, state, taps."""

import jax
import jax.numpy as jnp
import numpy as np

import convnet_approximater_tpu.nn as nn
from convnet_approximater_tpu.layers import Substitution


def test_child_registration_and_paths():
    class Net(nn.Module):
        def __init__(self):
            super().__init__()
            self.block = nn.Sequential(nn.Conv2d(3, 8, 3, padding=1), nn.ReLU())
            self.head = nn.Linear(8, 2)

        def __call__(self, params, x, ctx):
            x = self.child("block", params, x, ctx)
            x = x.mean(axis=(1, 2))
            return self.child("head", params, x, ctx)

    net = Net()
    names = [n for n, _ in net.named_modules()]
    assert "block.0" in names and "head" in names
    assert isinstance(net.get_submodule("block.0"), nn.Conv2d)
    # replacement through dotted path (incl. Sequential integer slots)
    net.set_submodule("block.0", nn.Conv2d(3, 8, 5, padding=2))
    assert net.get_submodule("block.0").kernel_size == (5, 5)


def test_init_and_forward_shapes():
    net = nn.Sequential(nn.Conv2d(3, 8, 3, padding=1), nn.ReLU(), nn.Conv2d(8, 4, 1))
    params = net.init(jax.random.key(0))
    assert params["0"]["weight"].shape == (3, 3, 3, 8)
    x = jnp.ones((2, 16, 16, 3))
    y, state, taps = net.apply(params, x)
    assert y.shape == (2, 16, 16, 4)
    assert state == {} and taps == {}


def test_batchnorm_state_update():
    net = nn.Sequential(nn.Conv2d(3, 8, 3, padding=1), nn.BatchNorm2d(8))
    params = net.init(jax.random.key(0))
    state = net.init_state()
    assert set(state["1"]) == {"mean", "var"}
    x = jax.random.normal(jax.random.key(1), (4, 8, 8, 3))
    y, new_state, _ = net.apply(params, x, state=state, training=True)
    # running stats moved away from init
    assert not np.allclose(np.asarray(new_state["1"]["mean"]), 0.0)
    # original state untouched (functional update)
    np.testing.assert_array_equal(np.asarray(state["1"]["mean"]), 0.0)
    # eval mode uses running stats, no update
    y2, state2, _ = net.apply(params, x, state=new_state, training=False)
    assert jnp.allclose(state2["1"]["mean"], new_state["1"]["mean"])


def test_substitution_routing_and_taps():
    old = nn.Conv2d(4, 4, 3, padding=1)
    new = nn.Conv2d(4, 4, 1)
    sub = Substitution(old, new)
    parent = nn.Sequential(sub)
    params = parent.init(jax.random.key(0))
    x = jax.random.normal(jax.random.key(1), (2, 6, 6, 4))

    sub.capture = True
    y_old, _, taps = parent.apply(params, x)
    assert "0.out" in taps
    np.testing.assert_allclose(np.asarray(taps["0.out"]), np.asarray(y_old))

    sub.switch_new(remove_old=False)
    y_new, _, _ = parent.apply(params, x)
    assert not np.allclose(np.asarray(y_old), np.asarray(y_new))

    sub.switch_new(remove_old=True)
    assert "old" not in dict(sub.named_children())
    params["0"].pop("old")
    y_new2, _, _ = parent.apply(params, x)
    np.testing.assert_allclose(np.asarray(y_new2), np.asarray(y_new))


def test_dropout_and_droppath_rng():
    from convnet_approximater_tpu.layers import DropPath

    net = nn.Sequential(nn.Dropout(0.5), DropPath(0.5))
    params = net.init(jax.random.key(0))
    x = jnp.ones((8, 4, 4, 2))
    y1, _, _ = net.apply(params, x, training=True, rng=jax.random.key(7))
    y2, _, _ = net.apply(params, x, training=True, rng=jax.random.key(7))
    np.testing.assert_array_equal(np.asarray(y1), np.asarray(y2))  # deterministic per rng
    y3, _, _ = net.apply(params, x, training=True, rng=jax.random.key(8))
    assert not np.allclose(np.asarray(y1), np.asarray(y3))
    y4, _, _ = net.apply(params, x, training=False)
    np.testing.assert_array_equal(np.asarray(y4), np.asarray(x))


def test_jit_purity():
    net = nn.Sequential(nn.Conv2d(3, 8, 3, padding=1), nn.BatchNorm2d(8), nn.ReLU())
    params = net.init(jax.random.key(0))
    state = net.init_state()

    @jax.jit
    def step(params, state, x):
        y, new_state, _ = net.apply(params, x, state=state, training=True)
        return y.sum(), new_state

    x = jax.random.normal(jax.random.key(1), (2, 8, 8, 3))
    loss, new_state = step(params, state, x)
    assert jnp.isfinite(loss)
    assert new_state["1"]["mean"].shape == (8,)


def test_bf16_inference_end_to_end():
    """bf16 params + input flow through convs/BN/LN without dtype clashes."""
    from convnet_approximater_tpu.models import MSCAN_Classifier
    from convnet_approximater_tpu.utils import cast_floating

    m = MSCAN_Classifier(num_channels=(8, 16), num_blocks=(1, 1),
                         exp_ratios=(2, 2), num_classes=3)
    v = {"params": m.init(jax.random.key(0)), "state": m.init_state()}
    pb = cast_floating(v["params"])
    xb = jax.random.normal(jax.random.key(1), (2, 64, 64, 3), jnp.bfloat16)
    y, _, _ = m.apply(pb, xb, state=v["state"])
    assert y.dtype == jnp.bfloat16 and y.shape == (2, 3)
    # f32 reference within bf16 tolerance
    y32, _, _ = m.apply(v["params"], xb.astype(jnp.float32), state=v["state"])
    rel = float(jnp.linalg.norm(y.astype(jnp.float32) - y32) / jnp.linalg.norm(y32))
    assert rel < 0.1, rel
