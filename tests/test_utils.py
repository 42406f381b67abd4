"""Unit tests for the utils layer: config merge, registry, serialization."""

import os

import numpy as np
import pytest

from convnet_approximater_tpu.utils.config import Config
from convnet_approximater_tpu.utils.registry import Registry, build_from_cfg
from convnet_approximater_tpu.utils.serialize import (
    flatten_tree,
    load_ckpt,
    load_into,
    save_model,
    tree_get,
    tree_set,
    unflatten_tree,
)


def test_config_base_inheritance(tmp_path):
    base = tmp_path / "base.py"
    base.write_text("model = dict(type='A', depth=2, width=8)\nseed = 1\n")
    child = tmp_path / "child.py"
    child.write_text("_base_ = ['base.py']\nmodel = dict(width=16)\nextra = 'x'\n")
    cfg = Config(str(child))
    assert cfg.model.type == "A"
    assert cfg.model.depth == 2
    assert cfg.model.width == 16
    assert cfg.extra == "x"
    assert cfg.seed == 1
    assert cfg.name == "child"
    assert cfg.work_dir == "work_dirs/child"


def test_config_cover_key(tmp_path):
    base = tmp_path / "base.py"
    base.write_text("app = dict(type='A', a=1, b=2)\n")
    child = tmp_path / "child.py"
    child.write_text("_base_ = ['base.py']\napp = dict(_cover_=True, type='B', c=3)\n")
    cfg = Config(str(child))
    assert cfg.app.type == "B"
    assert cfg.app.c == 3
    assert "a" not in cfg.app and "_cover_" not in cfg.app


def test_config_multi_base_and_yaml(tmp_path):
    (tmp_path / "m.yaml").write_text("model: {type: M}\n")
    (tmp_path / "a.py").write_text("app = dict(type='App')\n")
    leaf = tmp_path / "leaf.py"
    leaf.write_text("_base_ = ['m.yaml', 'a.py']\nfilters = []\n")
    cfg = Config(str(leaf))
    assert cfg.model.type == "M" and cfg.app.type == "App" and cfg.filters == []


def test_config_missing_key_is_none():
    cfg = Config()
    assert cfg.not_there is None


def test_registry_build():
    REG = Registry("test")

    @REG.register_module()
    class Foo:
        def __init__(self, a=1, b=2):
            self.a, self.b = a, b

    obj = build_from_cfg(dict(type="Foo", a=5), REG)
    assert obj.a == 5 and obj.b == 2
    assert build_from_cfg("Foo", REG).a == 1
    assert build_from_cfg(None, REG) is None
    with pytest.raises(KeyError):
        REG.get("Bar")
    with pytest.raises(TypeError):
        build_from_cfg(dict(type="Foo", nope=1), REG)


def test_flatten_roundtrip():
    tree = {"a": {"b": np.ones(3), "c": {"d": np.zeros(2)}}, "e": np.arange(4)}
    flat = flatten_tree(tree)
    assert set(flat) == {"a/b", "a/c/d", "e"}
    back = unflatten_tree(flat)
    np.testing.assert_array_equal(back["a"]["c"]["d"], np.zeros(2))


def test_save_load_roundtrip(tmp_path):
    vars_ = {"params": {"conv": {"weight": np.random.randn(3, 3, 4, 8).astype(np.float32)}}}
    path = str(tmp_path / "m.ckpt.npz")
    save_model(vars_, path)
    loaded = load_ckpt(path)
    np.testing.assert_allclose(loaded["params"]["conv"]["weight"], vars_["params"]["conv"]["weight"])


def test_load_into_nonstrict(tmp_path):
    cur = {"params": {"a": np.zeros(2), "b": np.zeros(3)}}
    ckpt = {"params": {"a": np.ones(2), "z": np.ones(1)}}
    merged = load_into(cur, ckpt)
    np.testing.assert_array_equal(merged["params"]["a"], np.ones(2))
    np.testing.assert_array_equal(merged["params"]["b"], np.zeros(3))
    assert "z" not in merged["params"]


def test_tree_get_set():
    t = {"x": {"y": 1}}
    assert tree_get(t, "x.y") == 1
    tree_set(t, "x.z", 5)
    assert t["x"]["z"] == 5
    assert tree_get(t, "") is t


def test_load_into_strict_raises():
    cur = {"params": {"a": np.zeros(2)}}
    ckpt = {"params": {"b": np.ones(2)}}
    with pytest.raises(ValueError):
        load_into(cur, ckpt, strict=True)
    merged = load_into(cur, {"params": {"a": np.ones(2)}}, strict=True)
    np.testing.assert_array_equal(merged["params"]["a"], np.ones(2))


def test_orbax_checkpoint_roundtrip(tmp_path):
    """A path ending in .orbax selects the orbax/TensorStore backend; the
    stored key space matches the npz format so loads are interchangeable."""
    import numpy as np

    from convnet_approximater_tpu.utils.serialize import load_ckpt, save_model

    tree = {"params": {"conv": {"weight": np.arange(12.0).reshape(3, 4),
                                "bias": np.zeros(4, np.float32)}},
            "state": {"bn": {"mean": np.ones(4, np.float32)}}}
    path = str(tmp_path / "model.orbax")
    save_model(tree, path)
    back = load_ckpt(path)
    np.testing.assert_array_equal(back["params"]["conv"]["weight"],
                                  tree["params"]["conv"]["weight"])
    np.testing.assert_array_equal(back["state"]["bn"]["mean"],
                                  tree["state"]["bn"]["mean"])
    # overwrite works (orbax refuses to clobber without the rm)
    save_model(tree, path)
    assert load_ckpt(path)["params"]["conv"]["bias"].shape == (4,)


def test_checkpoint_bf16_roundtrip(tmp_path):
    """npz checkpoints preserve accelerator-only dtypes (bf16 serving
    surfaces, int8 quantized weights) bit-exactly — npz alone would degrade
    bf16 to raw void records (the ::dtype key-marker scheme)."""
    import jax.numpy as jnp
    import numpy as np

    from convnet_approximater_tpu.utils.serialize import load_ckpt, save_model

    tree = {"params": {
        "w_bf16": jnp.arange(6, dtype=jnp.bfloat16).reshape(2, 3) * 0.5,
        "w_f32": jnp.ones((2,), jnp.float32),
        "w_int8": jnp.asarray([-3, 7], jnp.int8),
    }}
    path = str(tmp_path / "mixed.ckpt.npz")
    save_model(tree, path)
    back = load_ckpt(path)["params"]
    assert back["w_bf16"].dtype == jnp.bfloat16
    assert np.array_equal(np.asarray(back["w_bf16"], np.float32),
                          np.asarray(tree["params"]["w_bf16"], np.float32))
    assert back["w_f32"].dtype == np.float32
    assert back["w_int8"].dtype == np.int8


def test_save_model_rejects_marker_collision(tmp_path):
    """A param key containing the reserved '::' dtype marker would make
    load_ckpt's rpartition mis-fire and silently bit-reinterpret the
    array — save_model refuses it up front (ADVICE r3)."""
    import jax.numpy as jnp
    import pytest

    from convnet_approximater_tpu.utils.serialize import save_model

    tree = {"params": {"w::bfloat16": jnp.ones((2,), jnp.float32)}}
    with pytest.raises(ValueError, match="reserved dtype marker"):
        save_model(tree, str(tmp_path / "bad.npz"))
