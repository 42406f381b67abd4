"""Device-sharded checkpointing (utils/sharded_ckpt): shard-parallel save,
restore-with-resharding onto a different mesh topology (elastic resume), async
commit, and the CheckpointSaver / fine-tune integration."""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import NamedSharding, PartitionSpec as P

from convnet_approximater_tpu.parallel import make_mesh
from convnet_approximater_tpu.utils.serialize import load_ckpt
from convnet_approximater_tpu.utils.sharded_ckpt import (
    abstract_like,
    restore_sharded,
    save_sharded,
    wait_for_saves,
)


def _tree(mesh):
    return {
        "params": {
            "w": jax.device_put(
                jnp.arange(64, dtype=jnp.float32).reshape(8, 8),
                NamedSharding(mesh, P(None, "model")),
            ),
            "b": jax.device_put(jnp.ones((8,)), NamedSharding(mesh, P())),
        },
        "state": {},
        "meta": {"epoch": 3, "metric": 0.125},
    }


def test_sharded_roundtrip_to_host(tmp_path):
    mesh = make_mesh(data=4, model=2)
    path = str(tmp_path / "ckpt.oshard")
    save_sharded(path, _tree(mesh))
    restored = restore_sharded(path)
    np.testing.assert_array_equal(restored["params"]["w"],
                                  np.arange(64).reshape(8, 8))
    assert isinstance(restored["params"]["w"], np.ndarray)
    assert restored["meta"] == {"epoch": 3, "metric": 0.125}
    assert restored["state"] == {}
    # and through the generic load_ckpt dispatch
    again = load_ckpt(path)
    np.testing.assert_array_equal(again["params"]["b"], np.ones(8))


def test_sharded_restore_reshards_onto_new_mesh(tmp_path):
    """Save on a 4x2 mesh, restore directly onto 2x4 with different specs —
    the elastic-resume path (no host round-trip)."""
    mesh1 = make_mesh(data=4, model=2)
    mesh2 = make_mesh(data=2, model=4)
    path = str(tmp_path / "ckpt.oshard")
    tree = _tree(mesh1)
    save_sharded(path, tree)

    shardings = {
        "params": {"w": NamedSharding(mesh2, P("model", None)),
                   "b": NamedSharding(mesh2, P("data"))},
        "state": {},
        "meta": {"epoch": None, "metric": None},
    }
    target = abstract_like(tree, shardings)
    restored = restore_sharded(path, target)
    w = restored["params"]["w"]
    np.testing.assert_array_equal(np.asarray(w), np.arange(64).reshape(8, 8))
    assert w.sharding.mesh.shape["model"] == 4
    assert w.sharding.spec == P("model", None)
    assert restored["params"]["b"].sharding.spec == P("data")
    assert restored["meta"]["epoch"] == 3


def test_sharded_async_save_commits(tmp_path):
    mesh = make_mesh(data=4, model=2)
    path = str(tmp_path / "ckpt.oshard")
    save_sharded(path, _tree(mesh), wait=False)
    wait_for_saves()
    restored = restore_sharded(path)
    np.testing.assert_array_equal(restored["params"]["w"],
                                  np.arange(64).reshape(8, 8))


def test_checkpoint_saver_sharded_backend(tmp_path):
    """best-k pruning, last/model_best symlinks, opt-state round-trip."""
    import optax

    from convnet_approximater_tpu.hooks.finetune import (
        CheckpointSaver,
        opt_state_from_tree,
        opt_state_to_tree,
    )

    params = {"w": jnp.ones((4, 4)), "b": jnp.zeros((4,))}
    tx = optax.adamw(1e-3)
    opt_state = tx.init(params)
    saver = CheckpointSaver(str(tmp_path), max_history=2, backend="sharded")
    for epoch, metric in enumerate([0.1, 0.5, 0.3]):
        best_metric, best_epoch = saver.save_checkpoint(
            {"params": params, "state": {}}, epoch, metric, opt_state=opt_state)
    wait_for_saves()
    assert (best_metric, best_epoch) == (0.5, 1)
    # history=2: epoch-0 (worst) pruned, 1 and 2 kept
    assert not os.path.exists(str(tmp_path / "checkpoint-0.ckpt.oshard"))
    last = str(tmp_path / "last.ckpt.oshard")
    best = str(tmp_path / "model_best.ckpt.oshard")
    assert os.path.islink(last) and os.readlink(last).endswith("checkpoint-2.ckpt.oshard")
    assert os.path.islink(best) and os.readlink(best).endswith("checkpoint-1.ckpt.oshard")

    ckpt = load_ckpt(last)
    assert int(ckpt["meta"]["epoch"]) == 2
    np.testing.assert_array_equal(ckpt["params"]["w"], np.ones((4, 4)))
    restored_opt = opt_state_from_tree(ckpt["opt"], tx.init(params))
    assert restored_opt is not None
    ref = opt_state_to_tree(opt_state)
    got = opt_state_to_tree(restored_opt)
    for k in ref:
        np.testing.assert_array_equal(ref[k], got[k])


def test_finetune_kill_and_resume_sharded_backend(tmp_path):
    """The kill-and-resume parity guarantee holds through the sharded backend:
    resuming from last.ckpt.oshard reproduces the uninterrupted run exactly."""
    from convnet_approximater_tpu.runner import Runner
    from convnet_approximater_tpu.utils import init_cfg, update_cfg
    from tests.test_finetune import TINY_MODEL

    body = """hooks = [dict(type="L2Reconstruct", priority=50, asym=True, l2_weight=1.0,
    cls_weight=0.1,
    dataset_args=dict(batch_size=16),
    data_config=dict(image_size=(16, 16)),
    optim_args=dict(opt="adamw", lr=5e-3, weight_decay=0.01),
    sche_args=dict(epochs={epochs}),
    other_args=dict(num_classes=4, max_steps_per_epoch=3, max_eval_batches=1,
                    log_interval=100, use_mesh=False, ckpt_backend="sharded"{extra}),
)]
"""

    def run(name, epochs, extra=""):
        p = tmp_path / f"{name}.py"
        p.write_text(TINY_MODEL + body.format(epochs=epochs, extra=extra))
        init_cfg(str(p))
        update_cfg(work_dir=str(tmp_path / name), config_name=name, seed=0)
        runner = Runner(skip_post=True)
        runner.run()
        return runner

    full = run("full", 3)
    run("part", 2)  # "killed" after epoch 1
    wait_for_saves()
    ckpt = str(tmp_path / "part" / "last.ckpt.oshard")
    assert os.path.islink(ckpt)
    resumed = run("resumed", 3, extra=f', resume=r"{ckpt}"')

    f_leaves = jax.tree_util.tree_leaves(full.variables["params"])
    r_leaves = jax.tree_util.tree_leaves(resumed.variables["params"])
    for a, b in zip(f_leaves, r_leaves):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-6, atol=1e-7)


def test_finetune_sharded_backend_over_dp_tp_mesh(tmp_path):
    """The sharded backend saves a genuinely mesh-sharded train state (dp x tp,
    model_parallel=2): orbax writes from the shards, and the checkpoint loads
    back to a host tree through load_ckpt."""
    from convnet_approximater_tpu.runner import Runner
    from convnet_approximater_tpu.utils import init_cfg, update_cfg
    from tests.test_finetune import TINY_MODEL

    cfg_text = TINY_MODEL + """
hooks = [dict(type="L2Reconstruct", priority=50, asym=True, l2_weight=1.0,
    cls_weight=0.0,
    dataset_args=dict(batch_size=16),
    data_config=dict(image_size=(16, 16)),
    optim_args=dict(opt="adamw", lr=1e-4, weight_decay=0.01),
    sche_args=dict(epochs=1),
    other_args=dict(num_classes=4, max_steps_per_epoch=2, max_eval_batches=1,
                    log_interval=100, use_mesh=True, model_parallel=2,
                    tp_rules="mscan", ckpt_backend="sharded"),
)]
"""
    p = tmp_path / "ft_sh.py"
    p.write_text(cfg_text)
    init_cfg(str(p))
    update_cfg(work_dir=str(tmp_path / "work"), config_name="ft_sh", seed=0)
    runner = Runner(skip_post=True)
    runner.run()
    wait_for_saves()
    last = str(tmp_path / "work" / "last.ckpt.oshard")
    assert os.path.islink(last)
    ckpt = load_ckpt(last)
    assert "opt" in ckpt and int(ckpt["meta"]["epoch"]) == 0
    for leaf in jax.tree_util.tree_leaves(ckpt["params"]):
        assert np.all(np.isfinite(leaf))
