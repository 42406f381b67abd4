"""SegNeXt segmentation: head shapes, NMF properties, msca-rep pipeline
compatibility (the switchable machinery must cover the backbone unchanged)."""

import jax
import jax.numpy as jnp
import numpy as np

from convnet_approximater_tpu.segmentation import SegNeXt, nmf2d, upsample_logits

KEY = jax.random.PRNGKey(0)


def _tiny_segnext(**kw):
    kw.setdefault("num_channels", (8, 12, 16, 20))
    kw.setdefault("num_blocks", (1, 1, 2, 1))
    kw.setdefault("exp_ratios", (2, 2, 2, 2))
    kw.setdefault("num_classes", 7)
    kw.setdefault("ham_channels", 16)
    kw.setdefault("ham_rank", 4)
    kw.setdefault("ham_iters", 3)
    return SegNeXt(**kw)


def test_nmf_low_rank_reconstruction():
    x = jax.nn.relu(jax.random.normal(KEY, (2, 36, 12)))
    y = nmf2d(x, rank=4, iters=10)
    assert y.shape == x.shape
    assert bool(jnp.all(y >= -1e-6))  # nonneg factors -> nonneg recon
    # reconstruction should correlate with the input far better than zero
    err = float(jnp.linalg.norm(y - x) / jnp.linalg.norm(x))
    assert err < 0.9, err
    # rank bound: the (N, C) recon has at most `rank` singular values
    s = jnp.linalg.svd(y[0].astype(jnp.float32), compute_uv=False)
    assert float(s[4]) < 1e-3 * float(s[0])


def test_segnext_forward_shapes():
    model = _tiny_segnext()
    variables = {"params": model.init(KEY), "state": model.init_state()}
    x = jax.random.normal(KEY, (2, 64, 64, 3))
    y, _, _ = model.apply(variables["params"], x, state=variables["state"],
                          training=False)
    assert y.shape == (2, 8, 8, 7)  # 1/8 resolution logits
    assert bool(jnp.all(jnp.isfinite(y)))
    up = upsample_logits(y, (64, 64))
    assert up.shape == (2, 64, 64, 7)


def test_segnext_train_step_differentiable():
    model = _tiny_segnext()
    variables = {"params": model.init(KEY), "state": model.init_state()}
    x = jax.random.normal(KEY, (2, 32, 32, 3))
    labels = jnp.zeros((2, 4, 4), jnp.int32)

    def loss_fn(params):
        y, _, _ = model.apply(params, x, state=variables["state"],
                              training=True, rng=KEY)
        logp = jax.nn.log_softmax(y.astype(jnp.float32))
        onehot = jax.nn.one_hot(labels, y.shape[-1])
        return -jnp.mean(jnp.sum(logp * onehot, axis=-1))

    loss, grads = jax.value_and_grad(loss_fn)(variables["params"])
    assert jnp.isfinite(loss)
    gnorm = sum(float(jnp.sum(jnp.abs(g)))
                for g in jax.tree_util.tree_leaves(grads))
    assert gnorm > 0  # the one-step NMF gradient path is live


def test_segnext_mscarep_pipeline():
    """register -> MscaRep d1+fix -> forward: the switchable machinery covers
    the segmentation model unchanged."""
    from convnet_approximater_tpu.core import MscaRep

    model = _tiny_segnext()
    variables = {"params": model.init(KEY), "state": model.init_state()}
    app = MscaRep(decomp=1, fix=True)
    from bench import run_pipeline  # the same driver bench/demo scripts use

    model, variables = run_pipeline(model, variables, app, [])
    assert model.length_switchable == sum((1, 1, 2, 1))  # one MSCA per block
    x = jax.random.normal(KEY, (1, 32, 32, 3))
    y, _, _ = model.apply(variables["params"], x, state=variables["state"],
                          training=False)
    assert y.shape == (1, 4, 4, 7)
    assert bool(jnp.all(jnp.isfinite(y)))


# -- round 3: loss / metric / fine-tune path (VERDICT r2 #6) ---------------

def test_seg_cross_entropy_ignore_and_resize():
    from convnet_approximater_tpu.segmentation import seg_cross_entropy

    # perfect logits at 1/2 resolution -> upsampled -> tiny loss
    labels = jnp.array([[[0, 0, 1, 1],
                         [0, 0, 1, 1],
                         [2, 2, 3, 3],
                         [2, 2, 3, 3]]], jnp.int32)
    small = jax.nn.one_hot(labels[:, ::2, ::2], 4) * 50.0  # (1, 2, 2, 4)
    loss = seg_cross_entropy(small, labels)
    assert float(loss) < 1e-3
    # a wrong pixel raises the loss; marking it ignore removes the penalty
    bad = labels.at[0, 0, 0].set(3)
    assert float(seg_cross_entropy(small, bad)) > 1.0
    ign = bad.at[0, 0, 0].set(255)
    assert float(seg_cross_entropy(small, ign, ignore_index=255)) < 1e-3


def test_confusion_matrix_and_miou():
    from convnet_approximater_tpu.segmentation import (
        confusion_matrix, iou_from_confusion)

    label = jnp.array([[0, 0, 1, 1, 255]], jnp.int32)
    pred = jnp.array([[0, 1, 1, 1, 0]], jnp.int32)
    cm = np.asarray(confusion_matrix(pred, label, num_classes=2,
                                     ignore_index=255))
    np.testing.assert_array_equal(cm, [[1, 1], [0, 2]])  # ignore dropped
    stats = iou_from_confusion(cm)
    # class0: tp=1 fp=0 fn=1 -> 0.5 ; class1: tp=2 fp=1 fn=0 -> 2/3
    np.testing.assert_allclose(stats["iou"], [0.5, 2 / 3], rtol=1e-6)
    np.testing.assert_allclose(stats["miou"], (0.5 + 2 / 3) / 2, rtol=1e-6)
    np.testing.assert_allclose(stats["aacc"], 3 / 4, rtol=1e-6)


def test_synthetic_seg_learnable_and_deterministic():
    from convnet_approximater_tpu.segmentation import SyntheticSeg

    a = SyntheticSeg(8, (16, 16), num_classes=5, seed=3)
    b = SyntheticSeg(8, (16, 16), num_classes=5, seed=3)
    np.testing.assert_array_equal(a.images, b.images)
    np.testing.assert_array_equal(a.labels, b.labels)
    assert a.images.shape == (8, 16, 16, 3) and a.labels.shape == (8, 16, 16)
    assert a.labels.max() < 5
    bord = SyntheticSeg(2, (16, 16), num_classes=5, grid=4, ignore_border=True)
    assert (bord.labels == 255).any()


def test_seg_finetune_end_to_end(tmp_path):
    """SegNeXt -> MscaRep -> SegL2Reconstruct recovery through the Runner:
    the existing hook machinery covers dense prediction (mIoU eval, per-pixel
    CE, masked freeze) unchanged."""
    from convnet_approximater_tpu.runner import Runner
    from convnet_approximater_tpu.utils import init_cfg, update_cfg

    cfg_text = """
model = dict(type="SegNeXt", num_channels=(8, 12, 16, 20),
             num_blocks=(1, 1, 1, 1), exp_ratios=(2, 2, 2, 2),
             num_classes=5, ham_channels=16, ham_rank=4, ham_iters=2)
filters = []
app = dict(type="MscaRep", decomp=1, fix=True)
hooks = [dict(type="SegL2Reconstruct", priority=50, asym=True,
    l2_weight=1.0, cls_weight=0.5,
    dataset_args=dict(batch_size=8),
    data_config=dict(image_size=(32, 32)),
    optim_args=dict(opt="adamw", lr=1e-3, weight_decay=0.01),
    sche_args=dict(epochs=1),
    other_args=dict(num_classes=5, max_steps_per_epoch=3, max_eval_batches=2,
                    log_interval=1, use_mesh=False),
)]
"""
    p = tmp_path / "seg.py"
    p.write_text(cfg_text)
    init_cfg(str(p))
    update_cfg(work_dir=str(tmp_path / "work"), config_name="seg", seed=0)
    runner = Runner(skip_post=True)
    runner.run()
    hook = [h for h in runner.hooks if h.name == "SegL2Reconstruct"][0]
    assert hook.result["best_metric"] is not None
    assert 0.0 <= hook.result["best_metric"] <= 1.0  # mIoU range
    import os
    assert os.path.exists(str(tmp_path / "work" / "summary.csv"))
