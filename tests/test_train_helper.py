"""TrainHelper: from-scratch CE training smoke (the reference's TrainHelper
was dead code; ours must actually train)."""

import jax
import numpy as np

import tests.test_finetune  # registers TinyNet
from convnet_approximater_tpu.classification import TrainHelper
from convnet_approximater_tpu.models import build_model


def test_train_helper_learns(tmp_path):
    model = build_model(dict(type="TinyNet", num_classes=4))
    variables = {"params": model.init(jax.random.key(0)), "state": model.init_state()}
    helper = TrainHelper(model, variables, dict(
        batch_size=16, image_size=(16, 16), num_classes=4, epochs=3,
        lr=5e-3, sched=None, use_mesh=False, log_interval=100,
        max_steps_per_epoch=6, max_eval_batches=2,
        work_dir=str(tmp_path / "train"),
    ))
    result = helper.train()
    assert result["best_metric"] is not None
    csv = open(str(tmp_path / "train" / "summary.csv")).read().strip().split("\n")
    losses = [float(r.split(",")[1]) for r in csv[1:]]
    assert losses[-1] < losses[0]  # CE decreases on the fixed synthetic set


def _mk_helper(tmp_path, name, **over):
    model = build_model(dict(type="TinyNet", num_classes=4))
    variables = {"params": model.init(jax.random.key(0)), "state": model.init_state()}
    cfg = dict(batch_size=16, image_size=(16, 16), num_classes=4, epochs=1,
               lr=5e-3, sched=None, use_mesh=False, log_interval=100,
               max_steps_per_epoch=2, max_eval_batches=1,
               work_dir=str(tmp_path / name))
    cfg.update(over)
    return TrainHelper(model, variables, cfg)


def test_train_helper_ema(tmp_path):
    """ema_decay~0 tracks the live params exactly; ema_decay~1 stays at the
    init; the checkpoint carries the 'ema' collection."""
    import os

    h_fast = _mk_helper(tmp_path, "fast", ema_decay=1e-12)
    out = h_fast.train()
    for e, p in zip(jax.tree_util.tree_leaves(out["ema"]["params"]),
                    jax.tree_util.tree_leaves(h_fast.variables["params"])):
        np.testing.assert_allclose(np.asarray(e), np.asarray(p), rtol=1e-6, atol=1e-7)

    h_slow = _mk_helper(tmp_path, "slow", ema_decay=0.9999)
    init = jax.tree_util.tree_map(np.asarray, h_slow.variables["params"])
    out = h_slow.train()
    for e, p0, p1 in zip(jax.tree_util.tree_leaves(out["ema"]["params"]),
                         jax.tree_util.tree_leaves(init),
                         jax.tree_util.tree_leaves(h_slow.variables["params"])):
        # EMA hugs the init far more tightly than the trained weights do
        d_init = float(np.max(np.abs(np.asarray(e) - p0)))
        d_trained = float(np.max(np.abs(np.asarray(p1) - p0)))
        assert d_init <= 0.01 * d_trained + 1e-12

    from convnet_approximater_tpu.utils.serialize import load_ckpt
    ckpt = load_ckpt(os.path.join(str(tmp_path / "slow"), "last.ckpt.npz"))
    assert "ema" in ckpt and "params" in ckpt["ema"]


def test_train_helper_grad_accum_matches_full_batch(tmp_path):
    """grad_accum=2 at batch 8 lands on exactly the params of one batch-16
    step (the two micro-batches are the halves of the same shuffled prefix,
    and MultiSteps averages their grads)."""
    h_full = _mk_helper(tmp_path, "full", batch_size=16, max_steps_per_epoch=1)
    h_full.train()
    h_acc = _mk_helper(tmp_path, "acc", batch_size=8, grad_accum=2,
                       max_steps_per_epoch=2)
    h_acc.train()
    for a, b in zip(jax.tree_util.tree_leaves(h_full.variables["params"]),
                    jax.tree_util.tree_leaves(h_acc.variables["params"])):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=2e-5, atol=1e-6)


def test_train_helper_pipeline_parallel_matches_dp(tmp_path):
    """pipeline_parallel=4 (GPipe over the scanned 4-block stage, M=1)
    trains to the same params as the pure-DP run — deterministic setup
    (no drop-path/dropout), same data order."""
    from convnet_approximater_tpu.models import MSCAN_Classifier

    def run(name, **over):
        model = MSCAN_Classifier(
            num_channels=(8, 12, 16, 20), num_blocks=(1, 1, 4, 1),
            exp_ratios=(2, 2, 2, 2), num_classes=4)
        variables = {"params": model.init(jax.random.key(0)),
                     "state": model.init_state()}
        # sgd: adamw's 1/sqrt(v) at step 1-2 amplifies fp-level grad noise
        # into ~1e-2 param drift, swamping the parity being tested
        cfg = dict(batch_size=16, image_size=(32, 32), num_classes=4,
                   epochs=1, lr=5e-3, sched=None, log_interval=100,
                   opt="sgd", momentum=0.0,
                   max_steps_per_epoch=2, max_eval_batches=1,
                   work_dir=str(tmp_path / name))
        cfg.update(over)
        helper = TrainHelper(model, variables, cfg)
        helper.train()
        return model, helper.variables

    m_dp, v_dp = run("dp")
    m_pp, v_pp = run("pp", pipeline_parallel=4, pipeline_microbatches=1)
    assert m_pp.backbone._pipeline is not None  # the engine engaged
    for a, b in zip(jax.tree_util.tree_leaves(v_dp["params"]),
                    jax.tree_util.tree_leaves(v_pp["params"])):
        np.testing.assert_allclose(np.asarray(b), np.asarray(a),
                                   rtol=5e-4, atol=5e-5)


def test_mixup_lam1_is_identity():
    """mixup with lambda=1 reduces exactly to the plain step's inputs
    (VERDICT r3 #6 parity requirement)."""
    import jax.numpy as jnp

    from convnet_approximater_tpu.data.mixup import mixup_batch

    rng = jax.random.key(0)
    x = jax.random.normal(jax.random.key(1), (8, 6, 6, 3))
    t = jax.nn.one_hot(jnp.arange(8) % 4, 4)
    xm, tm = mixup_batch(rng, x, t, lam=1.0)
    np.testing.assert_array_equal(np.asarray(xm), np.asarray(x))
    np.testing.assert_array_equal(np.asarray(tm), np.asarray(t))


def test_mixup_convex_combination():
    import jax.numpy as jnp

    from convnet_approximater_tpu.data.mixup import mixup_batch

    rng = jax.random.key(0)
    x = jnp.ones((4, 2, 2, 1))
    x = x * jnp.arange(4, dtype=jnp.float32).reshape(4, 1, 1, 1)
    t = jax.nn.one_hot(jnp.arange(4), 4)
    xm, tm = mixup_batch(rng, x, t, lam=0.25)
    perm = jax.random.permutation(rng, 4)
    np.testing.assert_allclose(
        np.asarray(xm), np.asarray(0.25 * x + 0.75 * x[perm]), atol=1e-6)
    # target rows stay distributions
    np.testing.assert_allclose(np.asarray(tm.sum(-1)), np.ones(4), atol=1e-6)


def test_cutmix_target_matches_actual_area():
    """The CutMix target weight equals the EXACT kept-pixel fraction, even
    when the box clips the image border (timm's corrected-lambda)."""
    import jax.numpy as jnp

    from convnet_approximater_tpu.data.mixup import cutmix_batch

    b, h, w = 6, 16, 16
    x = jax.random.normal(jax.random.key(9), (b, h, w, 1))  # a.s. distinct
    t = jax.nn.one_hot(jnp.arange(b), b)
    for seed in range(5):
        rng = jax.random.key(seed)
        xm, tm = cutmix_batch(rng, x, t, lam=0.4)
        perm = np.asarray(
            jax.random.permutation(jax.random.split(rng, 3)[0], b))
        # pasted fraction measured from the pixels of any sample whose
        # partner is a different sample (random values differ everywhere)
        moved = [i for i in range(b) if perm[i] != i]
        assert moved, "degenerate permutation"
        i = moved[0]
        pasted = float(jnp.mean((jnp.abs(xm[i] - x[i]) > 0).astype(jnp.float32)))
        lam_act = 1.0 - pasted
        expect = lam_act * np.asarray(t) + (1 - lam_act) * np.asarray(t)[perm]
        np.testing.assert_allclose(np.asarray(tm), expect, atol=1e-6)


def test_mixup_cutmix_off_is_passthrough():
    from convnet_approximater_tpu.data.mixup import mixup_cutmix

    x = jax.random.normal(jax.random.key(0), (4, 4, 4, 3))
    t = jax.nn.one_hot(np.arange(4) % 2, 2)
    xm, tm = mixup_cutmix(jax.random.key(1), x, t)
    assert xm is x and tm is t


def test_clip_grad_global_norm():
    """make_optimizer(clip_grad=1.0, sgd lr=1): update global-norm is
    bounded by the clip threshold (reference train.py:91-99 parity)."""
    import jax.numpy as jnp
    import optax

    from convnet_approximater_tpu.hooks.finetune import make_optimizer
    from convnet_approximater_tpu.utils.config import Config

    tx, _ = make_optimizer(
        Config(dict(opt="sgd", lr=1.0, momentum=0.0, clip_grad=1.0)),
        Config(dict(epochs=1, sched=None)), steps_per_epoch=1)
    params = {"w": jnp.zeros((3,)), "b": jnp.zeros(())}
    grads = {"w": jnp.array([30.0, 40.0, 0.0]), "b": jnp.array(120.0)}
    updates, _ = tx.update(grads, tx.init(params), params)
    gn = float(optax.global_norm(updates))
    np.testing.assert_allclose(gn, 1.0, rtol=1e-5)  # clipped to the bound
    # direction preserved: every component scaled by the same factor
    scale = float(updates["b"]) / 120.0
    np.testing.assert_allclose(np.asarray(updates["w"]),
                               np.asarray(grads["w"]) * scale, rtol=1e-5)


def test_train_helper_mixup_clip_smoke(tmp_path):
    """TrainHelper with mixup+cutmix+clip on: trains, finite losses."""
    helper = _mk_helper(tmp_path, "mixup", mixup=0.8, cutmix=1.0,
                        clip_grad=1.0, epochs=2, max_steps_per_epoch=4)
    result = helper.train()
    assert result["best_metric"] is not None
    csv = open(str(tmp_path / "mixup" / "summary.csv")).read().strip().split("\n")
    losses = [float(r.split(",")[1]) for r in csv[1:]]
    assert all(np.isfinite(losses))
