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
