"""Preemption handling: SIGTERM -> flag -> step-boundary checkpoint-and-exit
(utils/preempt.py), wired into L2Reconstruct and TrainHelper."""

import os
import signal
import time

import jax
import numpy as np

from convnet_approximater_tpu.utils.preempt import Preempted, PreemptionGuard
from convnet_approximater_tpu.utils.serialize import load_ckpt
from tests.test_finetune import TINY_MODEL


def test_guard_sets_flag_and_restores_handler():
    prev = signal.getsignal(signal.SIGTERM)
    with PreemptionGuard() as g:
        assert not g.triggered
        os.kill(os.getpid(), signal.SIGTERM)
        for _ in range(100):  # handler runs at the next bytecode boundary
            if g.triggered:
                break
            time.sleep(0.01)
        assert g.triggered
    assert signal.getsignal(signal.SIGTERM) is prev


class FakeGuard:
    """Deterministic stand-in: 'triggered' flips True after k reads, so the
    preemption lands at an exact step without real-signal timing races."""

    def __init__(self, k):
        self.k = k
        self.reads = 0

    def __enter__(self):
        return self

    def __exit__(self, *exc):
        return False

    @property
    def triggered(self):
        self.reads += 1
        return self.reads > self.k


def _run_ft(tmp_path, name, epochs, extra=""):
    from convnet_approximater_tpu.runner import Runner
    from convnet_approximater_tpu.utils import init_cfg, update_cfg

    body = TINY_MODEL + f"""
hooks = [dict(type="L2Reconstruct", priority=50, asym=True, l2_weight=1.0,
    cls_weight=0.1,
    dataset_args=dict(batch_size=16),
    data_config=dict(image_size=(16, 16)),
    optim_args=dict(opt="adamw", lr=5e-3, weight_decay=0.01),
    sche_args=dict(epochs={epochs}),
    other_args=dict(num_classes=4, max_steps_per_epoch=3, max_eval_batches=1,
                    log_interval=100, use_mesh=False{extra}),
)]
"""
    p = tmp_path / f"{name}.py"
    p.write_text(body)
    init_cfg(str(p))
    update_cfg(work_dir=str(tmp_path / name), config_name=name, seed=0)
    runner = Runner(skip_post=True)
    runner.run()
    return runner


def test_finetune_preempt_saves_resumable_state(tmp_path, monkeypatch):
    """A preemption mid-epoch-1 saves the full train state with
    meta.epoch=0 (last completed), and a resume run redoes epoch 1 onward."""
    import convnet_approximater_tpu.hooks.finetune as ft

    # 3 steps/epoch: 4 triggered-reads -> preempt at step 1 of epoch 1
    monkeypatch.setattr(ft, "PreemptionGuard", lambda: FakeGuard(4))
    runner = _run_ft(tmp_path, "pre", epochs=3)
    hook = [h for h in runner.hooks if h.name == "L2Reconstruct"][0]
    assert hook.result["preempted"] is True

    ckpt_path = str(tmp_path / "pre" / "last.ckpt.npz")
    ckpt = load_ckpt(ckpt_path)
    assert int(ckpt["meta"]["epoch"]) == 0
    assert "opt" in ckpt  # moments saved alongside the weights

    monkeypatch.setattr(ft, "PreemptionGuard", PreemptionGuard)
    runner2 = _run_ft(tmp_path, "res", epochs=3, extra=f', resume=r"{ckpt_path}"')
    hook2 = [h for h in runner2.hooks if h.name == "L2Reconstruct"][0]
    assert hook2.result["preempted"] is False
    assert hook2.result["best_metric"] is not None


def test_train_helper_preempt_and_resume(tmp_path, monkeypatch):
    import convnet_approximater_tpu.classification.train as tr
    from convnet_approximater_tpu.classification import TrainHelper
    from convnet_approximater_tpu.models import build_model

    monkeypatch.setattr(tr, "PreemptionGuard", lambda: FakeGuard(4))
    model = build_model(dict(type="TinyNet", num_classes=4))
    variables = {"params": model.init(jax.random.key(0)),
                 "state": model.init_state()}
    cfg = dict(batch_size=16, image_size=(16, 16), num_classes=4, epochs=3,
               lr=5e-3, sched=None, use_mesh=False, log_interval=100,
               max_steps_per_epoch=3, max_eval_batches=1, ema_decay=0.99,
               work_dir=str(tmp_path / "w"))
    TrainHelper(model, variables, cfg).train()

    ckpt_path = str(tmp_path / "w" / "last.ckpt.npz")
    ckpt = load_ckpt(ckpt_path)
    assert int(ckpt["meta"]["epoch"]) == 0
    assert "opt" in ckpt and "ema" in ckpt

    monkeypatch.setattr(tr, "PreemptionGuard", PreemptionGuard)
    model2 = build_model(dict(type="TinyNet", num_classes=4))
    v2 = {"params": model2.init(jax.random.key(1)), "state": model2.init_state()}
    cfg2 = dict(cfg, resume=ckpt_path, work_dir=str(tmp_path / "w2"))
    out = TrainHelper(model2, v2, cfg2).train()
    assert out["best_metric"] is not None
