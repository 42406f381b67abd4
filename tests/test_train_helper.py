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
