"""Classification validation helper (reference ``classification/validate.py:30-194``).

One jitted eval step over a (optionally mesh-sharded) batch computes loss +
top-1/top-5 sums; host-side meters aggregate.  Under a multi-device mesh the
batch axis is sharded and the reductions inside jit are global — replacing
the reference's ``DataParallel`` + all_reduce machinery.
"""

from __future__ import annotations

import time
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from convnet_approximater_tpu.data import (
    IMAGENET_DEFAULT_MEAN,
    IMAGENET_DEFAULT_STD,
    Loader,
    Synthetic,
    build_dataset,
)
from convnet_approximater_tpu.parallel import batch_sharding, make_mesh
from convnet_approximater_tpu.utils.config import Config
from convnet_approximater_tpu.utils.logger import get_logger

_default_eval_cfg = dict(
    batch_size=128,
    log_freq=50,
    input_size=(224, 224, 3),
    num_classes=1000,
    mean=IMAGENET_DEFAULT_MEAN,
    std=IMAGENET_DEFAULT_STD,
    dataset=None,  # DATASET registry cfg; None -> synthetic smoke data
    split="validation",
    num_batches=None,  # cap for smoke runs
    use_mesh=False,
)


def serving_dtype(params) -> jnp.dtype:
    """Input dtype for a serving surface, derived from the *weight* leaves.

    Serving surfaces hold bf16 weights; inputs must match (mixed conv operand
    dtypes are a trace error).  The first-floating-leaf heuristic breaks on
    mixed trees (an int8-quantized surface keeps f32 scales next to bf16
    weights), so prefer multi-dim floating leaves — conv/linear kernels —
    over 1-D scales/biases (ADVICE r2)."""
    leaves = jax.tree_util.tree_leaves(params)
    float_leaves = [l for l in leaves if jnp.issubdtype(l.dtype, jnp.floating)]
    for l in float_leaves:
        if l.ndim >= 2:
            return l.dtype
    return float_leaves[0].dtype if float_leaves else jnp.float32


class AverageMeter:
    def __init__(self):
        self.val = 0.0
        self.sum = 0.0
        self.count = 0

    def update(self, val, n=1):
        self.val = val
        self.sum += val * n
        self.count += n

    @property
    def avg(self):
        return self.sum / max(self.count, 1)


def accuracy_sums(logits, labels, topk=(1, 5)):
    """Return per-batch correct counts for each k."""
    maxk = max(topk)
    top = jnp.argsort(-logits, axis=-1)[:, :maxk]
    correct = top == labels[:, None]
    return [jnp.sum(jnp.any(correct[:, :k], axis=1)) for k in topk]


class ValidateHelper:
    def __init__(self, runner_or_model, eval_cfg, variables: Optional[dict] = None):
        self.cfg = Config()
        self.cfg.update(_default_eval_cfg)
        self.cfg.update(eval_cfg or {})
        # accept either a runner (reads live model/variables at validate time)
        # or an explicit (model, variables) pair
        self._runner = None
        if hasattr(runner_or_model, "variables") and hasattr(runner_or_model, "model"):
            self._runner = runner_or_model
        else:
            self._model = runner_or_model
            self._variables = variables

    def _resolve(self):
        if self._runner is not None:
            return self._runner.model, self._runner.variables
        return self._model, self._variables

    def _make_loader(self, sharding):
        size = tuple(self.cfg.input_size[:2])
        if self.cfg.dataset:
            ds = build_dataset(dict(self.cfg.dataset), split=self.cfg.split)
        else:
            ds = Synthetic(
                num_samples=self.cfg.batch_size * 4,
                image_size=size + (3,),
                num_classes=self.cfg.num_classes,
                split="validation",
            )
        return Loader(
            ds,
            self.cfg.batch_size,
            shuffle=False,
            drop_last=True,
            mean=self.cfg.mean,
            std=self.cfg.std,
            image_size=size,
            sharding=sharding,
        )

    def validate(self) -> dict:
        logger = get_logger()
        model, variables = self._resolve()
        params, state = variables["params"], variables.get("state", {})

        sharding = None
        if self.cfg.use_mesh and len(jax.devices()) > 1:
            mesh = make_mesh()
            sharding = batch_sharding(mesh)

        param_dt = serving_dtype(params)

        @jax.jit
        def eval_step(params, state, images, labels):
            images = images.astype(param_dt)
            logits, _, _ = model.apply(params, images, state=state, training=False)
            one_hot = jax.nn.one_hot(labels, logits.shape[-1])
            loss = -jnp.mean(jnp.sum(jax.nn.log_softmax(logits) * one_hot, axis=-1))
            c1, c5 = accuracy_sums(logits, labels)
            return loss, c1, c5

        loader = self._make_loader(sharding)
        loss_m, top1_m, top5_m, time_m = (AverageMeter() for _ in range(4))
        end = time.time()
        n_batches = len(loader)
        if self.cfg.num_batches:
            n_batches = min(n_batches, self.cfg.num_batches)
        for i, (images, labels) in enumerate(loader):
            if i >= n_batches:
                break
            loss, c1, c5 = jax.block_until_ready(eval_step(params, state, images, labels))
            bs = images.shape[0]
            loss_m.update(float(loss), bs)
            top1_m.update(float(c1) / bs * 100.0, bs)
            top5_m.update(float(c5) / bs * 100.0, bs)
            time_m.update(time.time() - end)
            end = time.time()
            if i % self.cfg.log_freq == 0 or i == n_batches - 1:
                logger.info(
                    f"Test: [{i:>4d}/{n_batches}]  "
                    f"Time: {time_m.val:.3f} ({time_m.avg:.3f})  "
                    f"Loss: {loss_m.val:>7.4f} ({loss_m.avg:>6.4f})  "
                    f"Acc@1: {top1_m.val:>7.4f} ({top1_m.avg:>7.4f})  "
                    f"Acc@5: {top5_m.val:>7.4f} ({top5_m.avg:>7.4f})"
                )
        from convnet_approximater_tpu.hooks.model_analysis import count_params

        return dict(
            loss=loss_m.avg,
            top1=top1_m.avg,
            top5=top5_m.avg,
            param_count=count_params(params),
            img_size=self.cfg.input_size[0],
        )
