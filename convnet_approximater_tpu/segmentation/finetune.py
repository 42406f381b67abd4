"""Segmentation fine-tune hook: L2 feature reconstruction + per-pixel CE.

``SegL2Reconstruct`` plugs the dense-prediction task into the existing
``L2Reconstruct`` machinery (hooks/finetune.py) — the approximation/L2
recovery story is task-agnostic (taps on substituted modules), only the
task loss and eval metric change:

* CE: :func:`~.losses.seg_cross_entropy` (resize-in-loss, ignore_index)
* eval: streaming confusion matrix -> mIoU / aAcc (mmseg ``mean_iou``)
* default smoke data: :class:`~.data.SyntheticSeg` dense-label grids

Use with ``model = dict(type="SegNeXt", ...)`` and the usual
``app``/``filters``; everything else (masked AdamW freeze, teacher modes,
mesh sharding, exact resume, best-k checkpoints) is inherited.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from convnet_approximater_tpu.hooks import HOOK
from convnet_approximater_tpu.hooks.finetune import L2Reconstruct
from convnet_approximater_tpu.classification.validate import AverageMeter
from convnet_approximater_tpu.nn.module import Ctx
from convnet_approximater_tpu.utils.logger import get_logger

from .data import SyntheticSeg
from .ham_head import upsample_logits
from .losses import seg_cross_entropy
from .metrics import confusion_matrix, iou_from_confusion


@HOOK.register_module()
class SegL2Reconstruct(L2Reconstruct):
    def __init__(self, runner, priority, ignore_index: int = 255,
                 **kwargs):
        other = dict(kwargs.get("other_args") or {})
        other.setdefault("eval_metric", "miou")
        kwargs["other_args"] = other
        super().__init__(runner, priority, **kwargs)
        self.ignore_index = ignore_index

    # -- task plug points -------------------------------------------------
    def _ce_fn(self):
        ignore = self.ignore_index

        def ce(logits, labels):
            return seg_cross_entropy(logits, labels, ignore_index=ignore)

        return ce

    def _default_datasets(self, image_size, num_classes):
        return (SyntheticSeg(128, image_size, num_classes, split="train"),
                SyntheticSeg(64, image_size, num_classes, split="validation"))

    # -- eval: confusion-matrix streaming --------------------------------
    def _make_eval_step(self):
        model = self.runner.model
        num_classes = self.other_args.num_classes
        ignore = self.ignore_index

        @jax.jit
        def eval_step(params, state, images, labels):
            ctx = Ctx(training=False, state=state)
            logits = model(params, images, ctx)
            loss = seg_cross_entropy(logits, labels, ignore_index=ignore)
            full = upsample_logits(logits, labels.shape[1:3])
            pred = jnp.argmax(full, axis=-1)
            cm = confusion_matrix(pred, labels, num_classes, ignore)
            return loss, cm

        return eval_step

    def _validate(self, loader, eval_step):
        runner = self.runner
        losses_m = AverageMeter()
        cm_total = None
        max_batches = self.other_args.max_eval_batches
        for i, (images, labels) in enumerate(loader):
            if max_batches and i >= max_batches:
                break
            loss, cm = eval_step(
                runner.variables["params"], runner.variables["state"],
                images, labels,
            )
            losses_m.update(float(loss), images.shape[0])
            cm_total = cm if cm_total is None else cm_total + cm
        stats = iou_from_confusion(cm_total) if cm_total is not None else {}
        metrics = dict(loss=losses_m.avg, miou=stats.get("miou", 0.0),
                       aacc=stats.get("aacc", 0.0))
        get_logger().info(f"Eval: loss {metrics['loss']:.4f}  "
                          f"mIoU {metrics['miou']:.4f}  "
                          f"aAcc {metrics['aacc']:.4f}")
        return metrics
