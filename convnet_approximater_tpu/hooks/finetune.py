"""L2Reconstruct: the fine-tuning engine — per-layer L2 reconstruction +
cross-entropy, as one jitted SPMD train step over the device mesh.

Rebuild of ``/root/reference/src/approx/hooks/finetune.py:95-420``, re-thought
for XLA:

* The reference's forward hooks + ``Substitution.cache`` plumbing (caching
  teacher outputs, computing per-substitution L2 norms) become ``Ctx`` taps:
  the substitution outputs are just intermediates captured inside the single
  traced step.
* **asym** mode keeps a frozen teacher param tree (the re-built "original"
  model, reference ``finetune.py:134-149``) and runs teacher + student
  forwards in the same jit — no separate no-grad pass.
* **sym** mode replaces the switch_old/switch_new double-pass trick
  (``finetune.py:300-312``) with ``ctx.force_branch``: the same param tree is
  applied twice in one trace, once forced down the 'old' branch under
  ``stop_gradient``.
* DDP/SyncBN/NCCL disappear: the step jits over a ``Mesh`` with the batch
  sharded on the data axis, so gradient sums, metric means, and BN batch
  statistics are global reductions scheduled by XLA over ICI
  (``distribute_bn`` and ``reduce_tensor`` have no code to replace them).
* ``freeze_except`` / ``epoch_behavior`` become a {0,1} mask pytree passed to
  the step; masked updates keep one optimizer state across the schedule with
  no recompilation (masks are data, not structure).
"""

from __future__ import annotations

import os
import time
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
import optax

from convnet_approximater_tpu.classification import AverageMeter, accuracy_sums
from convnet_approximater_tpu.data import Loader, Synthetic, build_dataset
from convnet_approximater_tpu.models import build_model
from convnet_approximater_tpu.nn.module import Ctx, _merge_state, _stable_fold
from convnet_approximater_tpu.parallel import (
    batch_sharding,
    is_main_process,
    make_mesh,
    replicate,
)
from convnet_approximater_tpu.utils import (
    cast_floating,
    get_logger,
    load_ckpt,
    load_into,
    save_model,
    tree_get,
    tree_set,
)
from convnet_approximater_tpu.utils.config import Config
from convnet_approximater_tpu.utils.preempt import Preempted, PreemptionGuard

from .hook import HOOK, Hook

_default_dataset_args = dict(
    dataset=None,  # DATASET registry cfg; None -> synthetic smoke data
    batch_size=64,  # GLOBAL batch (sharded over the mesh's data axis)
)

_default_data_config = dict(
    image_size=(224, 224),
    mean=(0.485, 0.456, 0.406),
    std=(0.229, 0.224, 0.225),
    # train-loader augmentation (data/loader.py::augment_batch keys:
    # hflip, crop_pad, rrc_scale).  {} = no_aug — the reference's L2 phase
    # parity default (timm create_loader with no_aug=True,
    # ref hooks/finetune.py:165-186); set for CE recovery on real data.
    aug=None,
)

_default_optim_args = dict(opt="adamw", lr=1e-3, momentum=0.9, weight_decay=0.05, eps=1e-8)

_default_sche_args = dict(epochs=20, sched=None, min_lr=1e-6, warmup_epochs=0, decay_rate=0.1)

_default_other_args = dict(
    log_interval=50,
    resume="",
    start_epoch=None,
    eval_metric="top1",
    checkpoint_hist=10,
    num_classes=10,
    max_steps_per_epoch=None,  # cap for smoke tests
    max_eval_batches=None,
    use_mesh=True,
    # tensor parallelism (parallel/tp.py): size of the mesh's model axis and
    # the sharding rule set ("mscan" preset, or explicit (suffix, axes) list)
    model_parallel=1,
    tp_rules=None,
    amp=False,  # bf16 compute / f32 master params (measured 1.35-1.5x on TPU)
    # "npz" (host-gathered flat file) or "sharded" (orbax/TensorStore: each
    # device's shards written in parallel, async commit — utils/sharded_ckpt)
    ckpt_backend="npz",
)


def _combine(default: dict, new: dict) -> Config:
    cfg = Config()
    cfg.update(default)
    cfg.update(new or {})
    return cfg


def make_optimizer(optim_args: Config, sche_args: Config, steps_per_epoch: int):
    """optax optimizer + LR schedule — replaces timm's
    ``create_optimizer_v2``/``create_scheduler``."""
    epochs = sche_args.epochs
    base_lr = optim_args.lr
    if sche_args.sched in ("cosine", "cosine_annealing"):
        warmup = int(sche_args.warmup_epochs * steps_per_epoch)
        lr = optax.warmup_cosine_decay_schedule(
            0.0, base_lr, warmup, epochs * steps_per_epoch, sche_args.min_lr
        )
    elif sche_args.sched == "step":
        lr = optax.exponential_decay(
            base_lr, steps_per_epoch, sche_args.decay_rate, staircase=True
        )
    else:
        lr = base_lr
    name = optim_args.opt
    if name == "adamw":
        tx = optax.adamw(lr, eps=optim_args.eps, weight_decay=optim_args.weight_decay)
    elif name == "adam":
        tx = optax.adam(lr, eps=optim_args.eps)
    elif name in ("sgd", "momentum"):
        tx = optax.sgd(lr, momentum=optim_args.momentum)
    else:
        raise ValueError(f"unknown optimizer {name}")
    # gradient clipping (reference CE loop carried timm's clip_grad/clip_mode,
    # /root/reference/src/approx/classification/train.py:91-99) — here an
    # optax pre-transform, so it composes with MultiSteps/masking unchanged
    clip = float(optim_args.clip_grad or 0.0)
    if clip > 0:
        mode = optim_args.clip_mode or "norm"
        if mode == "norm":
            pre = optax.clip_by_global_norm(clip)
        elif mode == "value":
            pre = optax.clip(clip)
        elif mode == "agc":
            pre = optax.adaptive_grad_clip(clip)
        else:
            raise ValueError(f"unknown clip_mode {mode}")
        tx = optax.chain(pre, tx)
    return tx, lr


def masked_update(tx, grads, opt_state, params, mask):
    """One optimizer step under a {0,1} freeze mask with torch
    ``requires_grad=False`` semantics (ref ``finetune.py:239-247`` +
    ``switchable.py:63-88``): grads are zeroed BEFORE ``tx.update`` so AdamW
    moments for frozen params decay instead of accumulating live gradients
    (unfreezing must not apply a stale-momentum kick), and the updates are
    masked too so the decoupled weight-decay term cannot move frozen params."""
    grads = jax.tree_util.tree_map(lambda g, m: g * m, grads, mask)
    updates, opt_state = tx.update(grads, opt_state, params)
    updates = jax.tree_util.tree_map(lambda u, m: u * m, updates, mask)
    return optax.apply_updates(params, updates), opt_state


def opt_state_to_tree(opt_state, to_host: bool = True) -> dict:
    """Flatten an optax state (arbitrary NamedTuple nesting) into a
    serializable dict keyed by flattening order.  Restored against a freshly
    ``tx.init``-ed state of the same structure (:func:`opt_state_from_tree`)
    — the same trick timm's ``resume_checkpoint`` plays with
    ``optimizer.state_dict()`` (ref ``hooks/finetune.py:190-203``).
    ``to_host=False`` keeps device arrays (sharded-checkpoint path: orbax
    writes the shards directly, no gather)."""
    leaves = jax.tree_util.tree_leaves(opt_state)
    if not to_host:
        return {f"{i:05d}": x for i, x in enumerate(leaves)}
    return {f"{i:05d}": np.asarray(x) for i, x in enumerate(leaves)}


def opt_state_from_tree(tree: dict, opt_state):
    """Inverse of :func:`opt_state_to_tree`; returns the restored state, or
    ``None`` (caller keeps the fresh state) on a structure mismatch."""
    leaves, treedef = jax.tree_util.tree_flatten(opt_state)
    if sorted(tree) != [f"{i:05d}" for i in range(len(leaves))]:
        return None
    saved = [tree[f"{i:05d}"] for i in range(len(leaves))]
    for cur, new in zip(leaves, saved):
        if tuple(np.shape(cur)) != tuple(np.shape(new)):
            return None
    saved = [jnp.asarray(new, dtype=jnp.asarray(cur).dtype)
             for cur, new in zip(leaves, saved)]
    return jax.tree_util.tree_unflatten(treedef, saved)


class CheckpointSaver:
    """Best-k checkpoint keeper (timm ``CheckpointSaver`` analog).

    Checkpoints carry the full train state — weights, optimizer moments,
    epoch, metric — so a killed fine-tune resumes exactly (reference restores
    the optimizer + epoch via timm ``resume_checkpoint``,
    ``hooks/finetune.py:190-203``).  Deploy-time loads ignore the extra
    ``opt``/``meta`` collections (non-strict graft)."""

    def __init__(self, out_dir: str, decreasing: bool = False, max_history: int = 10,
                 backend: str = "npz"):
        if backend not in ("npz", "sharded"):
            raise ValueError(f"unknown ckpt backend {backend!r}")
        self.out_dir = out_dir
        self.decreasing = decreasing
        self.max_history = max_history
        self.backend = backend
        self.history = []  # list of (metric, path)
        os.makedirs(out_dir, exist_ok=True)

    def save_checkpoint(self, variables: dict, epoch: int, metric: float,
                        opt_state=None):
        if self.backend == "sharded":
            return self._save_sharded(variables, epoch, metric, opt_state)
        tree = dict(variables)
        if opt_state is not None:
            tree["opt"] = opt_state_to_tree(opt_state)
        tree["meta"] = {"epoch": np.int64(epoch), "metric": np.float64(metric)}
        path = os.path.join(self.out_dir, f"checkpoint-{epoch}.ckpt.npz")
        save_model(tree, path)
        save_model(tree, os.path.join(self.out_dir, "last.ckpt.npz"))
        self.history.append((metric, path, epoch))
        self.history.sort(key=lambda t: t[0], reverse=not self.decreasing)
        while len(self.history) > self.max_history:
            _, stale, _ = self.history.pop()
            if os.path.exists(stale):
                os.remove(stale)
        best_metric, best_path, best_epoch = self.history[0]
        save_model(load_ckpt(best_path) if os.path.exists(best_path) else tree,
                   os.path.join(self.out_dir, "model_best.ckpt.npz"))
        return best_metric, best_epoch

    def _save_sharded(self, variables: dict, epoch: int, metric: float, opt_state):
        """Device-sharded async save (utils/sharded_ckpt): arrays are written
        from their mesh shards by orbax/TensorStore — no host gather, no
        duplicate 'last' copy (symlinks point at the epoch directory).
        Multihost: the save itself is collective (run this on EVERY process —
        see the trainers' saver construction); symlink/pruning bookkeeping
        happens on process 0 only."""
        from ..utils.sharded_ckpt import save_sharded

        tree = dict(variables)
        if opt_state is not None:
            tree["opt"] = opt_state_to_tree(opt_state, to_host=False)
        tree["meta"] = {"epoch": int(epoch), "metric": float(metric)}
        path = os.path.join(self.out_dir, f"checkpoint-{epoch}.ckpt.oshard")
        save_sharded(path, tree, wait=False)
        self._relink("last.ckpt.oshard", path)
        self.history.append((metric, path, epoch))
        self.history.sort(key=lambda t: t[0], reverse=not self.decreasing)
        while len(self.history) > self.max_history:
            _, stale, _ = self.history.pop()
            # never remove the dir 'last.ckpt.oshard' currently points at
            if (stale != path and jax.process_index() == 0
                    and os.path.isdir(stale) and not os.path.islink(stale)):
                import shutil

                shutil.rmtree(stale, ignore_errors=True)
        best_metric, best_path, best_epoch = self.history[0]
        self._relink("model_best.ckpt.oshard", best_path)
        return best_metric, best_epoch

    def _relink(self, name: str, target: str):
        if jax.process_index() != 0:
            return
        link = os.path.join(self.out_dir, name)
        if os.path.islink(link):
            os.remove(link)
        os.symlink(os.path.abspath(target), link)

    def save_last(self, variables: dict, epoch: int, opt_state=None):
        """Preemption save: overwrite only the 'last' checkpoint (full train
        state, best-k history untouched).  ``epoch`` is the last *completed*
        epoch — resume redoes the interrupted one from these weights."""
        tree = dict(variables)
        if opt_state is not None:
            tree["opt"] = opt_state_to_tree(opt_state,
                                            to_host=(self.backend != "sharded"))
        if self.backend == "sharded":
            from ..utils.sharded_ckpt import save_sharded

            tree["meta"] = {"epoch": int(epoch), "metric": float("nan")}
            path = os.path.join(self.out_dir, "checkpoint-preempt.ckpt.oshard")
            save_sharded(path, tree, wait=True)
            self._relink("last.ckpt.oshard", path)
            return path
        tree["meta"] = {"epoch": np.int64(epoch), "metric": np.float64("nan")}
        path = os.path.join(self.out_dir, "last.ckpt.npz")
        save_model(tree, path)
        return path


def update_summary(epoch: int, train_metrics: dict, eval_metrics: dict, path: str,
                   write_header: bool = False):
    """Per-epoch CSV log (timm ``update_summary`` analog)."""
    row = {"epoch": epoch}
    row.update({f"train_{k}": v for k, v in train_metrics.items()})
    row.update({f"eval_{k}": v for k, v in eval_metrics.items()})
    mode = "w" if write_header else "a"
    with open(path, mode) as f:
        if write_header:
            f.write(",".join(row.keys()) + "\n")
        f.write(",".join(str(v) for v in row.values()) + "\n")


@HOOK.register_module()
class L2Reconstruct(Hook):
    def __init__(self, runner, priority, asym: bool = True, l2_weight: float = 1.0,
                 cls_weight: float = 0.0, kd_weight: float = 0.0,
                 kd_temperature: float = 4.0, epoch_behavior=(), no_norm: bool = False,
                 dataset_args=None, optim_args=None, sche_args=None,
                 data_config=None, other_args=None):
        super().__init__(runner, priority)
        self.asym = asym
        self.l2_weight = l2_weight
        self.cls_weight = cls_weight
        # logit distillation (beyond the reference, which recovers via L2
        # feature reconstruction + CE only): soft-target KL against the
        # original model's logits (Hinton et al. 2015).  The teacher forward
        # already runs for the L2 taps, so KD reuses it at zero extra cost.
        self.kd_weight = kd_weight
        self.kd_temperature = kd_temperature
        self.epoch_behavior = list(epoch_behavior)
        self.no_norm = no_norm
        self.dataset_args = _combine(_default_dataset_args, dataset_args)
        self.optim_args = _combine(_default_optim_args, optim_args)
        self.sche_args = _combine(_default_sche_args, sche_args)
        self.data_config = _combine(_default_data_config, data_config)
        self.other_args = _combine(_default_other_args, other_args)
        self.teacher = None
        self.teacher_variables = None

    # -- teacher construction -------------------------------------------
    def _build_teacher(self):
        """Re-build the original model as a frozen teacher: rewind the
        filters/app cursors, re-register, re-initialize, keep only the old
        branches (reference ``finetune.py:134-149``)."""
        runner = self.runner
        for f in runner.filters:
            f.rewind()
        runner.app.rewind()
        teacher = build_model(runner.cfg.model)
        teacher.register_switchable(runner.app.src_type, runner.filters)
        t_params = teacher.init(runner.rng)
        t_state = teacher.init_state()
        t_vars = teacher.init_weights({"params": t_params, "state": t_state})
        for idx in range(teacher.length_switchable):
            name = teacher.switchable_names[idx]
            src = teacher.get_switchable_module(idx)
            src_params = tree_get(t_vars["params"], name)
            sub, sub_params = runner.app.initialize(
                src, src_params, _stable_fold(runner.rng, f"init:{name}")
            )
            teacher.set_switchable_module(idx, sub, t_vars, {"params": sub_params})
            sub.switch_old(remove_new=True)
            tree_get(t_vars["params"], name).pop("new", None)
            sub.capture = True
        self.teacher = teacher
        self.teacher_variables = t_vars

    # -- main entry ------------------------------------------------------
    def after_optimize(self):
        logger = get_logger()
        runner = self.runner
        model = runner.model
        num_layers = model.length_switchable
        sub_names = model.switchable_names

        # student: route (and optionally prune) to the new branch.  The old
        # branch must survive in sym mode whenever a teacher signal is
        # needed (L2 taps or KD logits).
        need_teacher = (not self.no_norm) or self.kd_weight > 0
        for idx, sub in enumerate(model.switchable_modules()):
            remove_old = self.asym or not need_teacher
            sub.switch_new(remove_old=remove_old)
            if remove_old:
                tree_get(runner.variables["params"], sub_names[idx]).pop("old", None)
            sub.capture = not self.no_norm

        if self.asym and need_teacher:
            self._build_teacher()

        # mesh + shardings: SPMD replaces DDP
        mesh = None
        data_sh = None
        if self.other_args.use_mesh and len(jax.devices()) > 1:
            from convnet_approximater_tpu.parallel import shard_variables

            mp = int(self.other_args.model_parallel or 1)
            mesh = make_mesh(model=mp)
            data_sh = batch_sharding(mesh)
            runner.variables = shard_variables(
                runner.variables, mesh, mp, self.other_args.tp_rules)
            if self.teacher_variables is not None:
                # teacher runs forward-only with its own (old-branch) tree;
                # replicated is correct and avoids rule mismatches
                self.teacher_variables = replicate(self.teacher_variables, mesh)
            logger.info(f"training over mesh {mesh}"
                        + (f" (tp={mp})" if mp > 1 else ""))

        # data
        image_size = tuple(self.data_config.image_size)
        num_classes = self.other_args.num_classes
        if self.dataset_args.dataset:
            ds_train = build_dataset(dict(self.dataset_args.dataset), split="train")
            ds_eval = build_dataset(dict(self.dataset_args.dataset), split="validation")
            num_classes = getattr(ds_train, "num_classes", num_classes)
        else:
            ds_train, ds_eval = self._default_datasets(image_size, num_classes)
        mk_loader = lambda ds, shuffle, aug=None: Loader(
            ds, self.dataset_args.batch_size, shuffle=shuffle, drop_last=True,
            mean=self.data_config.mean, std=self.data_config.std,
            image_size=image_size, sharding=data_sh, aug=aug,
        )
        loader_train = mk_loader(ds_train, True, self.data_config.aug)
        loader_eval = mk_loader(ds_eval, False)
        steps_per_epoch = len(loader_train)
        if self.other_args.max_steps_per_epoch:
            steps_per_epoch = min(steps_per_epoch, self.other_args.max_steps_per_epoch)

        tx, lr_sched = make_optimizer(self.optim_args, self.sche_args, steps_per_epoch)
        opt_state = tx.init(runner.variables["params"])

        start_epoch = 0
        if self.other_args.resume:
            ckpt = load_ckpt(self.other_args.resume)
            runner.variables = load_into(
                runner.variables,
                {k: v for k, v in ckpt.items() if k in ("params", "state")},
            )
            restored = []
            if "opt" in ckpt:
                new_opt = opt_state_from_tree(ckpt["opt"], opt_state)
                if new_opt is None:
                    logger.warning("resume: optimizer state structure mismatch; "
                                   "keeping a fresh optimizer")
                else:
                    opt_state = new_opt
                    restored.append("optimizer")
            if "meta" in ckpt and "epoch" in ckpt["meta"]:
                start_epoch = int(ckpt["meta"]["epoch"]) + 1
                restored.append(f"epoch {start_epoch}")
            logger.info(f"resumed weights from {self.other_args.resume}"
                        + (f" (+ {', '.join(restored)})" if restored else ""))
        if self.other_args.start_epoch is not None:
            start_epoch = self.other_args.start_epoch

        num_epochs = self.sche_args.epochs
        behavior = list(self.epoch_behavior)
        behavior += [-1] * max(0, num_epochs - len(behavior))
        behavior = behavior[:num_epochs]
        logger.info(f"epoch behaviors: {behavior}")

        eval_metric = self.other_args.eval_metric
        saver = None
        out_dir = runner.cfg.work_dir or "."
        # sharded saves are collective across hosts — every process must
        # construct the saver and call it (npz saves stay process-0-only)
        if is_main_process() or self.other_args.ckpt_backend == "sharded":
            saver = CheckpointSaver(
                out_dir, decreasing=(eval_metric == "loss"),
                max_history=self.other_args.checkpoint_hist,
                backend=self.other_args.ckpt_backend,
            )

        train_step = self._make_train_step(tx)
        eval_step = self._make_eval_step()

        best_metric = None
        best_epoch = None
        preempted = False
        epoch = start_epoch
        step_count = start_epoch * steps_per_epoch
        guard = PreemptionGuard()
        guard.__enter__()  # SIGTERM -> cooperative stop-and-checkpoint
        self._guard = guard
        try:
            for epoch in range(start_epoch, num_epochs):
                b = behavior[epoch]
                if b >= 0:
                    mask = model.freeze_except(runner.variables["params"], b)
                elif b == -1:
                    mask = model.freeze_except(runner.variables["params"], *range(num_layers))
                else:
                    mask = model.unfreeze(runner.variables["params"])
                # never update 'old' (teacher) branches of substitutions: torch
                # skipped them via grad=None; with optax the adamw weight-decay
                # term would silently decay them otherwise.
                for name in sub_names:
                    sub_params = tree_get(runner.variables["params"], name)
                    if isinstance(sub_params, dict) and "old" in sub_params:
                        tree_set(
                            mask, f"{name}.old",
                            jax.tree_util.tree_map(lambda _: False, sub_params["old"]),
                        )
                mask = jax.tree_util.tree_map(lambda m: jnp.float32(m), mask)
                loader_train.set_epoch(epoch)
                train_metrics, step_count = self._train_one_epoch(
                    epoch, loader_train, steps_per_epoch, train_step, mask,
                    opt_state, step_count, lr_sched,
                )
                opt_state = train_metrics.pop("_opt_state")
                eval_metrics = self._validate(loader_eval, eval_step)
                if is_main_process():
                    update_summary(
                        epoch, train_metrics, eval_metrics,
                        os.path.join(out_dir, "summary.csv"),
                        write_header=best_metric is None,
                    )
                if saver is not None:
                    best_metric, best_epoch = saver.save_checkpoint(
                        runner.variables, epoch, eval_metrics[eval_metric],
                        opt_state=opt_state,
                    )
        except KeyboardInterrupt:
            pass
        except Preempted as e:
            preempted = True
            if e.args:  # opt_state at the interrupted step (see _train_one_epoch)
                opt_state = e.args[0]
            if saver is not None:
                path = saver.save_last(runner.variables, epoch - 1,
                                       opt_state=opt_state)
                logger.warning(
                    f"preempted during epoch {epoch}: full train state saved to "
                    f"{path}; resuming will redo epoch {epoch}")
        finally:
            self._guard = None
            guard.__exit__()
        if best_metric is not None:
            logger.info(f"*** Best metric: {best_metric} (epoch {best_epoch})")
        self.result = dict(best_metric=best_metric, best_epoch=best_epoch,
                           preempted=preempted)

    # -- task plug points (SegL2Reconstruct overrides these) --------------
    def _ce_fn(self):
        """Task loss on (logits, labels); default: classification CE."""

        def ce(logits, labels):
            one_hot = jax.nn.one_hot(labels, logits.shape[-1])
            return -jnp.mean(jnp.sum(jax.nn.log_softmax(logits) * one_hot,
                                     axis=-1))

        return ce

    def _default_datasets(self, image_size, num_classes):
        """Synthetic smoke datasets when no dataset cfg is given."""
        return (Synthetic(256, image_size + (3,), num_classes, split="train"),
                Synthetic(128, image_size + (3,), num_classes,
                          split="validation"))

    # -- jitted steps ----------------------------------------------------
    def _make_train_step(self, tx):
        model = self.runner.model
        teacher = self.teacher
        sub_names = self.runner.model.switchable_names
        tap_keys = [f"{n}.out" for n in sub_names]
        l2w, clsw = self.l2_weight, self.cls_weight
        kdw, kdT = float(self.kd_weight), float(self.kd_temperature)
        no_norm, asym = self.no_norm, self.asym
        amp = bool(self.other_args.amp)

        ce_fn = self._ce_fn()

        def loss_fn(params, state, t_vars, images, labels, rng):
            if amp:
                # mixed precision: bf16 compute, f32 master params / grads /
                # optimizer / BN state (stats are f32 inside BatchNorm2d
                # regardless — torch-autocast semantics).  Measured 1.35-1.5x
                # on the MSCAN-t fine-tune step (doc/perf-notes.md); bf16
                # shares f32's exponent range, so no loss scaling is needed.
                params_c = cast_floating(params, jnp.bfloat16)
                t_vars = jax.tree_util.tree_map(
                    lambda a: a.astype(jnp.bfloat16)
                    if jnp.issubdtype(a.dtype, jnp.floating) else a, t_vars)
                images = images.astype(jnp.bfloat16)
            else:
                params_c = params
            ctx = Ctx(training=True, rng=rng, state=state)
            logits = model(params_c, images, ctx).astype(jnp.float32)
            new_state = _merge_state(state, ctx.state_out)
            ce = ce_fn(logits, labels)
            total_norm = jnp.float32(0.0)
            if not no_norm or kdw > 0:
                if asym:
                    t_ctx = Ctx(training=False, state=t_vars.get("state", {}))
                    t_logits = teacher(t_vars["params"], images, t_ctx)
                else:
                    t_ctx = Ctx(training=False, state=state, force_branch="old")
                    t_logits = model(params_c, images, t_ctx)
                t_taps = t_ctx.taps
                if not no_norm:
                    B = images.shape[0]
                    norm_vec = jnp.zeros((B,))
                    for key in tap_keys:
                        diff = (ctx.taps[key] - jax.lax.stop_gradient(t_taps[key])
                                ).astype(jnp.float32)
                        norm_vec = norm_vec + jnp.linalg.norm(diff.reshape(B, -1), axis=1)
                    total_norm = jnp.mean(norm_vec / len(tap_keys))
            loss = l2w * total_norm + clsw * ce
            if kdw > 0:
                # soft-target KL at temperature T, scaled by T^2 so gradient
                # magnitude is T-independent (Hinton et al. 2015)
                t_log = jax.lax.stop_gradient(t_logits.astype(jnp.float32)) / kdT
                s_log = logits / kdT
                kd = jnp.mean(jnp.sum(
                    jax.nn.softmax(t_log)
                    * (jax.nn.log_softmax(t_log) - jax.nn.log_softmax(s_log)),
                    axis=-1))
                loss = loss + kdw * (kdT ** 2) * kd
            return loss, (ce, total_norm, new_state)

        # donate the updated-in-place trees (params/state/opt_state are
        # reassigned from the step's outputs every iteration) — on TPU this
        # lets XLA update AdamW moments and weights in their own buffers
        # instead of allocating fresh ones (peak-HBM and bandwidth win).
        # Gated to real TPU runtimes: CPU ignores donation with a warning,
        # and the axon relay REJECTS aliased-buffer executables
        # (INVALID_ARGUMENT at run time — measured, scripts/exp_train_donate.py)
        from convnet_approximater_tpu.utils import supports_buffer_donation
        donate = (0, 1, 2) if supports_buffer_donation() else ()

        @partial(jax.jit, donate_argnums=donate)
        def train_step(params, state, opt_state, mask, t_vars, images, labels, rng):
            (loss, (ce, norm, new_state)), grads = jax.value_and_grad(
                loss_fn, has_aux=True
            )(params, state, t_vars, images, labels, rng)
            params, opt_state = masked_update(tx, grads, opt_state, params, mask)
            return params, new_state, opt_state, loss, ce, norm

        return train_step

    def _make_eval_step(self):
        model = self.runner.model

        @jax.jit
        def eval_step(params, state, images, labels):
            ctx = Ctx(training=False, state=state)
            logits = model(params, images, ctx)
            one_hot = jax.nn.one_hot(labels, logits.shape[-1])
            loss = -jnp.mean(jnp.sum(jax.nn.log_softmax(logits) * one_hot, axis=-1))
            c1, c5 = accuracy_sums(logits, labels)
            return loss, c1, c5

        return eval_step

    def _train_one_epoch(self, epoch, loader, steps, train_step, mask, opt_state,
                         step_count, lr_sched):
        logger = get_logger()
        runner = self.runner
        losses_m, norm_m, total_m, time_m = (AverageMeter() for _ in range(4))
        t_vars = self.teacher_variables or {"params": {}, "state": {}}
        rng = runner.rng
        end = time.time()
        guard = getattr(self, "_guard", None)
        for i, (images, labels) in enumerate(loader):
            if i >= steps:
                break
            if guard is not None and guard.triggered:
                # carry the in-epoch optimizer state out for a consistent
                # (weights, moments) preemption checkpoint
                raise Preempted(opt_state)
            step_rng = jax.random.fold_in(rng, step_count)
            params, new_state, opt_state, loss, ce, norm = train_step(
                runner.variables["params"], runner.variables["state"], opt_state,
                mask, t_vars, images, labels, step_rng,
            )
            runner.variables["params"] = params
            runner.variables["state"] = new_state
            step_count += 1
            bs = images.shape[0]
            if i % self.other_args.log_interval == 0 or i == steps - 1:
                jax.block_until_ready(loss)
                losses_m.update(float(ce), bs)
                norm_m.update(float(norm), bs)
                total_m.update(float(loss), bs)
                time_m.update(time.time() - end)
                lr = lr_sched(step_count) if callable(lr_sched) else lr_sched
                logger.info(
                    f"Train: {epoch} [{i:>4d}/{steps}]  "
                    f"Loss: {losses_m.val:#.4g} ({losses_m.avg:#.3g})  "
                    f"Norm: {norm_m.val:#.4g} ({norm_m.avg:#.3g})  "
                    f"Time: {time_m.val:.3f}s, {bs / max(time_m.val, 1e-9):>7.2f}/s  "
                    f"LR: {float(lr):.3e}"
                )
            end = time.time()
        metrics = dict(loss=total_m.avg, norm=norm_m.avg, _opt_state=opt_state)
        return metrics, step_count

    def _validate(self, loader, eval_step):
        logger = get_logger()
        runner = self.runner
        losses_m, top1_m, top5_m = (AverageMeter() for _ in range(3))
        max_batches = self.other_args.max_eval_batches
        for i, (images, labels) in enumerate(loader):
            if max_batches and i >= max_batches:
                break
            loss, c1, c5 = eval_step(
                runner.variables["params"], runner.variables["state"], images, labels
            )
            bs = images.shape[0]
            losses_m.update(float(loss), bs)
            top1_m.update(float(c1) / bs * 100.0, bs)
            top5_m.update(float(c5) / bs * 100.0, bs)
        metrics = dict(loss=losses_m.avg, top1=top1_m.avg, top5=top5_m.avg)
        logger.info(f"Eval: {metrics}")
        return metrics
