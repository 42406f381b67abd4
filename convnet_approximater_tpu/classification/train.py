"""From-scratch classification training helper.

The reference shipped a ``TrainHelper`` that was dead code (never exported,
methods missing ``self`` — SURVEY.md §1).  This is a working replacement used
to produce the pretrained baselines the pipeline consumes (e.g.
``alexnet_cifar10.ckpt.npz``): standard CE training with optional
augmentation-free loaders, cosine/step schedules, label smoothing, SPMD over
the device mesh, per-epoch validation and best-k checkpoints.
"""

from __future__ import annotations

import os
import time
from functools import partial

import jax
import jax.numpy as jnp
import optax

from convnet_approximater_tpu.data import Loader, Synthetic, build_dataset
from convnet_approximater_tpu.hooks.finetune import CheckpointSaver, make_optimizer, update_summary
from convnet_approximater_tpu.nn.module import Ctx, _merge_state
from convnet_approximater_tpu.parallel import batch_sharding, is_main_process, make_mesh, replicate
from convnet_approximater_tpu.utils import cast_floating, get_logger
from convnet_approximater_tpu.utils.config import Config
from convnet_approximater_tpu.utils.preempt import Preempted, PreemptionGuard

from .validate import AverageMeter, accuracy_sums

_default_train_cfg = dict(
    batch_size=128,
    image_size=(32, 32),
    mean=(0.4914, 0.4822, 0.4465),
    std=(0.2470, 0.2435, 0.2616),
    dataset=None,  # DATASET registry cfg
    num_classes=10,
    epochs=10,
    opt="adamw",
    lr=1e-3,
    weight_decay=0.05,
    momentum=0.9,
    eps=1e-8,
    sched="cosine",
    min_lr=1e-6,
    warmup_epochs=0,
    decay_rate=0.1,
    label_smoothing=0.0,
    aug=None,  # train-loader augmentation (data/loader.py::augment_batch)
    # in-step Mixup/CutMix (timm absorption — reference train.py:13; see
    # data/mixup.py): Beta(alpha,alpha) lambda per step, switch_prob picks
    # CutMix vs mixup when both alphas are on; 0.0/0.0 = off (not traced)
    mixup=0.0,
    cutmix=0.0,
    mixup_switch_prob=0.5,
    # gradient clipping (reference train.py:91-99): max global-norm
    # ("norm"), per-element value ("value"), or adaptive ("agc"); 0 = off
    clip_grad=0.0,
    clip_mode="norm",
    log_interval=50,
    eval_metric="top1",
    checkpoint_hist=3,
    use_mesh=True,
    model_parallel=1,  # model-axis size; >1 shards params per tp_rules
    tp_rules=None,  # "mscan" preset / explicit (suffix, axes) list (parallel/tp.py)
    # GPipe block pipelining over the model axis (parallel/pp.py): >1 runs
    # each scannable stage's blocks across pipeline_parallel devices —
    # training included (per-block BN state + drop-path ride the stack).
    # Mutually exclusive with model_parallel>1 (both use the model axis).
    pipeline_parallel=1,
    pipeline_microbatches=None,  # default: = pipeline depth
    max_steps_per_epoch=None,
    max_eval_batches=None,
    amp=False,  # bf16 compute / f32 master params (see hooks/finetune.py)
    # model EMA (timm ModelEmaV2 analog): decay>0 keeps an exponential moving
    # average of all floating leaves (params + BN stats) updated inside the
    # jitted step; eval + checkpoint-metric use the EMA weights
    ema_decay=0.0,
    # gradient accumulation (optax.MultiSteps): k micro-batches are averaged
    # into one optimizer step — large effective batch without the HBM
    grad_accum=1,
    resume="",  # checkpoint path: restores weights (+ema/opt if present) + epoch
    ckpt_backend="npz",  # or "sharded" (orbax shard-parallel; see finetune.py)
    work_dir="work_dirs/train",
    seed=0,
)


def ema_update(ema, new, decay):
    """timm ``ModelEmaV2._update`` semantics: floating leaves decay
    (``e*d + n*(1-d)``), non-floating leaves (counters) copy through."""

    def leaf(e, n):
        if jnp.issubdtype(jnp.asarray(e).dtype, jnp.floating):
            return e * decay + n.astype(jnp.asarray(e).dtype) * (1.0 - decay)
        return n

    return jax.tree_util.tree_map(leaf, ema, new)


class TrainHelper:
    def __init__(self, model, variables, train_cfg=None):
        self.model = model
        self.variables = variables
        self.cfg = Config()
        self.cfg.update(_default_train_cfg)
        self.cfg.update(train_cfg or {})

    def train(self) -> dict:
        logger = get_logger()
        cfg = self.cfg
        model = self.model
        rng = jax.random.key(cfg.seed)

        data_sh = None
        if cfg.use_mesh and len(jax.devices()) > 1:
            from convnet_approximater_tpu.parallel import shard_variables

            mp = int(cfg.model_parallel or 1)
            pp = int(cfg.pipeline_parallel or 1)
            if mp > 1 and pp > 1:
                raise ValueError("model_parallel and pipeline_parallel both "
                                 ">1: they share the mesh's model axis")
            mesh = make_mesh(model=max(mp, pp))
            data_sh = batch_sharding(mesh)
            self.variables = shard_variables(self.variables, mesh, mp, cfg.tp_rules)
            if pp > 1:
                from convnet_approximater_tpu.models.stage_exec import (
                    resolve_pipeline_carrier,
                )

                carrier = resolve_pipeline_carrier(model)
                if carrier is not None:
                    carrier.enable_pipeline(
                        mesh, num_microbatches=cfg.pipeline_microbatches)
                else:
                    get_logger().warning(
                        f"pipeline_parallel={pp}: {type(model).__name__} has "
                        f"no pipeline-capable stage engine — ignored")

        size = tuple(cfg.image_size)
        if cfg.dataset:
            ds_train = build_dataset(dict(cfg.dataset), split="train")
            ds_eval = build_dataset(dict(cfg.dataset), split="validation")
            num_classes = getattr(ds_train, "num_classes", cfg.num_classes)
        else:
            ds_train = Synthetic(512, size + (3,), cfg.num_classes, split="train")
            ds_eval = Synthetic(128, size + (3,), cfg.num_classes, split="validation")
            num_classes = cfg.num_classes
        mk = lambda ds, sh, aug=None: Loader(
            ds, cfg.batch_size, shuffle=sh, drop_last=True, mean=cfg.mean,
            std=cfg.std, image_size=size, sharding=data_sh, aug=aug)
        loader_train, loader_eval = mk(ds_train, True, cfg.aug), mk(ds_eval, False)
        steps = len(loader_train)
        if cfg.max_steps_per_epoch:
            steps = min(steps, cfg.max_steps_per_epoch)

        optim_args = Config(dict(opt=cfg.opt, lr=cfg.lr, momentum=cfg.momentum,
                                 weight_decay=cfg.weight_decay, eps=cfg.eps,
                                 clip_grad=cfg.clip_grad, clip_mode=cfg.clip_mode))
        sche_args = Config(dict(epochs=cfg.epochs, sched=cfg.sched, min_lr=cfg.min_lr,
                                warmup_epochs=cfg.warmup_epochs, decay_rate=cfg.decay_rate))
        tx, lr_sched = make_optimizer(optim_args, sche_args, steps)
        accum = int(cfg.grad_accum or 1)
        if accum > 1:
            # the inner schedule advances once per k micro-steps (per real
            # optimizer update) — mirror of torch-side grad accumulation
            tx = optax.MultiSteps(tx, every_k_schedule=accum)
        opt_state = tx.init(self.variables["params"])
        smoothing = cfg.label_smoothing

        use_ema = float(cfg.ema_decay or 0.0) > 0.0
        ema_decay = float(cfg.ema_decay or 0.0)
        self._ema = None
        if use_ema:
            self._ema = {
                "params": jax.tree_util.tree_map(jnp.asarray, self.variables["params"]),
                "state": jax.tree_util.tree_map(jnp.asarray, self.variables["state"]),
            }

        # donate the reassigned-every-step trees on real TPU runtimes only
        # (in-place weight/moment updates; the axon relay rejects aliased
        # buffers at RUN time while reporting backend 'tpu' — r4d bug:
        # every relay train step died at its first loss readback)
        from convnet_approximater_tpu.utils import supports_buffer_donation
        donate = ((0, 1, 2, 3) if use_ema else (0, 1, 2)) \
            if supports_buffer_donation() else ()

        amp = bool(cfg.amp)
        mixup_a, cutmix_a = float(cfg.mixup or 0.0), float(cfg.cutmix or 0.0)
        switch_p = float(cfg.mixup_switch_prob or 0.5)

        @partial(jax.jit, donate_argnums=donate)
        def train_step(params, state, opt_state, ema, images, labels, rng):
            def loss_fn(params):
                if amp:
                    params = cast_floating(params, jnp.bfloat16)
                    imgs = images.astype(jnp.bfloat16)
                else:
                    imgs = images
                one_hot = jax.nn.one_hot(labels, num_classes)
                if smoothing > 0:
                    one_hot = one_hot * (1 - smoothing) + smoothing / num_classes
                if mixup_a > 0 or cutmix_a > 0:
                    from convnet_approximater_tpu.data.mixup import mixup_cutmix

                    imgs, one_hot = mixup_cutmix(
                        jax.random.fold_in(rng, 0x6d69), imgs, one_hot,
                        mixup_alpha=mixup_a, cutmix_alpha=cutmix_a,
                        switch_prob=switch_p)
                ctx = Ctx(training=True, rng=rng, state=state)
                logits = model(params, imgs, ctx).astype(jnp.float32)
                new_state = _merge_state(state, ctx.state_out)
                loss = -jnp.mean(jnp.sum(jax.nn.log_softmax(logits) * one_hot, axis=-1))
                return loss, new_state

            (loss, new_state), grads = jax.value_and_grad(loss_fn, has_aux=True)(params)
            updates, opt_state = tx.update(grads, opt_state, params)
            params = optax.apply_updates(params, updates)
            if use_ema:
                ema = ema_update(ema, {"params": params, "state": new_state},
                                 jnp.float32(ema_decay))
            return params, new_state, opt_state, ema, loss

        @jax.jit
        def eval_step(params, state, images, labels):
            ctx = Ctx(training=False, state=state)
            logits = model(params, images, ctx)
            one_hot = jax.nn.one_hot(labels, num_classes)
            loss = -jnp.mean(jnp.sum(jax.nn.log_softmax(logits) * one_hot, axis=-1))
            c1, c5 = accuracy_sums(logits, labels)
            return loss, c1, c5

        out_dir = cfg.work_dir
        saver = None
        # sharded saves are collective across hosts (see hooks/finetune.py)
        if is_main_process() or cfg.ckpt_backend == "sharded":
            os.makedirs(out_dir, exist_ok=True)
            saver = CheckpointSaver(out_dir, decreasing=(cfg.eval_metric == "loss"),
                                    max_history=cfg.checkpoint_hist,
                                    backend=cfg.ckpt_backend)

        start_epoch = 0
        if cfg.resume:
            from convnet_approximater_tpu.utils.serialize import load_ckpt, load_into

            ckpt = load_ckpt(cfg.resume)
            self.variables = load_into(
                self.variables,
                {k: v for k, v in ckpt.items() if k in ("params", "state")})
            if self._ema is not None and "ema" in ckpt:
                self._ema = load_into(self._ema, ckpt["ema"])
            if "opt" in ckpt:
                from convnet_approximater_tpu.hooks.finetune import opt_state_from_tree

                restored = opt_state_from_tree(ckpt["opt"], opt_state)
                if restored is not None:
                    opt_state = restored
            if "meta" in ckpt and "epoch" in ckpt["meta"]:
                start_epoch = int(ckpt["meta"]["epoch"]) + 1
            logger.info(f"resumed from {cfg.resume} (epoch {start_epoch})")

        best_metric = best_epoch = None
        self._best = (None, None)
        guard = PreemptionGuard()
        guard.__enter__()  # SIGTERM -> cooperative stop-and-checkpoint
        self._guard = guard
        try:
            self._loop(cfg, loader_train, loader_eval, steps, train_step,
                       eval_step, lr_sched, rng, saver, out_dir, opt_state,
                       start_epoch)
        except KeyboardInterrupt:
            # partial runs still report the best metric (reference behavior)
            pass
        except Preempted as e:
            if e.args:
                opt_state = e.args[1]
            if saver is not None:
                to_save = dict(self.variables)
                if self._ema is not None:
                    to_save["ema"] = self._ema
                path = saver.save_last(to_save, e.args[0] - 1 if e.args else -1,
                                       opt_state=opt_state)
                logger.warning(f"preempted: full train state saved to {path}")
        finally:
            self._guard = None
            guard.__exit__()
        best_metric, best_epoch = self._best
        logger.info(f"*** Best {cfg.eval_metric}: {best_metric} (epoch {best_epoch})")
        return dict(best_metric=best_metric, best_epoch=best_epoch,
                    variables=self.variables, ema=self._ema)

    def _loop(self, cfg, loader_train, loader_eval, steps, train_step,
              eval_step, lr_sched, rng, saver, out_dir, opt_state,
              start_epoch=0):
        logger = get_logger()
        step_count = start_epoch * steps
        guard = getattr(self, "_guard", None)
        for epoch in range(start_epoch, cfg.epochs):
            loader_train.set_epoch(epoch)
            loss_m, time_m = AverageMeter(), AverageMeter()
            end = time.time()
            for i, (images, labels) in enumerate(loader_train):
                if i >= steps:
                    break
                if guard is not None and guard.triggered:
                    raise Preempted(epoch, opt_state)
                step_rng = jax.random.fold_in(rng, step_count)
                params, state, opt_state, ema, loss = train_step(
                    self.variables["params"], self.variables["state"], opt_state,
                    self._ema, images, labels, step_rng,
                )
                self.variables["params"] = params
                self.variables["state"] = state
                if ema is not None:
                    self._ema = ema
                step_count += 1
                if i % cfg.log_interval == 0 or i == steps - 1:
                    jax.block_until_ready(loss)
                    loss_m.update(float(loss), images.shape[0])
                    time_m.update(time.time() - end)
                    lr = lr_sched(step_count) if callable(lr_sched) else lr_sched
                    logger.info(
                        f"Train: {epoch} [{i:>4d}/{steps}]  Loss: {loss_m.val:#.4g} "
                        f"({loss_m.avg:#.3g})  LR: {float(lr):.3e}  "
                        f"Time: {time_m.val:.3f}s"
                    )
                end = time.time()
            # validate (EMA weights when enabled — timm checkpoints on the
            # EMA metric once model-ema is on)
            ev_params = self._ema["params"] if self._ema is not None else self.variables["params"]
            ev_state = self._ema["state"] if self._ema is not None else self.variables["state"]
            lm, t1, t5 = AverageMeter(), AverageMeter(), AverageMeter()
            for j, (images, labels) in enumerate(loader_eval):
                if cfg.max_eval_batches and j >= cfg.max_eval_batches:
                    break
                loss, c1, c5 = eval_step(ev_params, ev_state, images, labels)
                bs = images.shape[0]
                lm.update(float(loss), bs)
                t1.update(float(c1) / bs * 100, bs)
                t5.update(float(c5) / bs * 100, bs)
            eval_metrics = dict(loss=lm.avg, top1=t1.avg, top5=t5.avg)
            logger.info(f"Eval {epoch}: {eval_metrics}")
            if is_main_process():
                update_summary(epoch, dict(loss=loss_m.avg), eval_metrics,
                               os.path.join(out_dir, "summary.csv"),
                               write_header=(epoch == 0))
            if saver is not None:
                to_save = dict(self.variables)
                if self._ema is not None:
                    to_save["ema"] = self._ema
                self._best = saver.save_checkpoint(
                    to_save, epoch, eval_metrics[cfg.eval_metric]
                )
