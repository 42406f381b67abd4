"""Loader-driven throughput benchmark (reference ``hooks/fps.py:12-90``):
200 iterations with 5 warm-up, imgs/sec, repeated ``repeat_times`` runs with
mean/variance.  The timed span ends with a scalar readback (robust where
``block_until_ready`` acks early, e.g. the axon relay)."""

from __future__ import annotations

import time

import jax
import jax.numpy as jnp
import numpy as np

from convnet_approximater_tpu.data import Loader, Synthetic, build_dataset
from convnet_approximater_tpu.utils.logger import get_logger

from .hook import HOOK, Hook


@HOOK.register_module()
class Fps(Hook):
    def __init__(self, runner, priority, repeat_times: int = 1, log_interval: int = 50,
                 total_iters: int = 200, num_warmup: int = 5,
                 dataset_args=None, data_config=None):
        super().__init__(runner, priority)
        self.repeat_times = repeat_times
        self.log_interval = log_interval
        self.total_iters = total_iters
        self.num_warmup = num_warmup
        self.dataset_args = dict(dataset_args or {})
        self.data_config = dict(data_config or {})

    def _make_loader(self):
        batch_size = self.dataset_args.get("batch_size", 64)
        ds_cfg = self.dataset_args.get("dataset")
        image_size = self.data_config.get("image_size", (224, 224))
        if ds_cfg:
            dataset = build_dataset(dict(ds_cfg), split="validation")
        else:
            dataset = Synthetic(
                num_samples=batch_size * 8,
                image_size=tuple(image_size) + (3,),
                num_classes=1000,
            )
        return Loader(dataset, batch_size, shuffle=False, image_size=tuple(image_size))

    def after_run(self):
        logger = get_logger()
        model, variables = self.runner.model, self.runner.variables

        def fwd(params, state, x):
            y, _, _ = model.apply(params, x, state=state, training=False)
            return y

        fn = jax.jit(fwd)
        params, state = variables["params"], variables.get("state", {})
        fps_list = []
        for run in range(self.repeat_times):
            loader = self._make_loader()
            it = iter(_cycle(loader))
            # Warm-up iterations (compile + cache), then time the remaining
            # iterations as one span ended by a scalar readback: robust on
            # transports where block_until_ready acks early (axon relay),
            # and the single readback amortizes across the whole span.
            last = None
            for i in range(self.num_warmup):
                images, _ = next(it)
                last = fn(params, state, images)
            if last is not None:
                float(jnp.sum(last))
            num_imgs = 0
            t0 = time.perf_counter()
            for i in range(self.num_warmup, self.total_iters):
                images, _ = next(it)
                last = fn(params, state, images)
                num_imgs += images.shape[0]
                if (i + 1) % self.log_interval == 0:
                    float(jnp.sum(last))
                    logger.info(
                        f"[run {run + 1}] iter [{i + 1}/{self.total_iters}] "
                        f"fps: {num_imgs / (time.perf_counter() - t0):.2f} img/s"
                    )
            float(jnp.sum(last))
            pure_time = time.perf_counter() - t0
            fps = num_imgs / pure_time
            logger.info(f"[run {run + 1}] overall fps: {fps:.2f} img/s")
            fps_list.append(fps)
        self.result = dict(
            average_fps=round(float(np.mean(fps_list)), 2),
            fps_variance=round(float(np.var(fps_list)), 4),
        )
        logger.info(
            f"Average fps of {self.repeat_times} runs: {self.result['average_fps']} "
            f"(variance {self.result['fps_variance']})"
        )


def _cycle(loader):
    while True:
        for batch in loader:
            yield batch
