"""Forward-pass timing + device trace capture.

Reference (``hooks/inference_time_hook.py:9-35``) wrapped one forward in
``torch.profiler`` and printed the kernel table.  The XLA equivalents:

* wall-clock timing with ``block_until_ready`` after warm-up (compilation
  excluded), median over ``num_iters``;
* an optional ``jax.profiler.trace`` capture to ``work_dir/traces`` —
  open with TensorBoard/XProf for the per-kernel table, with
  ``jax.named_scope`` regions (e.g. MSCAProfile's CONV0/SD_CONVS/CHANNEL_MIX)
  attributing time to submodule stages;
* the compiled program's XLA cost analysis as the machine-readable summary.
"""

from __future__ import annotations

import os
import time

import jax
import jax.numpy as jnp
import numpy as np

from convnet_approximater_tpu.utils.logger import get_logger

from .hook import HOOK, Hook
from .model_analysis import analyze_model


def time_forward(model, variables, input_shape, num_iters=10, warmup=3,
                 dtype=jnp.float32, forward_fn=None):
    """Per-forward seconds via two-point slope timing.

    Timing brackets force a scalar readback rather than relying on
    ``block_until_ready`` (some transports — e.g. the axon TPU relay — ack
    readiness before execution finishes); the slope between an ``n`` and a
    ``4n`` dispatch loop cancels the readback roundtrip.

    ``forward_fn(params, state, x) -> y`` overrides the default
    ``model.apply`` eval forward (e.g. a whole-model pipeline callable).
    """

    def fwd(params, state, x):
        y, _, _ = model.apply(params, x, state=state, training=False)
        return y

    fn = jax.jit(forward_fn if forward_fn is not None else fwd)
    x = jnp.ones(input_shape, dtype)
    # device-resident once: the measurement must be the forward, not a
    # per-iteration host->device re-upload of numpy checkpoint leaves
    from convnet_approximater_tpu.utils import device_resident

    params, state = device_resident(variables)

    def run(n):
        t0 = time.perf_counter()
        for _ in range(n):
            r = fn(params, state, x)
        float(jnp.sum(r))
        return time.perf_counter() - t0

    for _ in range(max(warmup, 1)):
        run(1)
    n1, n2 = num_iters, num_iters * 4
    # The axon relay's readback roundtrip drifts by tens of ms between
    # calls; a slope whose measured delta (t2-t1) sits below that drift is
    # noise and can even go non-positive (observed: a 0.3 ms int8 AlexNet
    # "timed" at 0.000 ms).  Widen the iteration span until the delta
    # clears the floor.  CPU has no relay, keep the cheap single pass.
    min_span_s = 0.0 if jax.default_backend() == "cpu" else 0.10
    while True:
        t1 = min(run(n1) for _ in range(2))
        t2 = min(run(n2) for _ in range(2))
        if (t2 - t1) >= min_span_s or n2 >= 4096:
            break
        n1, n2 = n1 * 4, n2 * 4
    per = max((t2 - t1) / (n2 - n1), 1e-9)
    return fn, x, np.asarray([per])


@HOOK.register_module()
class InferenceTimeHook(Hook):
    def __init__(self, runner, priority, infer_cfg=None):
        super().__init__(runner, priority)
        infer_cfg = dict(infer_cfg or {})
        # reference configs use NCHW input_size tuples; accept both layouts
        size = tuple(infer_cfg.pop("input_size", (64, 224, 224, 3)))
        if len(size) == 4 and size[1] in (1, 3) and size[3] not in (1, 3):
            size = (size[0], size[2], size[3], size[1])
        self.input_size = size
        self.num_iters = infer_cfg.pop("num_iters", 10)
        self.warmup = infer_cfg.pop("warmup", 3)
        self.capture_trace = infer_cfg.pop("capture_trace", False)
        self.dtype = jnp.bfloat16 if infer_cfg.pop("bf16", False) else jnp.float32
        # config-driven profiler tables (the reference's profile_args /
        # key_args / table_args surface, ref inference_time_hook.py:14-26,
        # mapped to the TPU trace analyzer utils/trace.py):
        #   profile_args: dict(capture=True) forces a trace capture
        #   table_args: dict(group_by=[...], row_limit=N, exclude=[...])
        profile_args = dict(infer_cfg.pop("profile_args", {}) or {})
        if profile_args.get("capture"):
            self.capture_trace = True
        table_args = dict(infer_cfg.pop("table_args", {}) or {})
        gb = table_args.get("group_by", ("op", "source", "category"))
        self.table_group_by = (gb,) if isinstance(gb, str) else tuple(gb)
        self.table_row_limit = int(table_args.get("row_limit", 15))
        self.table_exclude = tuple(table_args.get("exclude", ()))

    def after_run(self):
        logger = get_logger()
        model, variables = self.runner.model, self.runner.variables
        fn, x, times = time_forward(
            model, variables, self.input_size, self.num_iters, self.warmup, self.dtype
        )
        if self.capture_trace:
            from convnet_approximater_tpu.utils import device_resident

            # device-resident for the traced call too, or the trace tables
            # attribute the time to the H2D re-upload instead of the model
            params, state = device_resident(variables)
            trace_dir = os.path.join(self.runner.cfg.work_dir or ".", "traces")
            with jax.profiler.trace(trace_dir):
                r = fn(params, state, x)
                float(jnp.sum(r))
            logger.info(f"device trace captured to {trace_dir} (view with xprof/tensorboard)")
            from convnet_approximater_tpu.utils.trace import summarize_trace

            # the per-op tables — the torch.profiler key_averages analog,
            # plus source-line attribution (device time -> module code);
            # groupings/row limit/exclusions come from table_args
            for gb in self.table_group_by:
                logger.info(
                    f"Profile by {gb}:\n"
                    + summarize_trace(trace_dir, top_k=self.table_row_limit,
                                      exclude_substrings=self.table_exclude,
                                      group_by=gb))
        cost = analyze_model(model, variables, self.input_size)
        med = float(np.median(times)) * 1e3
        logger.info(
            f"Forward time (batch {self.input_size[0]}): median {med:.3f} ms, "
            f"min {times.min() * 1e3:.3f} ms over {self.num_iters} iters | "
            f"XLA MACs {cost['macs'] / 1e6:.1f} M, HBM bytes {cost['bytes_accessed'] / 1e6:.1f} MB"
        )
        self.result = dict(median_ms=med, times=times, **cost)
