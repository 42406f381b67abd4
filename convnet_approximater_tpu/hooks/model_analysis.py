"""FLOPs / parameter counting (reference ``hooks/model_analysis.py:8-16``).

The reference used ``ptflops`` module-walking; here XLA itself is the source
of truth: the jitted forward's compiled ``cost_analysis()`` reports the real
post-fusion FLOPs and bytes accessed for the exact program that will run.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from convnet_approximater_tpu.utils.logger import get_logger

from .hook import HOOK, Hook


def count_params(params) -> int:
    return sum(int(np.prod(np.shape(p))) for p in jax.tree_util.tree_leaves(params))


def analyze_model(model, variables, input_shape=(1, 224, 224, 3),
                  dtype=jnp.float32) -> dict:
    """Compile the eval forward and pull XLA's cost analysis.

    ``dtype`` must match the weights' floating dtype (bf16 serving surfaces
    pass bfloat16 — mixed conv operand dtypes are a trace-time error)."""

    def fwd(params, state, x):
        y, _, _ = model.apply(params, x, state=state, training=False)
        return y

    x = jnp.zeros(input_shape, dtype)
    compiled = jax.jit(fwd).lower(variables["params"], variables.get("state", {}), x).compile()
    cost = compiled.cost_analysis()
    if isinstance(cost, list):  # older jax returns a per-computation list
        cost = cost[0] if cost else {}
    flops = float(cost.get("flops", float("nan")))
    bytes_accessed = float(cost.get("bytes accessed", float("nan")))
    return dict(
        flops=flops,
        macs=flops / 2.0,
        bytes_accessed=bytes_accessed,
        params=count_params(variables["params"]),
    )


@HOOK.register_module()
class ModelAnalysis(Hook):
    def __init__(self, runner, priority, input_shape=(224, 224, 3), batch_size: int = 1):
        super().__init__(runner, priority)
        self.input_shape = tuple(input_shape)
        self.batch_size = batch_size

    def after_run(self):
        shape = (self.batch_size,) + self.input_shape
        info = analyze_model(self.runner.model, self.runner.variables, shape)
        get_logger().info(
            f"Model MACs: {info['macs'] / 1e6:.2f} M (XLA flops {info['flops'] / 1e6:.2f} M, "
            f"bytes {info['bytes_accessed'] / 1e6:.2f} MB), "
            f"Params: {info['params'] / 1e6:.2f} M"
        )
        self.result = info
