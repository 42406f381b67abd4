"""PrepareQAT hook: run the fine-tune phase under int8 fake-quant numerics.

Config-wired entry to quantization-aware training (VERDICT r3 #1): placed
before ``L2Reconstruct`` in the hook table (priority < 50), it swaps the
model's dense ``Conv2d``/``Linear`` modules for their STE fake-quant twins
(``deploy.prepare_qat``) right after the approximation pipeline builds the
student, so the existing L2 -> CE recovery protocol (the TPU rebuild of
reference ``hooks/finetune.py:95-420``) trains the weights under serving
int8 numerics.  The trained checkpoint stays dense-structured (QAT twins
share the dense param tree) plus the learned ``act_absmax`` observers in
state; ``scripts/export_model.py --quantize int8-qat`` converts it to the
int8 serving form with those learned scales.

By default modules INSIDE substituted branches are skipped — the measured
disjoint-layer stacking rule (same-layer decomp+int8 stacks lose,
doc/serving.md): QAT covers the dense remainder while the substitution
covers its own sites.
"""

from __future__ import annotations

from convnet_approximater_tpu.utils import get_logger

from .hook import HOOK, Hook


@HOOK.register_module()
class PrepareQAT(Hook):
    def __init__(self, runner, priority, linears: bool = True,
                 momentum: float = 0.1, include_substituted: bool = False):
        super().__init__(runner, priority)
        self.linears = linears
        self.momentum = momentum
        self.include_substituted = include_substituted

    def after_optimize(self):
        from convnet_approximater_tpu.deploy import (
            prepare_qat, qat_substitution_filter)

        model = self.runner.model
        filter_fn = None
        if not self.include_substituted:
            filter_fn = qat_substitution_filter(model)

        n = prepare_qat(model, self.runner.variables, filter_fn=filter_fn,
                        linears=self.linears, momentum=self.momentum)
        get_logger().info(
            f"PrepareQAT: {n} modules now train under int8 fake-quant "
            f"(include_substituted={self.include_substituted})")
