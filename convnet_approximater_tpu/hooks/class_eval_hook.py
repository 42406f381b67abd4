"""Classification evaluation hook (reference ``hooks/class_eval_hook.py:58-68``)."""

from __future__ import annotations

from convnet_approximater_tpu.classification import ValidateHelper
from convnet_approximater_tpu.utils.logger import get_logger

from .hook import HOOK, Hook


@HOOK.register_module()
class ClassEvalHook(Hook):
    def __init__(self, runner, priority, eval_cfg):
        super().__init__(runner, priority)
        self.helper = ValidateHelper(runner, eval_cfg)

    def after_run(self):
        self.result = self.helper.validate()
        get_logger().info(f"eval results: {self.result}")
