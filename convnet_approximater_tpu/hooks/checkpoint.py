"""Declarative stage-level checkpointing (reference ``hooks/checkpoint.py:9-47``):
``ckpt_cfg = {stage: {action: 'save'|'load', path: ...}}`` saves or loads the
runner's variables at any lifecycle stage (e.g. load an optimized checkpoint
after initialize and skip the solve)."""

from __future__ import annotations

import os

from convnet_approximater_tpu.utils import load_model, save_model

from .hook import HOOK, Hook


@HOOK.register_module()
class CkptHook(Hook):
    def __init__(self, runner, priority, ckpt_cfg):
        super().__init__(runner, priority)
        self.ckpt_cfg = {}
        for stage in self.stages:
            cur = ckpt_cfg.get(stage)
            if cur is not None:
                assert cur["action"] in ("save", "load")
                if cur["action"] == "load":
                    assert os.path.isfile(cur["path"]), cur["path"]
            self.ckpt_cfg[stage] = cur

    def _save_or_load(self, cfg):
        if cfg is None or self.runner.variables is None:
            return
        if cfg["action"] == "save":
            save_model(self.runner.variables, cfg["path"])
        else:
            self.runner.variables = load_model(self.runner.variables, cfg["path"])

    def before_run(self):
        self._save_or_load(self.ckpt_cfg["before_run"])

    def after_register(self):
        self._save_or_load(self.ckpt_cfg["after_register"])

    def after_initialize(self):
        self._save_or_load(self.ckpt_cfg["after_initialize"])

    def after_optimize(self):
        self._save_or_load(self.ckpt_cfg["after_optimize"])

    def after_run(self):
        self._save_or_load(self.ckpt_cfg["after_run"])
