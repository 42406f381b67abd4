"""The 4-phase approximation pipeline: Register -> Initialize -> Optimize ->
PostProcess, with hook dispatch between phases.

Rebuild of ``/root/reference/src/approx/runner/runner.py:15-117``.  The runner
owns the (structure, variables) pair: ``self.model`` is the mutable module
tree, ``self.variables = {'params': ..., 'state': ...}`` the arrays.  Every
substitution edit updates both.  Process-0 gating uses
``jax.process_index()`` instead of cfg-injected ranks.
"""

from __future__ import annotations

import os
from typing import List

import jax

from convnet_approximater_tpu.core import build_app
from convnet_approximater_tpu.filters import build_filter
from convnet_approximater_tpu.hooks import Hook, build_hook
from convnet_approximater_tpu.models import build_model
from convnet_approximater_tpu.parallel import is_main_process
from convnet_approximater_tpu.utils import (
    get_cfg,
    get_logger,
    is_method_overridden,
    load_model,
    print_cfg,
    save_cfg,
    save_model,
    tree_get,
    tree_set,
)
from convnet_approximater_tpu.nn.module import _stable_fold

from .base import BaseRunner


class Runner(BaseRunner):
    def __init__(self, deploy: bool = False, skip_optim: bool = False,
                 skip_post: bool = False, rng=None):
        cfg = get_cfg()
        self.deploy = deploy
        self.skip_optim = skip_optim
        self.skip_post = skip_post
        self.cfg = cfg
        self.rng = rng if rng is not None else jax.random.key(cfg.seed or 0)
        self.model = build_model(cfg.model)
        self.app = build_app(cfg.app, deploy=deploy)
        self.filters = [build_filter(f_cfg) for f_cfg in cfg.filters] if cfg.filters else []
        self.hooks: List[Hook] = []
        self.variables = None  # {'params': ..., 'state': ...} after initialize
        self.output_path = None
        if is_main_process() and cfg.work_dir:
            os.makedirs(cfg.work_dir, exist_ok=True)
            print_cfg()
            save_cfg(os.path.join(cfg.work_dir, "cfg.yaml"))
            name = cfg.config_name or cfg.name or "model"
            self.output_path = os.path.join(cfg.work_dir, name + ".ckpt.npz")
        if cfg.hooks:
            for h_cfg in cfg.hooks:
                self.register_hook(h_cfg)
            get_logger().info(self.hook_info())

    # -- phases ----------------------------------------------------------
    def run(self):
        logger = get_logger()
        self.call_hook("before_run")

        logger.info("Register...")
        self.model.register_switchable(self.app.src_type, self.filters, verbose=True)
        logger.info(
            f"{self.model.length_switchable} switchable submodules: "
            f"{self.model.switchable_names}"
        )
        self.call_hook("after_register")

        logger.info("Initialize...")
        params = self.model.init(self.rng)
        state = self.model.init_state()
        self.variables = {"params": params, "state": state}
        self.variables = self.model.init_weights(self.variables)
        if self._apply_structure_passes():
            # Structure passes may internally re-register switchables for
            # their own apps (e.g. prune_width's AttnPrune/FfnPrune/MlpPrune
            # loop), clobbering the registration made above — whichever of
            # their src_types matched last would leak into the app loop
            # below and crash the configured app's initialize().  Re-register
            # for the configured app (ADVICE r4).
            self.model.register_switchable(self.app.src_type, self.filters)
        for idx in range(self.model.length_switchable):
            name = self.model.switchable_names[idx]
            src = self.model.get_switchable_module(idx)
            src_params = tree_get(self.variables["params"], name)
            sub, sub_params = self.app.initialize(
                src, src_params, _stable_fold(self.rng, f"init:{name}")
            )
            self.model.set_switchable_module(idx, sub, self.variables, {"params": sub_params})
            self._restructure_state(name, sub)
        self.call_hook("after_initialize")

        if self.deploy:
            self.variables = load_model(self.variables, self.cfg.checkpoint)

        if not self.skip_optim:
            logger.info("Optimize...")
            for idx in range(self.model.length_switchable):
                name = self.model.switchable_names[idx]
                sub = self.model.get_switchable_module(idx)
                self.app.optimize(sub, tree_get(self.variables["params"], name))
        self.call_hook("after_optimize")

        if not self.skip_post:
            logger.info("PostProcess...")
            for idx in range(self.model.length_switchable):
                name = self.model.switchable_names[idx]
                sub = self.model.get_switchable_module(idx)
                module, new_params = self.app.postprocess(
                    sub, tree_get(self.variables["params"], name)
                )
                self.model.set_switchable_module(idx, module, self.variables, {"params": new_params})
                st = tree_get(self.variables["state"], name) if _has(self.variables["state"], name) else None
                if isinstance(st, dict) and ("old" in st or "new" in st):
                    tree_set(self.variables["state"], name, st.get("new", {}))

        if is_main_process() and self.output_path:
            save_model(self.variables, self.output_path)
            get_logger().info(f"saved model to {self.output_path}")

        self.call_hook("after_run")

    def _apply_structure_passes(self):
        """Apply ``cfg.structure_passes`` — ordered deploy-pass rewrites
        (``deploy.py`` functions by name, e.g. ``prune_chains``) run after
        weight init / ``init_cfg`` load and before the app pipeline.

        Makes cross-layer structure edits config-expressible and
        checkpoint-replayable: a checkpoint saved from a pruned run
        reloads by replaying the same passes (shapes then match; the
        load overwrites the values, so the selection replay need not be
        identical).  No reference counterpart — its pipeline had no
        structure rewrites outside the per-module apps.
        """
        passes = self.cfg.structure_passes
        if not passes:
            return False
        import convnet_approximater_tpu.deploy as deploy

        for p in passes:
            p = dict(p)
            fn = getattr(deploy, p.pop("fn"))
            n = fn(self.model, self.variables, **p)
            get_logger().info(f"structure pass {fn.__name__}: {n} sites")
        return True

    def _restructure_state(self, name: str, sub):
        """Wrap any existing state subtree at ``name`` under 'old' and add
        'new'-branch state (keeps BN-carrying substitutions consistent)."""
        state = self.variables["state"]
        old_state = tree_get(state, name) if _has(state, name) else {}
        new_state = sub.new_module.init_state() if hasattr(sub, "new_module") else {}
        wrapped = {}
        if old_state:
            wrapped["old"] = old_state
        if new_state:
            wrapped["new"] = new_state
        tree_set(state, name, wrapped)

    # -- hook machinery --------------------------------------------------
    def register_hook(self, hook_cfg):
        hook = build_hook(hook_cfg, runner=self)
        idx = 0
        for h in self.hooks:
            if hook.priority < h.priority:
                break
            idx += 1
        self.hooks.insert(idx, hook)

    def call_hook(self, stage: str):
        for h in self.hooks:
            getattr(h, stage)()

    def hook_info(self) -> str:
        lines = ["\n"]
        for stage in Hook.stages:
            entries = [
                (h.name, h.priority)
                for h in self.hooks
                if is_method_overridden(stage, Hook, h)
            ]
            lines.append(f"Stage {stage}:")
            lines.append(f"{'Name':^24}|{'Prio':^8}")
            lines.append("-" * 33)
            for name, prio in entries:
                lines.append(f"{name:^24}|{prio:^8}")
            lines.append("-" * 33)
        return "\n".join(lines)


def _has(tree: dict, path: str) -> bool:
    node = tree
    for p in path.split("."):
        if not isinstance(node, dict) or p not in node:
            return False
        node = node[p]
    return True
