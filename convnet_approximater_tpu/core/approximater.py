"""Approximater template: initialize / optimize / postprocess / rewind.

Rebuild of ``/root/reference/src/approx/core/approximater.py:9-68``.  Because
params live outside modules, every phase takes and returns (module, params)
pairs: ``initialize`` builds the target module from ``_get_tgt_args`` via the
LAYER registry, initializes its params, wraps both in a
:class:`~convnet_approximater_tpu.layers.Substitution` (params under
``old``/``new``), and applies ``_fix_substitution`` (weight carry-over);
``optimize`` computes the new weights (returning an updated ``new`` subtree);
``postprocess`` unwraps; ``rewind`` resets per-layer cursors for the
fine-tune hook's second registration pass.
"""

from __future__ import annotations

from abc import ABC, abstractmethod
from typing import Dict, Tuple

import jax

from convnet_approximater_tpu.layers import LAYER, Substitution, build_layer
from convnet_approximater_tpu.nn import Module
from convnet_approximater_tpu.utils.registry import Registry, build_from_cfg


class Approximater(ABC):
    _src_type = ""
    _tgt_type = ""

    def __init__(self, deploy: bool = False):
        self.deploy = deploy

    @property
    def src_type(self) -> type:
        return self._src_type if isinstance(self._src_type, type) else LAYER.get(self._src_type)

    @property
    def tgt_type(self) -> type:
        return self._tgt_type if isinstance(self._tgt_type, type) else LAYER.get(self._tgt_type)

    @abstractmethod
    def _get_tgt_args(self, src: Module) -> Dict:
        ...

    @abstractmethod
    def _fix_substitution(self, sub: Substitution, params: dict):
        """Carry invariant weights from ``params['old']`` into ``params['new']``
        (in place)."""

    def initialize(self, src: Module, src_params: dict, rng=None) -> Tuple[Module, dict]:
        assert isinstance(src, self.src_type), f"{type(src)} is not {self.src_type}"
        cfg = dict(type=self.tgt_type)
        cfg.update(self._get_tgt_args(src))
        tgt = build_layer(cfg)
        rng = rng if rng is not None else jax.random.key(0)
        tgt_params = tgt.init(rng)
        sub = Substitution(src, tgt)
        sub_params = {"old": src_params, "new": tgt_params}
        self._fix_substitution(sub, sub_params)
        if self.deploy:
            return tgt, sub_params["new"]
        return sub, sub_params

    @abstractmethod
    def optimize(self, sub: Substitution, params: dict):
        """Solve for the new module's weights; mutates ``params['new']``."""

    @abstractmethod
    def _postprocess(self, sub: Substitution, params: dict):
        ...

    def postprocess(self, sub: Substitution, params: dict) -> Tuple[Module, dict]:
        self._postprocess(sub, params)
        return sub.new_module, params["new"]

    def rewind(self):
        pass


APP = Registry("APP")


def build_app(cfg, **kwargs) -> Approximater:
    return build_from_cfg(cfg, APP, **kwargs)
