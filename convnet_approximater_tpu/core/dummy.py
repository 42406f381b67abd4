"""No-op approximater (reference ``src/approx/core/dummy.py:9-26``): runs the
full pipeline lifecycle against :class:`DummyLayer` substitutions so only the
hooks execute — the pipeline smoke-test mechanism."""

from __future__ import annotations

from typing import Dict

from convnet_approximater_tpu.layers import Substitution
from convnet_approximater_tpu.nn import Module

from .approximater import APP, Approximater


@APP.register_module()
class Dummy(Approximater):
    _src_type = "DummyLayer"
    _tgt_type = "DummyLayer"

    def __init__(self, deploy: bool = False):
        super().__init__(deploy=deploy)

    def _get_tgt_args(self, src: Module) -> Dict:
        return {}

    def _fix_substitution(self, sub: Substitution, params: dict):
        pass

    def optimize(self, sub: Substitution, params: dict):
        pass

    def _postprocess(self, sub: Substitution, params: dict):
        pass
