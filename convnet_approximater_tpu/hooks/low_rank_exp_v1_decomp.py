"""Post-hoc spatial factorization of every switchable scheme-1 conv
(reference ``hooks/low_rank_exp_v1_decomp.py:6-13``).  Runs after postprocess,
when switchable slots hold bare :class:`LowRankExpConvV1` modules."""

from __future__ import annotations

from convnet_approximater_tpu.layers import LowRankExpConvV1
from convnet_approximater_tpu.utils import tree_get, tree_set

from .hook import HOOK, Hook


@HOOK.register_module()
class LowRankExpV1Decomp(Hook):
    def __init__(self, runner, priority):
        super().__init__(runner, priority)

    def after_run(self):
        model = self.runner.model
        params = self.runner.variables["params"]
        for idx in range(model.length_switchable):
            name = model.switchable_names[idx]
            mod = model.get_switchable_module(idx)
            assert isinstance(mod, LowRankExpConvV1), type(mod)
            tree_set(params, name, mod.decomp(tree_get(params, name)))
