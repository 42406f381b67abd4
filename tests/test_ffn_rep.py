"""FfnRep (fc1 + depthwise merge) exactness.

The merge must be bit-for-bit equivalent (up to fp32 matmul rounding) to the
original FFN *everywhere*, borders included — the whole point of the
FixPaddingBias2d frame.  Checked for k=3 and k=5 (p=1 / p=2 corners), odd
rectangular maps (border asymmetry), and through the full Approximater
initialize/optimize/postprocess protocol plus a model-level substitution
sweep on MSCAN.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from convnet_approximater_tpu.core import FfnRep
from convnet_approximater_tpu.layers import MergedFFN
from convnet_approximater_tpu.models.mscan import FFN


def _rand_ffn(C, M, k, key=0):
    ffn = FFN(C, M, drop=0.0)
    if k != 3:
        import convnet_approximater_tpu.nn as nn

        ffn.dconv = nn.Conv2d(M, M, k, padding=k // 2, groups=M)
    params = ffn.init(jax.random.key(key))
    return ffn, params


@pytest.mark.parametrize("k,H,W", [(3, 13, 11), (5, 9, 14), (3, 8, 8)])
def test_ffn_rep_exact(k, H, W):
    C, M = 5, 12
    ffn, params = _rand_ffn(C, M, k)
    x = jax.random.normal(jax.random.key(7), (2, H, W, C))
    y_ref, _, _ = ffn.apply(params, x, training=False)

    app = FfnRep(fix=True)
    sub, sub_params = app.initialize(ffn, params)
    app.optimize(sub, sub_params)
    tgt, tgt_params = app.postprocess(sub, sub_params)
    assert isinstance(tgt, MergedFFN)
    y_new, _, _ = tgt.apply(tgt_params, x, training=False)
    np.testing.assert_allclose(np.asarray(y_new), np.asarray(y_ref),
                               rtol=1e-4, atol=1e-5)


def test_ffn_rep_without_fix_differs_at_border_only():
    """Sanity on the border algebra: fix=False must still be exact in the
    interior but wrong within p of an edge (else the fix is vacuous)."""
    C, M, k, H, W = 4, 8, 3, 10, 12
    p = k // 2
    ffn, params = _rand_ffn(C, M, k, key=3)
    x = jax.random.normal(jax.random.key(1), (1, H, W, C))
    y_ref, _, _ = ffn.apply(params, x, training=False)
    app = FfnRep(fix=False)
    sub, sub_params = app.initialize(ffn, params)
    app.optimize(sub, sub_params)
    tgt, tgt_params = app.postprocess(sub, sub_params)
    y_new, _, _ = tgt.apply(tgt_params, x, training=False)
    np.testing.assert_allclose(np.asarray(y_new[:, p:-p, p:-p]),
                               np.asarray(y_ref[:, p:-p, p:-p]),
                               rtol=1e-4, atol=1e-5)
    assert np.abs(np.asarray(y_new[:, 0]) - np.asarray(y_ref[:, 0])).max() > 1e-4


def test_ffn_rep_model_level():
    """Substitute only stage-1 FFNs of a tiny MSCAN; logits must be
    preserved and later-stage FFNs left untouched."""
    from convnet_approximater_tpu.filters import IndicesFilter
    from convnet_approximater_tpu.models import MSCAN_Classifier
    from convnet_approximater_tpu.utils import tree_get

    model = MSCAN_Classifier(
        num_channels=(8, 16), num_blocks=(2, 2), exp_ratios=(4, 4),
        num_classes=7,
    )
    variables = {"params": model.init(jax.random.key(0)),
                 "state": model.init_state()}
    x = jax.random.normal(jax.random.key(2), (2, 32, 32, 3))
    y_ref, _, _ = model.apply(variables["params"], x,
                              state=variables["state"], training=False)

    app = FfnRep(fix=True)
    flt = IndicesFilter((1, 2))  # stage-1 blocks (1-based registration order)
    model.register_switchable(app.src_type, [flt])
    assert model.length_switchable == 2
    for i in range(model.length_switchable):
        name = model.switchable_names[i]
        src = model.get_switchable_module(i)
        sub, sp = app.initialize(src, tree_get(variables["params"], name))
        model.set_switchable_module(i, sub, variables, {"params": sp})
        app.optimize(sub, sp)
        tgt, tgt_params = app.postprocess(sub, sp)
        model.set_switchable_module(i, tgt, variables, {"params": tgt_params})
    y_new, _, _ = model.apply(variables["params"], x,
                              state=variables["state"], training=False)
    np.testing.assert_allclose(np.asarray(y_new), np.asarray(y_ref),
                               rtol=1e-4, atol=1e-4)
