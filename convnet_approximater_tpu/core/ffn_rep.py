"""FfnRep: exact re-parameterization of the conv-FFN's fc1 + depthwise conv.

Framework extension beyond the reference (whose apps only target Conv2d /
MSCA, ``/root/reference/src/approx/core``): follows the same Approximater
template so it composes with the existing filters, fine-tune hooks, and
deploy path.  Motivation and algebra in
:mod:`convnet_approximater_tpu.layers.merged_ffn`; the border-fix algebra
below mirrors :func:`convnet_approximater_tpu.core.msca_rep.sum_bias` but in
2-D, via inclusion-exclusion over out-of-bounds rows/columns:

    correction[h, w, m] = -b1_m * S[h, w, m],
    S = (rows out) + (cols out) - (rows AND cols out: corners),

all three terms closed-form partial sums of the depthwise kernel ``D``.
Intended for the *large-spatial-map, thin-channel* stages (MSCAN stage 1/2)
where the depthwise conv is VPU-bound and the 1x1's reduction dim
under-fills the MXU — use ``IndicesFilter`` to scope it (MACs go UP by
``k*k`` on fc1; the win is hardware mapping, so on late stages with fat
channels the dense merge loses).
"""

from __future__ import annotations

from typing import Dict

import jax
import jax.numpy as jnp

from convnet_approximater_tpu.layers import MergedFFN, Substitution
from convnet_approximater_tpu.models.mscan import FFN

from .approximater import APP, Approximater


def merged_ffn_solve(fc1_params: dict, dconv_params: dict, p: int):
    """Closed-form merged kernel, bias, and border-fix params.

    ``fc1_params``: {'weight' (1,1,C,M), 'bias' (M,)?};
    ``dconv_params``: {'weight' (k,k,1,M), 'bias' (M,)?} (depthwise HWIO).
    Returns ``(weight (k,k,C,M), bias (M,), res_v (2,M,p), res_h (2,M,p),
    res_c (2,2,M,p,p))``.
    """
    w1 = fc1_params["weight"]  # (1, 1, C, M)
    M = w1.shape[-1]
    b1 = fc1_params.get("bias", jnp.zeros((M,), w1.dtype))
    d = dconv_params["weight"][:, :, 0, :]  # (k, k, M)
    bd = dconv_params.get("bias", jnp.zeros((M,), w1.dtype))
    k = d.shape[0]
    assert d.shape[1] == k and k == 2 * p + 1
    weight = w1[0, 0][None, None] * d[:, :, None, :]  # (k, k, C, M)
    bias = b1 * jnp.sum(d, axis=(0, 1)) + bd
    rs = jnp.sum(d, axis=1)  # (k, M) row sums
    cs = jnp.sum(d, axis=0)  # (k, M) col sums
    # at distance t (0-based) from the top edge, rows a < p - t of D are
    # out of bounds; at distance t from the bottom, rows a > p + t.
    # FixPaddingBias2d application order: side 0 (top/left) is indexed by
    # distance-from-edge, side 1 (bottom/right) runs *toward* the edge —
    # so the bottom/right partial sums are stored reversed.
    a_top = jnp.stack([jnp.sum(rs[: p - t], axis=0) for t in range(p)])     # (p, M)
    a_bot = jnp.stack([jnp.sum(rs[p + t + 1:], axis=0) for t in range(p)])[::-1]
    b_lft = jnp.stack([jnp.sum(cs[: p - s], axis=0) for s in range(p)])
    b_rgt = jnp.stack([jnp.sum(cs[p + s + 1:], axis=0) for s in range(p)])[::-1]
    res_v = -b1 * jnp.stack([a_top, a_bot])          # (2, p, M)
    res_h = -b1 * jnp.stack([b_lft, b_rgt])
    res_v = jnp.transpose(res_v, (0, 2, 1))          # (2, M, p)
    res_h = jnp.transpose(res_h, (0, 2, 1))
    # corners: + b1 * (taps out of bounds in BOTH axes), undoing the
    # double count of the strip sums
    def corner(rows, cols):
        return jnp.stack([
            jnp.stack([jnp.sum(d[rows(t)][:, cols(s)], axis=(0, 1))
                       for s in range(p)])
            for t in range(p)
        ])  # (p, p, M)

    top = lambda t: slice(None, p - t)
    bot = lambda t: slice(p + t + 1, None)
    res_c = b1 * jnp.stack([
        jnp.stack([corner(top, top), corner(top, bot)[:, ::-1]]),
        jnp.stack([corner(bot, top)[::-1], corner(bot, bot)[::-1, ::-1]]),
    ])  # (2, 2, p, p, M)
    res_c = jnp.transpose(res_c, (0, 1, 4, 2, 3))  # (2, 2, M, p, p)
    return weight, bias, res_v, res_h, res_c


@APP.register_module()
class FfnRep(Approximater):
    """Merge FFN's fc1 + depthwise conv into one dense MXU conv (exact,
    with closed-form border fix)."""

    _src_type = FFN
    _tgt_type = "MergedFFN"

    def __init__(self, fix: bool = True, deploy: bool = False):
        super().__init__(deploy=deploy)
        self.fix = fix

    def _get_tgt_args(self, src: FFN) -> Dict:
        return dict(num_channel=src.num_channel,
                    hidden_channel=src.hidden_channel,
                    drop=src.drop_rate,
                    kernel_size=src.dconv.kernel_size[0],
                    fix=self.fix)

    def _fix_substitution(self, sub: Substitution, params: dict):
        params["new"]["fc2"] = jax.tree_util.tree_map(
            lambda v: v, params["old"]["fc2"])

    def optimize(self, sub: Substitution, params: dict):
        tgt: MergedFFN = sub.new_module
        p = tgt.kernel_size // 2
        weight, bias, res_v, res_h, res_c = merged_ffn_solve(
            params["old"]["fc1"], params["old"]["dconv"], p)
        new = params["new"]
        new["conv"]["weight"] = weight
        new["conv"]["bias"] = bias
        if self.fix:
            new["fix"] = {"res_v": res_v, "res_h": res_h, "res_c": res_c}

    def _postprocess(self, sub: Substitution, params: dict):
        pass
