"""Exact re-parameterization of MSCA's multi-branch strip-conv bank.

Rebuild of ``/root/reference/src/approx/core/msca_rep.py:16-217``.  The
algebra merges the ParallelConv bank (identity + per-branch cascade of a
horizontal (1, k) conv then vertical (k, 1) conv, each with bias) into one
equivalent depthwise kernel with an exact center bias and top/bottom border
residuals, then optionally re-expands it by batched SVD into ``decomp``
rank-1 cascade branches.  All tensor math is jnp (jit-able host-level
transform); the published equations are written in OIHW so each step can be
audited against the paper/reference — layouts convert at the param-tree
boundary.

Border-bias derivation (the "hard part" per SURVEY.md §7): the cascade's
first bias ``b1`` is spatially uniform after conv1, so conv2 (zero-padded,
kernel height ``k = 2p + 1``) maps it to ``b1 * sum(w2)`` in the interior but
only a partial sum within ``p`` rows of the top/bottom edge.  The merged
kernel applies the full center bias everywhere; the residual at row ``r``
from the top is ``-b1 * sum(w2[:p-r])`` and mirror-image at the bottom.
"""

from __future__ import annotations

from typing import Dict, List

import jax
import jax.numpy as jnp

from convnet_approximater_tpu.layers import (
    MSCA,
    CascadeConv,
    FixPaddingBias,
    ParallelConv,
    Substitution,
)
from convnet_approximater_tpu.nn import Conv2d, Sequential
from convnet_approximater_tpu.utils.logger import get_logger

from .approximater import APP, Approximater


def _dw_to_c1hw(w):
    """Depthwise HWIO (kh, kw, 1, C) -> (C, 1, kh, kw)."""
    return jnp.transpose(w, (3, 2, 0, 1))


def _c1hw_to_dw(w):
    """(C, 1, kh, kw) -> depthwise HWIO (kh, kw, 1, C)."""
    return jnp.transpose(w, (2, 3, 1, 0))


def sum_bias(w2_c1h1: jnp.ndarray, b1: jnp.ndarray, b2: jnp.ndarray, pad: int = None):
    """Center bias + border residuals of a biased cascade.

    ``w2_c1h1``: (C, 1, H2, 1) vertical kernel; ``b1``/``b2``: (C,) biases.
    Returns ``(center_bias (C,), res (2, C, p))`` with res[0] ordered from the
    top edge inward and res[1] ordered toward the bottom edge.
    """
    h2 = w2_c1h1.shape[2]
    C = w2_c1h1.shape[0]
    p = h2 // 2 if pad is None else pad
    w2 = w2_c1h1[:, 0, :, 0]  # (C, H2)
    total = jnp.sum(w2, axis=1)
    center = total * b1 + b2
    # cumulative partial sums: top_csum[i] = sum(w2[:, :i+1]), i = 0..H2-1
    csum = jnp.cumsum(w2, axis=1)
    rcsum = jnp.cumsum(w2[:, ::-1], axis=1)
    top = jnp.stack([-csum[:, i - 1] * b1 for i in range(1, p + 1)], axis=1)  # (C, p), i-th = sum of first i taps
    bot = jnp.stack([-rcsum[:, i - 1] * b1 for i in range(1, p + 1)], axis=1)
    # res[0][:, p - i] = -sum(w2[:i]) * b1  -> reverse top along the p axis
    res = jnp.stack([top[:, ::-1], bot], axis=0)  # (2, C, p)
    return center, res


def merge_res(res_list: List[jnp.ndarray]) -> jnp.ndarray:
    """Sum border residuals of different paddings into a (2, C, max_p) array:
    top residues align to the first rows, bottom residues to the last."""
    max_p = max(int(r.shape[-1]) for r in res_list)
    C = res_list[0].shape[1]
    merged = jnp.zeros((2, C, max_p), res_list[0].dtype)
    for r in res_list:
        p = int(r.shape[-1])
        merged = merged.at[0, :, :p].add(r[0])
        merged = merged.at[1, :, max_p - p:].add(r[1])
    return merged


def _pad_center(kernel, hw: int):
    """Zero-pad a (C, 1, h, w) kernel to (C, 1, hw, hw), centered."""
    h, w = kernel.shape[-2:]
    ph, pw = max(hw - h, 0) // 2, max(hw - w, 0) // 2
    return jnp.pad(kernel, ((0, 0), (0, 0), (ph, ph), (pw, pw)))


def get_equivalent_kernel(module: ParallelConv, params: dict):
    """Merge a ParallelConv bank (with identity branch) into one kernel.

    Returns ``(weight (C, 1, hw, hw), bias (C,), res (2, C, hw//2))``.
    Mirrors reference ``msca_rep.py:114-143``: identity kernel + sum of
    center-padded ``w2 @ w1`` per branch; biases via :func:`sum_bias`.
    """
    branch_params = params["branches"]
    w1s, b1s, w2s, b2s = [], [], [], []
    for name, b in module.branches.named_children():
        if isinstance(b, CascadeConv):
            bp = branch_params[name]
            w1s.append(_dw_to_c1hw(bp["conv1"]["weight"]))  # (C, 1, 1, k)
            b1s.append(bp["conv1"].get("bias", jnp.zeros(module.dim)))
            w2s.append(_dw_to_c1hw(bp["conv2"]["weight"]))  # (C, 1, k, 1)
            b2s.append(bp["conv2"].get("bias", jnp.zeros(module.dim)))
    hw = max(w1s[-1].shape[-2:])
    C = module.dim
    weight = jnp.zeros((C, 1, hw, hw)).at[:, 0, hw // 2, hw // 2].set(1.0)  # identity branch
    b_sum = jnp.zeros((C,))
    res_list = []
    for w1, b1, w2, b2 in zip(w1s, b1s, w2s, b2s):
        weight = weight + _pad_center(w2 @ w1, hw)
        b, r = sum_bias(w2, b1, b2)
        b_sum = b_sum + b
        res_list.append(r)
    return weight, b_sum, merge_res(res_list)


@APP.register_module()
class MscaRep(Approximater):
    """Re-parameterize MSCA: merge the strip bank, optionally re-expand into
    ``decomp`` rank-1 cascades, optionally add learnable border fix."""

    _src_type = "MSCA"
    _tgt_type = "MSCA"

    def __init__(self, decomp: int, fix: bool, decomp_conv0: bool = False,
                 deploy: bool = False):
        super().__init__(deploy=deploy)
        assert 0 <= decomp <= 4
        self.decomp = decomp
        self.fix = fix
        # Extension beyond the reference: also SVD-split conv0's k1 x k1
        # depthwise kernel into a rank-1 (1,k1)/(k1,1) cascade — it carries
        # k1^2 (=25) of the post-rep block's ~67 taps.  Lossy (logs the
        # retained PC energy); off by default for reference parity.
        self.decomp_conv0 = decomp_conv0

    def _get_tgt_args(self, src: MSCA) -> Dict:
        return dict(num_channel=src.num_channel, k1_size=src.k1_size, k_sizes=src.k_sizes)

    def _fix_substitution(self, sub: Substitution, params: dict):
        src: MSCA = sub.old_module
        tgt: MSCA = sub.new_module
        params["new"]["conv0"] = jax.tree_util.tree_map(lambda v: v, params["old"]["conv0"])
        params["new"]["channel_mix"] = jax.tree_util.tree_map(
            lambda v: v, params["old"]["channel_mix"]
        )
        max_k = max(src.k_sizes)
        padding = max_k // 2
        C = src.num_channel
        if self.decomp == 0:
            sd_conv = Conv2d(C, C, max_k, padding=padding, groups=C)
        elif self.decomp == 1:
            sd_conv = CascadeConv(C, max_k, padding, bias=True, first_bias=False,
                                  strip_matmul=True)
        else:
            sd_conv = ParallelConv(C, max_k, padding, self.decomp, all_bias=False, identity=False)
        if self.fix:
            fix = FixPaddingBias(C, padding)
            tgt.sd_convs = Sequential(sd_conv, fix)
        else:
            tgt.sd_convs = sd_conv
        params["new"]["sd_convs"] = tgt.sd_convs.init(jax.random.key(0))
        if self.decomp_conv0:
            k1 = src.k1_size
            tgt.conv0 = CascadeConv(C, k1, k1 // 2, bias=True, first_bias=False)
            params["new"]["conv0"] = tgt.conv0.init(jax.random.key(1))

    def optimize(self, sub: Substitution, params: dict):
        src: MSCA = sub.old_module
        tgt: MSCA = sub.new_module
        weight, bias, res = get_equivalent_kernel(src.sd_convs, params["old"]["sd_convs"])
        sd_params = params["new"]["sd_convs"]
        sd = sd_params["0"] if self.fix else sd_params
        if self.decomp == 0:
            sd["weight"] = _c1hw_to_dw(weight)
            sd["bias"] = bias
        else:
            u, s, vh = jnp.linalg.svd(weight, full_matrices=False)  # over (C, 1, k, k)
            if self.decomp == 1:
                # conv1 (1, k): top right-singular vector, unscaled;
                # conv2 (k, 1): top left-singular vector scaled by s0
                # (reference ``msca_rep.py:156-162``)
                sd["conv1"]["weight"] = _c1hw_to_dw(vh[..., 0, :][..., None, :])
                sd["conv2"]["weight"] = _c1hw_to_dw((u[..., 0] * s[..., 0][..., None])[..., None])
                sd["conv2"]["bias"] = bias
            else:
                for j in range(self.decomp):
                    bj = sd["branches"][str(j)]
                    bj["conv1"]["weight"] = _c1hw_to_dw(vh[..., j, :][..., None, :])
                    bj["conv2"]["weight"] = _c1hw_to_dw((u[..., j] * s[..., j][..., None])[..., None])
                sd["branches"][str(self.decomp - 1)]["conv2"]["bias"] = bias
            lbd = s**2
            m_pce = jnp.mean(jnp.sum(lbd[..., : self.decomp], axis=-1) / jnp.sum(lbd, axis=-1))
            get_logger().info(f"PC energy retained: {float(m_pce)}")
        if self.fix:
            sd_params["1"]["res"] = res
        if self.decomp_conv0:
            w0 = _dw_to_c1hw(params["old"]["conv0"]["weight"])  # (C, 1, k1, k1)
            u, s, vh = jnp.linalg.svd(w0, full_matrices=False)
            c0 = params["new"]["conv0"]
            c0["conv1"]["weight"] = _c1hw_to_dw(vh[..., 0, :][..., None, :])
            c0["conv2"]["weight"] = _c1hw_to_dw((u[..., 0] * s[..., 0][..., None])[..., None])
            c0["conv2"]["bias"] = params["old"]["conv0"]["bias"]
            lbd = s**2
            pce = jnp.mean(lbd[..., 0] / jnp.sum(lbd, axis=-1))
            get_logger().info(f"conv0 rank-1 PC energy: {float(pce)}")

    def _postprocess(self, sub: Substitution, params: dict):
        pass


@APP.register_module()
class MscaProfile(Approximater):
    """Profiling variant: swap MSCA for MSCAProfile (named-scope-annotated
    forward), weights copied verbatim (reference ``msca_rep.py:181-210``)."""

    _src_type = "MSCA"
    _tgt_type = "MSCAProfile"

    def __init__(self, deploy: bool = False):
        super().__init__(deploy=deploy)

    def _get_tgt_args(self, src: MSCA) -> Dict:
        return dict(num_channel=src.num_channel, k1_size=src.k1_size, k_sizes=src.k_sizes)

    def _fix_substitution(self, sub: Substitution, params: dict):
        params["new"] = jax.tree_util.tree_map(lambda v: v, params["old"])

    def optimize(self, sub: Substitution, params: dict):
        pass

    def _postprocess(self, sub: Substitution, params: dict):
        pass


@APP.register_module()
class MscaRepProfile(MscaRep):
    """MscaRep targeting the profiler-annotated MSCA variant."""

    _src_type = "MSCA"
    _tgt_type = "MSCAProfile"
