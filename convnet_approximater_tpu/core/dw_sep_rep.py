"""Rank-r separable re-parameterization of depthwise k x k convolutions.

No reference counterpart (its approximaters are scheme-1/2 on dense convs
— ``src/approx/core/low_rank_exp.py`` — and the MSCA bank merge —
``src/approx/core/msca_rep.py``).  This is the same per-channel SVD
split the reference's MscaRep uses on its *merged* kernel
(``msca_rep.py:156-162``), promoted to a standalone approximater for any
depthwise conv (ConvNeXt's 7x7 ``dwconv`` being the motivating target):

    W_c  (k x k)  ~=  sum_{j<r}  s_j u_j v_j^T
    =>  r parallel cascades of a (1, k) conv (taps v_j) then a (k, 1)
        conv (taps s_j * u_j), depthwise over the same C channels.

MAC math: k^2 -> 2kr per output element, so rank 1 on k=7 is a 3.5x cut
and even rank 3 still wins 49 -> 42.  TPU angle, MEASURED (v5e-1, b=64,
doc/perf-notes.md "ConvNeXt-T DwSepRep"): XLA's native depthwise emitter
handles the (1,7)/(7,1) strips well — rank-1 lax-conv cascades run
ConvNeXt-T at 1.12x f32 / **1.39x bf16** vs dense, while the
banded-Toeplitz MXU lowering (``strip_matmul=True``) LOSES there (0.89x /
0.95x: its gather overhead x18 blocks outweighs the MXU win at square-7x7
shapes).  The strip lowering wins for MSCAN's long 1xk/kx1 cascades
(k up to 21) — hence opt-in here, default off.

The solve is exact at full rank (r = k) and logs the retained PC energy
otherwise; accuracy recovery runs through the standard ``L2Reconstruct``
machinery (the cascades' strip taps are trainable per channel).
"""

from __future__ import annotations

from typing import Dict

import jax.numpy as jnp

from convnet_approximater_tpu.layers import CascadeConv, ParallelConv, Substitution
from convnet_approximater_tpu.nn import Conv2d
from convnet_approximater_tpu.utils.logger import get_logger

from .approximater import APP, Approximater
from .msca_rep import _c1hw_to_dw, _dw_to_c1hw


@APP.register_module()
class DwSepRep(Approximater):
    _src_type = "SimpleConv"
    _tgt_type = "SimpleConv"  # unused: tgt_type is rank-dependent (below)

    def __init__(self, ranks=None, energy: float = None,
                 strip_matmul: bool = False, deploy: bool = False):
        super().__init__(deploy=deploy)
        # int: same rank everywhere; tuple: per-matched-layer cursor (the
        # same convention as LowRankExpV1's num_bases); OR energy=tau for
        # automatic per-layer rank (smallest r whose mean retained
        # per-channel spectral energy >= tau)
        assert (ranks is None) != (energy is None), \
            "give exactly one of ranks / energy"
        if energy is not None:
            assert 0.0 < energy <= 1.0
        self.ranks = ranks if isinstance(ranks, (int, type(None))) \
            else tuple(ranks)
        self.energy = energy
        self._auto_r = None
        self.strip_matmul = strip_matmul
        self._idx = 0

    def initialize(self, src, src_params, rng=None):
        if self.energy is not None:
            import jax

            w = _dw_to_c1hw(src_params["weight"]).astype(jnp.float32)
            s = jnp.linalg.svd(w, compute_uv=False)  # (C, 1, k)
            lbd = (s ** 2)[:, 0, :]
            cum = jnp.cumsum(lbd, axis=1) / jnp.maximum(
                jnp.sum(lbd, axis=1, keepdims=True), 1e-30)
            mean_cum = jnp.mean(cum, axis=0)
            self._auto_r = min(int(jnp.searchsorted(mean_cum, self.energy)) + 1,
                               int(mean_cum.shape[0]))
            get_logger().info(
                f"auto rank: {self._auto_r}/{int(mean_cum.shape[0])} "
                f"(mean channel energy >= {self.energy})")
        return super().initialize(src, src_params, rng)

    def _cur_rank(self) -> int:
        if self.energy is not None:
            return self._auto_r
        if isinstance(self.ranks, int):
            return self.ranks
        return self.ranks[self._idx]

    @property
    def tgt_type(self):
        return CascadeConv if self._cur_rank() == 1 else ParallelConv

    def _get_tgt_args(self, src: Conv2d) -> Dict:
        assert src.groups == src.in_channels == src.out_channels, (
            "DwSepRep substitutes depthwise convs only (use "
            "DepthwiseConvFilter); got groups="
            f"{src.groups} in={src.in_channels} out={src.out_channels}")
        kh, kw = src.kernel_size
        assert kh == kw and src.stride == (1, 1) and src.dilation == (1, 1), (
            f"square stride-1 undilated kernels only (k={src.kernel_size}, "
            f"stride={src.stride}, dilation={src.dilation})")
        r = self._cur_rank()
        assert 1 <= r <= kh, f"rank {r} out of range for k={kh}"
        if r == 1:
            # bias always on conv2: a bias-less source carries zeros (same
            # zero-bias convention as the ResNet scheme-1 configs)
            return dict(dim=src.in_channels, kernel_size=kh,
                        padding=src.padding[0], bias=True, first_bias=False,
                        strip_matmul=self.strip_matmul)
        return dict(dim=src.in_channels, kernel_sizes=kh,
                    paddings=src.padding[0], nbranch=r, all_bias=False,
                    identity=False)

    def _fix_substitution(self, sub: Substitution, params: dict):
        self._idx += 1  # one initialize() per matched layer, in BFS order

    def optimize(self, sub: Substitution, params: dict):
        tgt = sub.new_module
        w = _dw_to_c1hw(params["old"]["weight"])  # (C, 1, k, k)
        C = w.shape[0]
        bias = params["old"].get("bias", jnp.zeros((C,), w.dtype))
        u, s, vh = jnp.linalg.svd(w, full_matrices=False)
        if isinstance(tgt, CascadeConv):
            slots = [params["new"]]
        else:
            slots = [params["new"]["branches"][str(j)]
                     for j in range(len(list(tgt.branches.named_children())))]
        for j, bj in enumerate(slots):
            bj["conv1"]["weight"] = _c1hw_to_dw(vh[..., j, :][..., None, :])
            bj["conv2"]["weight"] = _c1hw_to_dw(
                (u[..., j] * s[..., j][..., None])[..., None])
            bj["conv2"].pop("bias", None)
        slots[-1]["conv2"]["bias"] = bias
        lbd = s ** 2
        r = len(slots)
        pce = jnp.mean(jnp.sum(lbd[..., :r], axis=-1)
                       / jnp.maximum(jnp.sum(lbd, axis=-1), 1e-30))
        get_logger().info(f"PC Energy = {float(pce)}")

    def _postprocess(self, sub: Substitution, params: dict):
        pass

    def rewind(self):
        self._idx = 0
