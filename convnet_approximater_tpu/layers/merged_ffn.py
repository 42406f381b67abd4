"""MergedFFN: the conv-FFN with fc1 (1x1) and the depthwise k x k conv
merged into ONE dense k x k convolution.

Framework extension beyond the reference (there is no FFN approximater in
``/root/reference/src/approx``): in the MSCAN FFN (reference ``mscan.py:20-46``)
``fc1`` and ``dconv`` are *adjacent linear ops* — GELU only comes after the
depthwise conv — so

    dconv(fc1(x))[h,w,m] = sum_{dy,dx,i} (D[dy,dx,m] * W1[i,m]) x[.,.,i] + beta

i.e. one dense ``k x k`` conv with kernel ``W[dy,dx,i,m] = D[dy,dx,m]W1[i,m]``
and bias ``beta = b1 * sum(D) + bd``.  On TPU this moves the depthwise conv
off the VPU and turns the thin-``C_in`` 1x1 matmul (reduction dim 32 at MSCAN
stage 1 — 25% MXU utilisation) into a ``k*k*C_in`` reduction that fills the
systolic array.  The merge is exact away from borders; the residual frame is
corrected by :class:`FixPaddingBias2d` (solved in closed form by
:class:`~convnet_approximater_tpu.core.ffn_rep.FfnRep`, trainable afterwards).
"""

from __future__ import annotations

from convnet_approximater_tpu.nn import Conv2d, Ctx, Dropout, GELU, Identity, Module

from .depth_separable_conv import FixPaddingBias2d
from .substitution import LAYER


@LAYER.register_module()
class MergedFFN(Module):
    """Dense ``k x k`` conv (= fc1 ∘ dconv) -> border fix -> GELU -> fc2."""

    def __init__(self, num_channel: int, hidden_channel: int, drop: float = 0.0,
                 kernel_size: int = 3, fix: bool = True):
        super().__init__()
        self.num_channel = num_channel
        self.hidden_channel = hidden_channel
        self.kernel_size = kernel_size
        self.conv = Conv2d(num_channel, hidden_channel, kernel_size,
                           padding=kernel_size // 2)
        self.fix = (FixPaddingBias2d(hidden_channel, kernel_size // 2)
                    if fix else Identity())
        self.fc2 = Conv2d(hidden_channel, num_channel, 1)
        self.drop = Dropout(drop)

    def __call__(self, params, x, ctx: Ctx):
        x = self.child("conv", params, x, ctx)
        x = self.child("fix", params, x, ctx)
        x = GELU()({}, x, ctx)
        x = self.child("fc2", params, x, ctx)
        return self.child("drop", params, x, ctx)
