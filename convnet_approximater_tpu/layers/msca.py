"""Multi-Scale Conv Attention (SegNeXt MSCA) layers.

Rebuild of ``/root/reference/src/approx/layers/msca.py``: ``conv0`` (k1 x k1
depthwise) -> ``sd_convs`` (ParallelConv strip bank at k in {7, 11, 21} +
identity) -> ``channel_mix`` (1x1) -> elementwise gate ``x * attn``.
``switchable_layer()`` marks ``sd_convs`` as the trainable part under the
fine-tune freeze schedule (reference ``msca.py:28-29``).

:class:`MSCAProfile` annotates the three stages with ``jax.named_scope`` so
device traces captured by the InferenceTimeHook attribute time to
CONV0/SD_CONVS/CHANNEL_MIX — the XLA analog of the reference's
``torch.autograd.profiler.record_function`` regions.
"""

from __future__ import annotations

import jax

from convnet_approximater_tpu.nn import Conv2d, Ctx, Module

from .depth_separable_conv import ParallelConv
from .substitution import LAYER


@LAYER.register_module()
class MSCA(Module):
    def __init__(self, num_channel: int, k1_size: int, k_sizes):
        super().__init__()
        self.num_channel = num_channel
        self.k1_size = k1_size
        self.k_sizes = tuple(k_sizes)
        self.conv0 = Conv2d(
            num_channel, num_channel, k1_size, padding=k1_size // 2, groups=num_channel
        )
        paddings = [k // 2 for k in self.k_sizes]
        self.sd_convs = ParallelConv(
            num_channel, list(self.k_sizes), paddings, len(self.k_sizes),
            all_bias=True, identity=True,
        )
        self.channel_mix = Conv2d(num_channel, num_channel, 1)

    def __call__(self, params, x, ctx: Ctx):
        attn = self.child("conv0", params, x, ctx)
        attn = self.child("sd_convs", params, attn, ctx)
        attn = self.child("channel_mix", params, attn, ctx)
        return x * attn

    def switchable_layer(self) -> str:
        """Name of the sub-module the freeze schedule should unfreeze."""
        return "sd_convs"


@LAYER.register_module()
class MSCAProfile(MSCA):
    def __call__(self, params, x, ctx: Ctx):
        with jax.named_scope("CONV0"):
            attn = self.child("conv0", params, x, ctx)
        with jax.named_scope("SD_CONVS"):
            attn = self.child("sd_convs", params, attn, ctx)
        with jax.named_scope("CHANNEL_MIX"):
            attn = self.child("channel_mix", params, attn, ctx)
        return attn * x
