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

import os

import jax

from convnet_approximater_tpu.nn import Conv2d, Ctx, Identity, Module, Sequential

from .depth_separable_conv import CascadeConv, FixPaddingBias, ParallelConv
from .substitution import LAYER

# VMEM ceiling for the fused kernel's per-image tile (fp32 words); the kernel
# keeps ~4 live (H+2p, W+2p, C) buffers, so stay well under 16 MB.
_FUSE_MAX_TILE = 640 * 1024


def _fuse_enabled() -> bool:
    # Measured on the current XLA/Mosaic toolchain (doc/perf-notes.md): XLA's
    # own lowering of the strip-conv chain still beats the hand-written
    # Pallas kernels, so 'auto' does NOT dispatch to them; set
    # CAT_ENABLE_FUSED=1 (or fused='on') to force the Pallas path.
    if os.environ.get("CAT_DISABLE_FUSED"):
        return False
    if not os.environ.get("CAT_ENABLE_FUSED"):
        return False
    return jax.default_backend() in ("tpu", "axon")


@LAYER.register_module()
class MSCA(Module):
    """fused='auto' dispatches inference forwards to the Pallas
    :func:`~convnet_approximater_tpu.ops.pallas.msca_fused` kernel on TPU
    (training and unsupported shapes fall back to the lax path)."""

    def __init__(self, num_channel: int, k1_size: int, k_sizes, fused: str = "auto",
                 mix_merge: str = "off"):
        super().__init__()
        self.num_channel = num_channel
        self.k1_size = k1_size
        self.k_sizes = tuple(k_sizes)
        self.fused = fused
        self.mix_merge = mix_merge
        self.conv0 = Conv2d(
            num_channel, num_channel, k1_size, padding=k1_size // 2, groups=num_channel
        )
        paddings = [k // 2 for k in self.k_sizes]
        self.sd_convs = ParallelConv(
            num_channel, list(self.k_sizes), paddings, len(self.k_sizes),
            all_bias=True, identity=True,
        )
        self.channel_mix = Conv2d(num_channel, num_channel, 1)

    # -- fused dispatch --------------------------------------------------
    def _fuse_parts(self):
        """Returns (bank_module, fix_module_or_None) when the current
        structure is expressible by the fused kernel, else None."""
        sd = self.sd_convs
        fix = None
        if isinstance(sd, Sequential) and len(sd) == 2 and isinstance(sd[1], FixPaddingBias):
            fix = sd[1]
            sd = sd[0]
        if isinstance(sd, (ParallelConv, CascadeConv)):
            return sd, fix
        return None

    def _can_fuse(self, ctx: Ctx, x) -> bool:
        mode = self.fused
        if mode == "off" or ctx.training:
            return False
        if mode != "on" and not _fuse_enabled():
            return False
        if self._fuse_parts() is None:
            return False
        if not isinstance(self.conv0, Conv2d):
            return False  # decomp_conv0 swaps conv0 for a cascade
        H, W = x.shape[1], x.shape[2]
        p = max(self.k_sizes) // 2
        if (H + 2 * p) * (W + 2 * p) * max(self.num_channel, 128) > _FUSE_MAX_TILE:
            return False
        return True

    def _fused_forward(self, params, x, interpret: bool = False):
        from convnet_approximater_tpu.ops.pallas import msca_fused, pack_cascade_weights

        bank, fix = self._fuse_parts()
        sd_params = params["sd_convs"]
        bank_params = sd_params["0"] if fix is not None else sd_params
        if isinstance(bank, CascadeConv):
            cascades = [(bank, bank_params)]
            identity = False
        else:
            cascades = [
                (m, bank_params["branches"][n])
                for n, m in bank.branches.named_children()
                if isinstance(m, CascadeConv)
            ]
            identity = any(isinstance(m, Identity) for m in bank.branches)
        w1, b1, w2, b2, ks = pack_cascade_weights(
            [p_["conv1"]["weight"][0, :, 0, :] for _, p_ in cascades],
            [p_["conv1"].get("bias") for _, p_ in cascades],
            [p_["conv2"]["weight"][:, 0, 0, :] for _, p_ in cascades],
            [p_["conv2"].get("bias") for _, p_ in cascades],
        )
        res, fix_p = None, 0
        if fix is not None:
            res = jax.numpy.transpose(sd_params["1"]["res"], (0, 2, 1))  # (2, p, C)
            fix_p = fix.p
        return msca_fused(
            x,
            params["conv0"]["weight"][:, :, 0, :],
            params["conv0"]["bias"],
            w1, b1, w2, b2,
            params["channel_mix"]["weight"][0, 0],
            params["channel_mix"]["bias"],
            res,
            ks=ks,
            identity=identity,
            fix_p=fix_p,
            interpret=interpret,
        )

    # -- mix-merge dispatch ------------------------------------------------
    # Execution-strategy optimization (same params, same math, different
    # lowering — like ``scan_blocks``): after a decomp>=1 rep, sd_convs ends
    # with a vertical (k, 1) depthwise conv feeding the 1x1 channel_mix, two
    # adjacent linear ops.  Lowering them as ONE dense (k, 1) conv moves the
    # strip conv off the VPU and widens channel_mix's reduction dim C -> k*C
    # (fills the MXU).  Measured (C=32, 56², b=64 f32): 0.706 -> 0.546 ms
    # for a STANDALONE cascade+mix tail; the original multi-branch bank does
    # NOT benefit (1.03 -> 1.07 ms: 3 dense convs' extra MACs lose).  But in
    # the whole scanned model XLA already fuses conv2+mix+fix+gate into one
    # convolution fusion, and breaking that pattern loses: MSCAN-t d1fix
    # 7.79 -> 8.21 ms (A/B same process).  Hence OPT-IN ('off' by default),
    # same policy as the Pallas kernels — kept because the standalone win is
    # real for unscanned/eager layer use.
    def _mix_merge_parts(self):
        sd = self.sd_convs
        fix = None
        if isinstance(sd, Sequential) and len(sd) == 2 and isinstance(sd[1], FixPaddingBias):
            fix = sd[1]
            sd = sd[0]
        if isinstance(sd, CascadeConv) and isinstance(self.channel_mix, Conv2d) \
                and self.channel_mix.kernel_size == (1, 1):
            return sd, fix
        return None

    def _can_mix_merge(self, ctx: Ctx) -> bool:
        mode = self.mix_merge
        if mode == "off" or ctx.training or os.environ.get("CAT_DISABLE_MIX_MERGE"):
            return False
        if mode != "on" and jax.default_backend() not in ("tpu", "axon"):
            return False
        return self._mix_merge_parts() is not None

    def _mix_merged_forward(self, params, x, ctx: Ctx):
        from convnet_approximater_tpu.ops.conv import conv2d, depthwise_conv2d

        jnp = jax.numpy
        cascade, fix = self._mix_merge_parts()
        sd_params = params["sd_convs"]
        cp = sd_params["0"] if fix is not None else sd_params
        attn = self.child("conv0", params, x, ctx)
        k = cascade.kernel_size
        p = k // 2
        attn = depthwise_conv2d(attn, cp["conv1"]["weight"], cp["conv1"].get("bias"),
                                padding=(0, p))
        wm = params["channel_mix"]["weight"][0, 0]          # (C, C)
        bm = params["channel_mix"].get("bias", 0.0)
        wv = cp["conv2"]["weight"]                          # (k, 1, 1, C)
        wmv = wv[:, :, 0, :, None] * wm[None, None]          # (k, 1, C, C)
        bias = bm + (cp["conv2"]["bias"] @ wm if "bias" in cp["conv2"] else 0.0)
        attn = conv2d(attn, wmv, bias, padding=(p, 0))
        if fix is not None:
            res = sd_params["1"]["res"]                     # (2, C, pf)
            H, pf = x.shape[1], fix.p
            p2 = min(H, pf)
            strip = jnp.zeros((H, self.num_channel), x.dtype)
            strip = strip.at[:p2].add(jnp.transpose(res[0, :, :p2]))
            strip = strip.at[H - p2:].add(jnp.transpose(res[1, :, pf - p2:]))
            attn = attn + (strip @ wm)[None, :, None, :]
        return x * attn

    def __call__(self, params, x, ctx: Ctx):
        if self._can_fuse(ctx, x):
            return self._fused_forward(params, x)
        if self._can_mix_merge(ctx):
            return self._mix_merged_forward(params, x, ctx)
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
