"""Calibration hook: collects per-switchable input statistics for the
data-driven scheme-2 solve.

The reference never built a data-driven reconstruction (SURVEY.md §2.2 names
it as the gap scheme-2 left open); this hook closes the loop: after the
substitutions are initialized (and before ``optimize``), it streams a few
calibration batches through the *original* branches, taps each substitution's
input, and accumulates the second moment of vertical input strips
``Sigma[(c, u), (c', u')]`` that :func:`scheme2_data_driven` uses as the
error metric.  Runs as one jitted pass per batch on device.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from convnet_approximater_tpu.data import Loader, Synthetic, build_dataset
from convnet_approximater_tpu.nn.module import Ctx
from convnet_approximater_tpu.utils.logger import get_logger

from .hook import HOOK, Hook


def strip_second_moment(x, kh: int):
    """Second moment of vertical strips: x (B, H, W, C) ->
    Sigma (C*kh, C*kh) over all (image, row-window, column) samples."""
    B, H, W, C = x.shape
    Ho = H - kh + 1
    # patches: (B, Ho, W, kh, C)
    wins = jnp.stack([x[:, i:i + Ho, :, :] for i in range(kh)], axis=3)
    # order (c, u): index c*kh + u
    v = jnp.transpose(wins, (0, 1, 2, 4, 3)).reshape(B * Ho * W, C * kh)
    return (v.T @ v) / v.shape[0]


def channel_second_moment(x):
    """Second moment of single pixels over channels: x (B, H, W, C) ->
    Sigma (C, C) — the statistic ``LowRankExpV4``'s channel-mode whitening
    weights its input factor with."""
    B, H, W, C = x.shape
    v = x.reshape(B * H * W, C)
    return (v.T @ v) / v.shape[0]


def patch_second_moment(x, kh: int, kw: int):
    """Second moment of FULL k x k patches: x (B, H, W, C) ->
    Sigma (C*kh*kw, C*kh*kw), flat index (c, u, v) = c*kh*kw + u*kw + v —
    the same order a (r, C, kh, kw) OIHW kernel flattens to, so
    ``LowRankExpV3``'s whitened solve can weight its row space directly."""
    B, H, W, C = x.shape
    Ho, Wo = H - kh + 1, W - kw + 1
    wins = jnp.stack(
        [jnp.stack([x[:, i:i + Ho, j:j + Wo, :] for j in range(kw)], axis=3)
         for i in range(kh)], axis=3)  # (B, Ho, Wo, kh, kw, C)
    v = jnp.transpose(wins, (0, 1, 2, 5, 3, 4)).reshape(
        B * Ho * Wo, C * kh * kw)
    return (v.T @ v) / v.shape[0]


def site_statistic(stat: str, x, src):
    """Per-batch calibration statistic for one substitution site.

    ``stat``: the app's ``calibration_stat`` — 'strips' / 'patches' /
    'channels' moments, or 'raw' (the tapped maps themselves; the caller
    concatenates instead of averaging).  ``src``: the site's old module
    (kernel size source).  Shared by :class:`CalibrationHook` and the
    planner's two-pass ``apply_app`` calibration.
    """
    if stat == "raw":
        return x
    kh = src.kernel_size[0] if hasattr(src, "kernel_size") else 1
    if stat == "patches":
        kw = src.kernel_size[1] if hasattr(src, "kernel_size") else 1
        return patch_second_moment(x, kh, kw)
    if stat == "channels":
        return channel_second_moment(x)
    return strip_second_moment(x, kh)


@HOOK.register_module()
class CalibrationHook(Hook):
    """Attach calibration second moments to a data-driven approximater."""

    def __init__(self, runner, priority, num_batches: int = 2, batch_size: int = 8,
                 image_size=(64, 64), dataset=None):
        super().__init__(runner, priority)
        self.num_batches = num_batches
        self.batch_size = batch_size
        self.image_size = tuple(image_size)
        self.dataset_cfg = dataset

    def after_initialize(self):
        runner = self.runner
        app = runner.app
        if not hasattr(app, "set_calibration"):
            get_logger().info("CalibrationHook: app has no set_calibration; skipped")
            return
        model = runner.model
        names = model.switchable_names
        subs = list(model.switchable_modules())
        for sub in subs:
            sub.capture = True
        if self.dataset_cfg:
            ds = build_dataset(dict(self.dataset_cfg), split="train")
        else:
            ds = Synthetic(self.batch_size * self.num_batches,
                           self.image_size + (3,), 10)
        loader = Loader(ds, self.batch_size, shuffle=False,
                        image_size=self.image_size)

        # One jitted pass capturing every substitution INPUT.  The input of a
        # substitution equals the output of the previous layer; rather than
        # tapping inputs we run the 'old' branch and tap just before each
        # switchable by re-using the tap of the producing module: simplest
        # robust approach — tap outputs, then derive per-layer inputs by a
        # second capture pass on the src convs themselves.
        def fwd(params, state, x):
            ctx = Ctx(training=False, state=state, force_branch="old")
            ctx.capture_inputs = True
            model(params, x, ctx)
            return ctx.taps

        fwd_j = jax.jit(fwd)
        moments = {}
        count = 0
        for i, (images, _) in enumerate(loader):
            if i >= self.num_batches:
                break
            taps = fwd_j(runner.variables["params"], runner.variables["state"], images)
            stat = getattr(app, "calibration_stat", "strips")
            for idx, name in enumerate(names):
                key = f"{name}.in"
                if key not in taps:
                    continue
                sm = site_statistic(stat, taps[key], subs[idx].old_module)
                if stat == "raw":
                    # apps whose statistic lives behind a nonlinearity
                    # (FfnPrune's hidden moments) get the tapped maps
                    # themselves and compute their own stats in optimize()
                    moments.setdefault(idx, []).append(sm)
                else:
                    moments[idx] = moments.get(idx, 0) + sm
            count += 1
        for idx, sm in moments.items():
            app.set_calibration(idx, jnp.concatenate(sm, axis=0)
                                if isinstance(sm, list) else sm / max(count, 1))
        for sub in subs:
            sub.capture = False
        get_logger().info(f"CalibrationHook: collected moments for {sorted(moments)}")
