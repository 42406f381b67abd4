#!/usr/bin/env python
"""CAM visualization for MSCAN (reference ``scripts/visualization/cam.py``).

The reference dispatches ~11 ``pytorch_grad_cam`` variants via ``--method``
(its lines 13-26); here the same surface is pure JAX
(``convnet_approximater_tpu/visualization/cam.py``):

* ``attn`` — the reference's custom ``MscaAttnCAM``: channel-mean of a
  chosen block's MSCA attention map (``channel_mix(sd_convs(conv0(x)))``).
* gradient family (``gradcam``, ``gradcam++``, ``hirescam``,
  ``gradcam-elementwise``, ``xgradcam``, ``layercam``, ``eigengradcam``) —
  the model re-runs with the block output functionally overridden, so the
  class-logit gradient w.r.t. the feature map is exact (no hook recompute).
* gradient-free (``eigencam``, ``scorecam``, ``ablationcam``) — PCA /
  masked re-forwards / channel-knockout re-forwards.
"""

import argparse
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))))

import jax
import jax.numpy as jnp

from convnet_approximater_tpu.layers import MSCA
from convnet_approximater_tpu.models import build_model
from convnet_approximater_tpu.nn.module import Ctx
from convnet_approximater_tpu.utils import get_cfg, init_cfg, load_model
from convnet_approximater_tpu.utils.serialize import tree_get


def run_with_block_capture(model, variables, x, msca):
    """Forward pass capturing the chosen MSCA's input and output."""
    captured = {}
    orig = type(msca).__call__

    def patched(self_, params, xx, ctx):
        y = orig(self_, params, xx, ctx)
        if self_ is msca:
            captured["in"], captured["out"] = xx, y
        return y

    type(msca).__call__ = patched
    try:
        logits, _, _ = model.apply(variables["params"], x, state=variables["state"])
    finally:
        type(msca).__call__ = orig
    return logits, captured


def logits_with_block_output(model, variables, x, msca, y_override):
    """Forward pass with the chosen MSCA's output replaced by ``y_override``."""
    orig = type(msca).__call__

    def patched(self_, params, xx, ctx):
        if self_ is msca:
            return y_override
        return orig(self_, params, xx, ctx)

    type(msca).__call__ = patched
    try:
        logits, _, _ = model.apply(variables["params"], x, state=variables["state"])
    finally:
        type(msca).__call__ = orig
    return logits


def attn_map(msca, mparams, xin):
    ctx = Ctx(training=False)
    a = msca.child("conv0", mparams, xin, ctx)
    a = msca.child("sd_convs", mparams, a, ctx)
    a = msca.child("channel_mix", mparams, a, ctx)
    return a


def normalize(m):
    m = m - m.min()
    return m / (m.max() + 1e-8)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--config", required=True)
    ap.add_argument("--checkpoint", default=None)
    ap.add_argument("--block", type=int, default=0, help="MSCA block index")
    from convnet_approximater_tpu.visualization import CAM_METHODS

    ap.add_argument("--method", "--mode", dest="method",
                    choices=("attn",) + tuple(CAM_METHODS),
                    default="attn")
    ap.add_argument("--image", default=None, help="npy image (H, W, 3) uint8; random if omitted")
    ap.add_argument("--out", default="work_dirs/cam")
    ap.add_argument("--platform", default=None,
                    help="force a jax backend (e.g. cpu) — env vars alone "
                         "are overridden by the container's platform pin")
    args = ap.parse_args()
    if args.platform:
        jax.config.update("jax_platforms", args.platform)

    init_cfg(args.config)
    cfg = get_cfg()
    model = build_model(cfg.model)
    variables = {"params": model.init(jax.random.key(0)), "state": model.init_state()}
    if args.checkpoint:
        variables = load_model(variables, args.checkpoint)

    model.register_switchable(MSCA, [])
    name = model.switchable_names[args.block]
    msca = model.get_switchable_module(args.block)
    mparams = tree_get(variables["params"], name)

    if args.image:
        img = np.load(args.image).astype(np.float32)
    else:
        img = np.random.RandomState(0).randint(0, 256, (224, 224, 3)).astype(np.float32)
    x = jnp.asarray((img / 255.0 - 0.5) / 0.5)[None]

    logits, captured = run_with_block_capture(model, variables, x, msca)
    xin = captured["in"]

    if args.method == "attn":
        heat = np.asarray(jnp.mean(attn_map(msca, mparams, xin)[0], axis=-1))
    else:
        cls = int(jnp.argmax(logits[0]))
        feats = captured["out"]

        def class_score(y):
            return logits_with_block_output(model, variables, x, msca, y)[0, cls]

        fn, kind = CAM_METHODS[args.method]
        if kind == "model":  # fullgrad: whole-model bias-gradient decomposition
            # unroll every scan engine (MSCAN keeps the knob on .backbone,
            # ConvNeXt on the model itself) — in-scan layers produce tracer
            # outputs the tap discovery must skip, which would silently
            # drop all per-block bias terms
            for mod in [model] + [m for _, m in model.named_modules()]:
                if hasattr(mod, "scan_blocks"):
                    mod.scan_blocks = "off"
            heat = fn(model, variables, x, cls)
        elif kind == "grad":
            heat = fn(feats, jax.grad(class_score)(feats))
        elif kind == "feat":
            heat = fn(feats)
        elif kind == "override":
            heat = fn(feats, class_score)
        else:  # scorecam: full-model masked re-forwards
            def class_prob(xb):
                out, _, _ = model.apply(variables["params"], xb,
                                        state=variables["state"])
                return jax.nn.softmax(out, axis=-1)[:, cls]

            heat = fn(feats, x, class_prob)
        heat = np.asarray(heat)

    heat = normalize(heat)
    os.makedirs(args.out, exist_ok=True)
    out_path = os.path.join(args.out, f"cam_{args.method}_block{args.block}.png")
    try:
        import matplotlib

        matplotlib.use("Agg")
        import matplotlib.pyplot as plt

        fig, axes = plt.subplots(1, 2, figsize=(6, 3))
        axes[0].imshow(img.astype(np.uint8))
        axes[0].axis("off")
        axes[1].imshow(heat, cmap="jet")
        axes[1].axis("off")
        fig.savefig(out_path, dpi=150)
        print(f"wrote {out_path}")
    except Exception:
        np.save(out_path.replace(".png", ".npy"), heat)
        print(f"matplotlib unavailable; wrote {out_path.replace('.png', '.npy')}")


if __name__ == "__main__":
    main()
