#!/usr/bin/env python
"""Kernel visualization (reference ``scripts/visualization/visual_kernel.py:37-144``):
plots depthwise / cascade (v @ h product) kernels as image grids from one or
more checkpoints (e.g. original vs d1 vs d1-finetuned)."""

import argparse
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))))

from convnet_approximater_tpu.utils.serialize import flatten_tree, load_ckpt


def extract_kernels(tree: dict, path: str) -> np.ndarray:
    """Return per-channel spatial kernels (C, kh, kw) at a dotted module path.

    Handles: a depthwise conv ('weight' (kh, kw, 1, C)), or a CascadeConv
    ('conv1'/'conv2' pair whose product v @ h is the effective kernel)."""
    flat = flatten_tree(tree)
    prefix = "params/" + path.replace(".", "/")
    if f"{prefix}/weight" in flat:
        w = flat[f"{prefix}/weight"]  # (kh, kw, 1, C)
        return np.transpose(w[:, :, 0, :], (2, 0, 1))
    if f"{prefix}/conv1/weight" in flat:
        h = flat[f"{prefix}/conv1/weight"][0, :, 0, :]  # (kw, C)
        v = flat[f"{prefix}/conv2/weight"][:, 0, 0, :]  # (kh, C)
        return np.einsum("hc,wc->chw", v, h)
    raise KeyError(f"no kernel found under {path}")


def grid_plot(kernels: np.ndarray, out_path: str, max_channels: int = 64):
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    C = min(kernels.shape[0], max_channels)
    cols = int(np.ceil(np.sqrt(C)))
    rows = int(np.ceil(C / cols))
    fig, axes = plt.subplots(rows, cols, figsize=(cols, rows))
    for i in range(rows * cols):
        ax = axes.flat[i] if rows * cols > 1 else axes
        ax.axis("off")
        if i < C:
            ax.imshow(kernels[i], cmap="viridis")
    fig.tight_layout()
    fig.savefig(out_path, dpi=150)
    print(f"wrote {out_path}")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("ckpts", nargs="+", help="checkpoint .ckpt.npz files")
    ap.add_argument("--path", required=True,
                    help="dotted module path of the kernel, e.g. "
                         "backbone.layers.0.1.0.attn.spatial_gating_unit.sd_convs")
    ap.add_argument("--out", default="work_dirs/kernels")
    args = ap.parse_args()
    os.makedirs(args.out, exist_ok=True)
    for ckpt in args.ckpts:
        tree = load_ckpt(ckpt)
        kernels = extract_kernels(tree, args.path)
        name = os.path.splitext(os.path.basename(ckpt))[0]
        grid_plot(kernels, os.path.join(args.out, f"{name}.png"))


if __name__ == "__main__":
    main()
