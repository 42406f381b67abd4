#!/usr/bin/env python
"""Convert torch checkpoints (reference format: ``{'state_dict': ...}``
pickles, NCHW/OIHW) into this framework's flat-npz NHWC/HWIO checkpoints.

Covers the roles of the reference's ``scripts/ckpt_converter/`` suite:

* ``mscan_converter.py`` — official SegNeXt MSCAN ckpts -> our MSCAN naming
  (``patch_embed``->``layers.i.0``, ``block``->``layers.i.1.j``, strip-conv
  pairs -> ``sd_convs.branches.b.convS``);
* ``mscan-rep_converter.py`` — fine-tuned re-parameterized ckpts
  (``rep_conv`` -> ``sd_convs``), ``--arch mscan-rep`` (or plain ``mscan`` —
  both key styles are recognized);
* generic AlexNet/VGG torchvision-style ckpts (``--arch alexnet|vgg`` or
  ``--first-fc-shape`` apply the first-FC CHW->HWC flatten permutation).

Weight-layout mapping: conv OIHW -> HWIO transpose; linear (out, in) ->
(in, out) transpose; the first linear after flatten additionally permutes its
input dim from CHW to HWC order.
"""

import argparse
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))))

from convnet_approximater_tpu.utils.serialize import save_model, unflatten_tree


def load_torch_state_dict(path):
    import torch

    ckpt = torch.load(path, map_location="cpu", weights_only=False)
    if isinstance(ckpt, dict):
        for key in ("state_dict", "model", "model_state"):
            if key in ckpt:
                ckpt = ckpt[key]
                break
    return {k: v.numpy() if hasattr(v, "numpy") else np.asarray(v) for k, v in ckpt.items()}


def convert_conv(w):
    return np.transpose(w, (2, 3, 1, 0))  # OIHW -> HWIO


def convert_linear(w, first_after_flatten=None):
    """(out, in) -> (in, out); if first_after_flatten=(C, H, W), permute the
    input dim from torch's CHW-major flatten to our HWC-major flatten."""
    if first_after_flatten is not None:
        C, H, W = first_after_flatten
        out = w.shape[0]
        w = w.reshape(out, C, H, W).transpose(0, 2, 3, 1).reshape(out, C * H * W)
    return np.transpose(w, (1, 0))


# -- MSCAN (SegNeXt) name map ----------------------------------------------

def _mscan_rename(key: str) -> str:
    """Map official SegNeXt MSCAN param names to our dotted module paths.

    Prefix-anchored like the reference's converters (ref
    ``scripts/ckpt_converter/mscan_converter.py:59-98`` splits on '.' and
    dispatches on the FIRST segment) — a bare ``str.replace`` would corrupt
    block-internal norms, e.g. ``block1.0.norm1.weight`` must keep its inner
    ``norm1`` while the stage-level ``norm1.weight`` becomes ``layers.0.2``.

    Also covers the reference's ``mscan-rep_converter.py:76-84``: fine-tuned
    re-parameterized checkpoints name the substituted module ``rep_conv``;
    the deployed model names it ``sd_convs`` (child names ``conv1``/``conv2``
    / ``branches.{i}`` are identical between the two frameworks).
    """
    parts = key.split(".")
    if parts and parts[0] == "backbone":
        parts = parts[1:]
    head = parts[0]
    for i in range(4):
        if head == f"patch_embed{i + 1}":
            parts = ["layers", str(i), "0"] + parts[1:]
            break
        if head == f"block{i + 1}":
            parts = ["layers", str(i), "1"] + parts[1:]
            break
        if head == f"norm{i + 1}":
            parts = ["layers", str(i), "2"] + parts[1:]
            break
    else:
        if head == "head":
            return key
    # MSCA inner convs (only directly under spatial_gating_unit): official
    # names conv{b}_{s} (branch b of k=7/11/21, stage s in {1,2}), conv3 =
    # channel_mix, rep_conv = fine-tuned substituted bank -> sd_convs.
    out = []
    j = 0
    while j < len(parts):
        seg = parts[j]
        prev = out[-1] if out else None
        if prev == "spatial_gating_unit":
            if seg == "conv3":
                out.append("channel_mix")
            elif seg == "rep_conv":
                out.append("sd_convs")
            elif len(seg) == 7 and seg.startswith("conv") and seg[5] == "_":
                out += ["sd_convs", "branches", seg[4], f"conv{seg[6]}"]
            else:
                out.append(seg)
        elif seg == "dwconv" and j + 1 < len(parts) and parts[j + 1] == "dwconv":
            out.append("dconv")
            j += 1  # collapse mlp.dwconv.dwconv -> mlp.dconv
        else:
            out.append(seg)
        j += 1
    return "backbone." + ".".join(out)


def convert_state_dict(sd, arch: str, first_fc_shape=None):
    """Returns the nested {'params': ..., 'state': ...} tree.

    ``first_fc_shape=(C, H, W)``: pre-flatten feature shape; the FIRST linear
    weight encountered gets its input dim permuted from torch's CHW-major
    flatten order to our NHWC flatten order (see :func:`convert_linear`).
    """
    flat_params = {}
    flat_state = {}
    for key, v in sd.items():
        if arch == "mscan":
            key = _mscan_rename(key)
        elif arch == "convnext" and key.endswith(".gamma"):
            # official ConvNeXt keeps the layer scale as a bare tensor
            # (``stages.s.i.gamma``); ours is a LayerScale leaf module
            # (``...gamma.gamma``) — everything else maps generically
            key += ".gamma"
        path, leaf = key.rsplit(".", 1)
        path = path.replace(".", "/")
        if leaf == "weight" and v.ndim == 4:
            flat_params[f"{path}/weight"] = convert_conv(v)
        elif leaf == "weight" and v.ndim == 2:
            if first_fc_shape is not None and v.shape[1] == int(np.prod(first_fc_shape)):
                flat_params[f"{path}/weight"] = convert_linear(v, first_fc_shape)
                first_fc_shape = None  # only the first FC sits after the flatten
            else:
                flat_params[f"{path}/weight"] = convert_linear(v)
        elif leaf == "weight" and v.ndim == 1:  # norm scale
            flat_params[f"{path}/scale"] = v
        elif leaf == "bias":
            flat_params[f"{path}/bias"] = v
        elif leaf == "running_mean":
            flat_state[f"{path}/mean"] = v
        elif leaf == "running_var":
            flat_state[f"{path}/var"] = v
        elif leaf in ("num_batches_tracked",):
            continue
        elif leaf in ("layer_scale_1", "layer_scale_2"):
            flat_params[f"{path}/{leaf}"] = v
        else:
            flat_params[f"{path}/{leaf}"] = v
    return {"params": unflatten_tree(flat_params), "state": unflatten_tree(flat_state)}


# pre-flatten feature-map shapes (C, H, W) per arch — the first classifier
# Linear after Flatten needs its input dim permuted CHW -> HWC.
_FIRST_FC_SHAPES = {"alexnet": (256, 6, 6), "vgg": (512, 7, 7)}


def main():
    p = argparse.ArgumentParser()
    p.add_argument("src", help="torch checkpoint (.pth)")
    p.add_argument("dst", help="output .ckpt.npz")
    p.add_argument("--arch", choices=("generic", "alexnet", "vgg", "mscan",
                                      "mscan-rep", "convnext"),
                   default="generic",
                   help="mscan covers both original and fine-tuned re-parameterized "
                        "(rep_conv) checkpoints; mscan-rep is an alias. alexnet/vgg "
                        "apply the CHW->HWC first-FC permutation automatically. "
                        "convnext maps the bare layer-scale gamma tensors.")
    p.add_argument("--first-fc-shape", type=int, nargs=3, metavar=("C", "H", "W"),
                   default=None,
                   help="pre-flatten feature shape for generic archs whose first "
                        "Linear follows a Flatten (overrides the arch preset)")
    args = p.parse_args()
    arch = "mscan" if args.arch == "mscan-rep" else args.arch
    first_fc = tuple(args.first_fc_shape) if args.first_fc_shape else \
        _FIRST_FC_SHAPES.get(arch)
    sd = load_torch_state_dict(args.src)
    tree = convert_state_dict(sd, arch if arch in ("mscan", "convnext") else "generic",
                              first_fc_shape=first_fc)
    save_model(tree, args.dst)
    print(f"wrote {args.dst}")


if __name__ == "__main__":
    main()
