#!/usr/bin/env python
"""Convert torch checkpoints (reference format: ``{'state_dict': ...}``
pickles, NCHW/OIHW) into this framework's flat-npz NHWC/HWIO checkpoints.

Covers the roles of the reference's ``scripts/ckpt_converter/`` suite:

* ``mscan_converter.py`` — official SegNeXt MSCAN ckpts -> our MSCAN naming
  (``patch_embed``->``layers.i.0``, ``block``->``layers.i.1.j``, strip-conv
  pairs -> ``sd_convs.branches.b.convS``);
* generic AlexNet/VGG torchvision-style ckpts.

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
    """Map official SegNeXt MSCAN param names to our dotted module paths."""
    k = key
    k = k.replace("backbone.", "")
    for i in range(4):
        k = k.replace(f"patch_embed{i + 1}.", f"layers.{i}.0.")
        k = k.replace(f"block{i + 1}.", f"layers.{i}.1.")
        k = k.replace(f"norm{i + 1}.", f"layers.{i}.2.")
    # MSCA inner convs: official names conv0_1/conv0_2 (k=7), conv1_1/conv1_2
    # (k=11), conv2_1/conv2_2 (k=21), conv3 = channel_mix
    k = k.replace("spatial_gating_unit.conv0_1", "spatial_gating_unit.sd_convs.branches.0.conv1")
    k = k.replace("spatial_gating_unit.conv0_2", "spatial_gating_unit.sd_convs.branches.0.conv2")
    k = k.replace("spatial_gating_unit.conv1_1", "spatial_gating_unit.sd_convs.branches.1.conv1")
    k = k.replace("spatial_gating_unit.conv1_2", "spatial_gating_unit.sd_convs.branches.1.conv2")
    k = k.replace("spatial_gating_unit.conv2_1", "spatial_gating_unit.sd_convs.branches.2.conv1")
    k = k.replace("spatial_gating_unit.conv2_2", "spatial_gating_unit.sd_convs.branches.2.conv2")
    k = k.replace("spatial_gating_unit.conv3", "spatial_gating_unit.channel_mix")
    k = k.replace("spatial_gating_unit.conv0.", "spatial_gating_unit.conv0.")
    k = k.replace("mlp.fc1", "mlp.fc1").replace("mlp.dwconv.dwconv", "mlp.dconv")
    k = k.replace("head.", "head.")
    return "backbone." + k if not k.startswith("head") else k


def convert_state_dict(sd, arch: str):
    """Returns the nested {'params': ..., 'state': ...} tree."""
    flat_params = {}
    flat_state = {}
    for key, v in sd.items():
        if arch == "mscan":
            key = _mscan_rename(key)
        path, leaf = key.rsplit(".", 1)
        path = path.replace(".", "/")
        if leaf == "weight" and v.ndim == 4:
            flat_params[f"{path}/weight"] = convert_conv(v)
        elif leaf == "weight" and v.ndim == 2:
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


def main():
    p = argparse.ArgumentParser()
    p.add_argument("src", help="torch checkpoint (.pth)")
    p.add_argument("dst", help="output .ckpt.npz")
    p.add_argument("--arch", choices=("generic", "mscan"), default="generic")
    args = p.parse_args()
    sd = load_torch_state_dict(args.src)
    tree = convert_state_dict(sd, args.arch)
    save_model(tree, args.dst)
    print(f"wrote {args.dst}")


if __name__ == "__main__":
    main()
