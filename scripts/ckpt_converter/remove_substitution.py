#!/usr/bin/env python
"""Unwrap Substitution-wrapped checkpoints back to the flat key space
(reference ``scripts/ckpt_converter/remove_substitution.py:12-38``): keys
under ``<path>/new`` (or ``/old``) collapse onto ``<path>``; the other branch
is dropped."""

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))))

from convnet_approximater_tpu.utils.serialize import (
    flatten_tree,
    load_ckpt,
    save_model,
    unflatten_tree,
)


def remove_substitution(tree: dict, keep_branch: str = "new"):
    flat = flatten_tree(tree)
    out = {}
    drop = "old" if keep_branch == "new" else "new"
    for key, v in flat.items():
        if f"/{drop}/" in key:
            continue
        out[key.replace(f"/{keep_branch}/", "/")] = v
    return unflatten_tree(out)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("src")
    ap.add_argument("dst")
    ap.add_argument("--keep", default="new", choices=("new", "old"))
    args = ap.parse_args()
    save_model(remove_substitution(load_ckpt(args.src), args.keep), args.dst)
    print(f"wrote {args.dst}")


if __name__ == "__main__":
    main()
