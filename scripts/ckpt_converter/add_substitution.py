#!/usr/bin/env python
"""Re-wrap a flat (post-postprocess) checkpoint into the Substitution-wrapped
key space (reference ``scripts/ckpt_converter/add_substitution.py:13-40``):
for every switchable path the subtree moves under ``<path>/new`` (and
optionally duplicates under ``<path>/old``) so a deploy=False pipeline can
load it mid-lifecycle."""

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


def add_substitution(tree: dict, switchable_paths, branch: str = "new", keep_other: bool = False):
    flat = flatten_tree(tree)
    out = {}
    prefixes = [p.replace(".", "/") for p in switchable_paths]
    for key, v in flat.items():
        matched = None
        for p in prefixes:
            if key.startswith("params/" + p + "/") or key.startswith("state/" + p + "/"):
                matched = p
                break
        if matched is None:
            out[key] = v
            continue
        head, rest = key.split(matched + "/", 1)
        out[f"{head}{matched}/{branch}/{rest}"] = v
        if keep_other:
            other = "old" if branch == "new" else "new"
            out[f"{head}{matched}/{other}/{rest}"] = v
    return unflatten_tree(out)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("src")
    ap.add_argument("dst")
    ap.add_argument("--paths", nargs="+", required=True, help="switchable dotted paths")
    ap.add_argument("--branch", default="new", choices=("new", "old"))
    args = ap.parse_args()
    save_model(add_substitution(load_ckpt(args.src), args.paths, args.branch), args.dst)
    print(f"wrote {args.dst}")


if __name__ == "__main__":
    main()
