#!/usr/bin/env python
"""Standalone deploy-mode comparator (reference
``scripts/low_rank_exp_inference.py:37-117``): profile + FLOP-count + evaluate
the original, approximated, and post-decomp models side by side."""

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--config", required=True)
    ap.add_argument("--checkpoint", required=True)
    ap.add_argument("--batch", type=int, default=16)
    ap.add_argument("--decomp", action="store_true", help="also measure after decomp()")
    ap.add_argument("--never-lose", action="store_true",
                    help="per-layer deploy arbiter: re-materialize dense "
                         "kernels wherever decomposition loses wall-clock")
    ap.add_argument("--eval-dataset", default=None, help="DATASET registry type, e.g. CIFAR10")
    ap.add_argument("--dtype", default="float32",
                    help="serving dtype (bfloat16 = measured best surface)")
    ap.add_argument("--quantize", default=None, choices=["int8"],
                    help="PTQ the approximated surface after the BN fold "
                         "(measured: wins on dense-conv families, "
                         "doc/perf-notes.md)")
    ap.add_argument("--eval-root", default=None)
    ap.add_argument("--platform", default=None,
                    help="force a jax backend (e.g. cpu) — env vars alone "
                         "are overridden by the container's platform pin")
    args = ap.parse_args()

    if args.platform:
        import jax

        jax.config.update("jax_platforms", args.platform)

    from convnet_approximater_tpu.runner import ClassInference
    from convnet_approximater_tpu.utils import build_logger, init_cfg, update_cfg

    build_logger()
    init_cfg(args.config)
    update_cfg(checkpoint=args.checkpoint)
    eval_cfg = None
    if args.eval_dataset:
        eval_cfg = dict(
            dataset=dict(type=args.eval_dataset, root=args.eval_root),
            batch_size=args.batch,
            input_size=(224, 224, 3),
        )
    ClassInference(
        checkpoint=args.checkpoint,
        batch_size=args.batch,
        do_decomp=args.decomp,
        eval_cfg=eval_cfg,
        never_lose=args.never_lose,
        dtype=args.dtype,
        quantize=args.quantize,
    ).run()


if __name__ == "__main__":
    main()
