#!/usr/bin/env python
"""One-command serving planner: dense config + checkpoint -> the fastest
accurate serving surface, chosen by measurement.

Runs ``deploy_planner.plan_serving`` over the model the config names:
builds each applicable candidate surface (dense bf16, int8 PTQ, V3
channel-rank, DwSepRep, the disjoint DwSepRep+int8 stack), times them
like-for-like on the current backend, gates rewritten surfaces on top-1
agreement with the dense f32 reference, and writes the decision table to
``<out>`` (default ``serving_plan.json``).

The winner can then be exported with ``scripts/export_model.py`` using the
matching flags (the plan's row names map 1:1: ``int8`` -> ``--quantize
int8``; ``v3``/``dwsep`` -> the corresponding app config).

Usage:
  python scripts/plan_serving.py --config <cfg> [--checkpoint ckpt.npz] \
      [--batch 64] [--dtype bfloat16] [--min-agree 0.9] [--out plan.json]
"""

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--config", required=True,
                    help="any config with a `model` key (the app/filters "
                         "keys are ignored — planning starts from the "
                         "dense model)")
    ap.add_argument("--checkpoint", default=None)
    ap.add_argument("--batch", type=int, default=64)
    ap.add_argument("--input-size", type=int, nargs=3, default=(224, 224, 3))
    ap.add_argument("--dtype", default="bfloat16")
    ap.add_argument("--min-agree", type=float, default=0.9)
    ap.add_argument("--v3-energy", type=float, default=0.9)
    ap.add_argument("--out", default="serving_plan.json")
    ap.add_argument("--export", default=None, metavar="ARTIFACT",
                    help="also export the WINNING surface as a verified "
                         "StableHLO artifact (+ .params.npz / .meta.json "
                         "sidecars, same layout as export_model.py)")
    ap.add_argument("--norm-mean", type=float, nargs=3,
                    default=(0.485, 0.456, 0.406),
                    help="preprocessing mean recorded in the .meta.json "
                         "sidecar (serve.py --ship-uint8 reads it)")
    ap.add_argument("--norm-std", type=float, nargs=3,
                    default=(0.229, 0.224, 0.225))
    ap.add_argument("--platform", default=None)
    args = ap.parse_args()

    if args.platform:
        import jax

        jax.config.update("jax_platforms", args.platform)
    import jax
    import jax.numpy as jnp

    from convnet_approximater_tpu.deploy_planner import (
        default_candidates, plan_serving, plan_to_json)
    from convnet_approximater_tpu.models import build_model
    from convnet_approximater_tpu.utils import (
        build_logger, get_cfg, init_cfg, load_model)

    logger = build_logger()
    init_cfg(args.config)
    cfg = get_cfg()
    rng = jax.random.key(cfg.seed or 0)
    dtype = jnp.dtype(args.dtype)

    def make():
        model = build_model(cfg.model)
        variables = {"params": model.init(rng), "state": model.init_state()}
        variables = model.init_weights(variables)
        if args.checkpoint:
            variables = load_model(variables, args.checkpoint)
        return model, variables

    if not args.checkpoint:
        logger.warning("no --checkpoint: planning over RANDOM-INIT weights "
                       "(timings are valid; the agreement gate is not "
                       "accuracy-grade without a trained model)")

    probe, _ = make()
    # input_shape matters: the MSCA-rep candidate's arbitrated FfnRep
    # decisions flip with batch/shape (stage wins are shape-dependent —
    # doc/perf-notes.md), so arbitrate at the SERVING shape, not the
    # calibration batch
    cands = default_candidates(probe, dtype=dtype, v3_energy=args.v3_energy,
                               input_shape=(args.batch,)
                               + tuple(args.input_size))
    plan = plan_serving(make, (args.batch,) + tuple(args.input_size),
                        dtype=dtype, candidates=cands,
                        min_agree=args.min_agree, rng=rng)

    logger.info(f"{'surface':<24}{'ms':>10}{'img/s':>10}{'agree':>8}  note")
    for r in plan["report"]:
        ms = f"{r['ms']:.3f}" if r["ms"] is not None else "-"
        ips = f"{r['img_per_s']:.0f}" if r["img_per_s"] else "-"
        ag = f"{r['agree']:.3f}" if r["agree"] is not None else "-"
        logger.info(f"{r['name']:<24}{ms:>10}{ips:>10}{ag:>8}  {r['note']}")
    logger.info(f"winner: {plan['winner']} "
                f"({plan['speedup_vs_dense']:.3f}x vs dense/{plan['dtype']})")

    with open(args.out, "w") as f:
        json.dump(plan_to_json(plan), f, indent=2)
    logger.info(f"plan -> {args.out}")

    if args.export:
        from convnet_approximater_tpu.deploy import (
            export_serving, load_serving)
        from convnet_approximater_tpu.utils import save_model

        model, variables = plan["model"], plan["variables"]
        params, state = variables["params"], variables.get("state", {})

        def fwd(p, x):
            y, _, _ = model.apply(p, x, state=state, training=False)
            return y

        x = jax.random.normal(rng, (args.batch,) + tuple(args.input_size)
                              ).astype(dtype)
        export_serving(fwd, (params, x), path=args.export)
        y_live = jax.jit(fwd)(params, x).astype(jnp.float32)
        y_art = load_serving(args.export)(params, x).astype(jnp.float32)
        # relative-norm gate: low-precision surfaces (bf16/int8) differ from
        # the live forward by ULPs under different fusion orders
        err = float(jnp.linalg.norm(y_art - y_live)
                    / (jnp.linalg.norm(y_live) + 1e-12))
        assert err < 1e-2, f"artifact mismatch: rel {err}"
        save_model(variables, args.export + ".params.npz")
        with open(args.export + ".meta.json", "w") as f:
            json.dump({"preprocessing": "normalized",
                       "mean": list(args.norm_mean),
                       "std": list(args.norm_std),
                       "surface": plan["winner"], "dtype": plan["dtype"],
                       "speedup_vs_dense": plan["speedup_vs_dense"]}, f)
        logger.info(f"winner '{plan['winner']}' exported -> {args.export} "
                    f"(artifact max err {err:.2e})")


if __name__ == "__main__":
    main()
