#!/usr/bin/env python
"""One-command serving export: config + checkpoint -> StableHLO artifact.

Builds the approximated model in deploy mode, applies the serving surface
stack in the canonical order (doc/serving.md: never-lose arbitration ->
BN fold -> dtype cast -> int8 PTQ), AOT-exports the forward with
``deploy.export_serving``, and verifies the artifact reproduces the live
forward before writing it.

Usage:
  python scripts/export_model.py --config <cfg> --checkpoint <ckpt.npz> \
      --out model.stablehlo [--batch 64] [--dtype bfloat16] \
      [--quantize int8] [--never-lose] [--platform cpu]

The artifact replays with ``deploy.load_serving(path)(params, x)``; the
matching params are saved next to it as ``<out>.params.npz``.
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--config", required=True)
    ap.add_argument("--checkpoint", default=None,
                    help="omit for a random-init artifact (perf/serving "
                         "demos only — logged loudly)")
    ap.add_argument("--out", required=True)
    ap.add_argument("--batch", type=int, default=64)
    ap.add_argument("--dtype", default="bfloat16")
    ap.add_argument("--input-size", type=int, nargs=3, default=(224, 224, 3))
    ap.add_argument("--quantize", default=None, choices=["int8", "int8-qat"],
                    help="int8: PTQ with synthetic calibration; int8-qat: "
                         "the checkpoint is a QAT fine-tune (saved from a "
                         "PrepareQAT-hook / demo_experiment --int8-qat run) "
                         "and its learned observer scales are converted "
                         "directly; BN stays live (as trained)")
    ap.add_argument("--qat-no-linears", action="store_true",
                    help="the QAT run used PrepareQAT(linears=False) — "
                         "replay the same conv-only selection")
    ap.add_argument("--qat-include-substituted", action="store_true",
                    help="the QAT run used include_substituted=True")
    ap.add_argument("--qat-folded-bn", action="store_true",
                    help="the QAT run folded BN BEFORE prepare_qat "
                         "(demo_experiment --int8-qat style) — replay the "
                         "fold pre-load; the config-wired PrepareQAT hook "
                         "trains with BN live (default replay)")
    ap.add_argument("--never-lose", action="store_true")
    ap.add_argument("--no-fold-bn", action="store_true")
    ap.add_argument("--symbolic-batch", action="store_true",
                    help="export with a symbolic leading dim: one artifact "
                         "serves any batch size")
    ap.add_argument("--platforms", default=None,
                    help="comma-separated lowering platforms for a portable "
                         "artifact, e.g. 'tpu,cpu' (default: current backend)")
    ap.add_argument("--platform", default=None)
    ap.add_argument("--norm-mean", type=float, nargs=3,
                    default=(0.485, 0.456, 0.406),
                    help="preprocessing mean recorded in the .meta.json "
                         "sidecar (the artifact itself expects normalized "
                         "inputs; servers read this to normalize raw bytes)")
    ap.add_argument("--norm-std", type=float, nargs=3,
                    default=(0.229, 0.224, 0.225))
    args = ap.parse_args()

    if args.platform:
        import jax

        jax.config.update("jax_platforms", args.platform)
    import jax
    import jax.numpy as jnp

    from convnet_approximater_tpu.core import build_app
    from convnet_approximater_tpu.deploy import (
        export_serving,
        fold_batchnorm,
        never_lose_deploy,
        quantize_int8,
    )
    from convnet_approximater_tpu.filters import build_filter
    from convnet_approximater_tpu.layers.substitution import Substitution  # noqa
    from convnet_approximater_tpu.models import build_model
    from convnet_approximater_tpu.utils import (
        build_logger, cast_floating, get_cfg, init_cfg, update_cfg,
    )
    from convnet_approximater_tpu.utils.serialize import (
        load_model, save_model, tree_get,
    )

    logger = build_logger()
    init_cfg(args.config)
    if args.checkpoint:
        update_cfg(checkpoint=args.checkpoint)
    cfg = get_cfg()
    dtype = jnp.dtype(args.dtype)
    rng = jax.random.key(cfg.seed or 0)

    # deploy-mode build: bare target layers at the substituted sites
    app = build_app(cfg.app, deploy=True)
    filters = [build_filter(f) for f in cfg.filters] if cfg.filters else []
    model = build_model(cfg.model)
    model.register_switchable(app.src_type, filters)
    variables = {"params": model.init(rng), "state": model.init_state()}
    if cfg.structure_passes:
        # replay config-declared structure rewrites (Runner order: before
        # the app pipeline) so checkpoints of e.g. chain-pruned models
        # load into matching shapes
        import convnet_approximater_tpu.deploy as deploy_mod

        for p in cfg.structure_passes:
            p = dict(p)
            fn = getattr(deploy_mod, p.pop("fn"))
            n = fn(model, variables, **p)
            logger.info(f"structure pass {fn.__name__}: {n} sites")
    from convnet_approximater_tpu.nn.module import _stable_fold

    for idx in range(model.length_switchable):
        name = model.switchable_names[idx]
        src = model.get_switchable_module(idx)
        # per-site rng fold (matches ClassInference): a shared key would
        # give identical weights to same-shaped sites in random-init
        # artifacts, and XLA may CSE identical constants — skewing timings
        tgt, tgt_params = app.initialize(
            src, tree_get(variables["params"], name), _stable_fold(rng, name))
        model.set_switchable_module(idx, tgt, variables, {"params": tgt_params})
    qat = args.quantize == "int8-qat"
    if qat:
        # Replay the PrepareQAT hook's structural pass EXACTLY (the
        # checkpoint's keys correspond to the QAT-prepared tree, incl. the
        # learned state/.../act_absmax observers): NO BN fold — the hook
        # trains with BN live, so the fake-quant numerics the fine-tune
        # optimized include the f32 BN after each int8 conv — and the same
        # Substitution-branch exclusion + linears selection as training.
        from convnet_approximater_tpu.deploy import (
            convert_qat_to_int8, prepare_qat, qat_substitution_filter)

        if args.never_lose:
            raise SystemExit("--never-lose is a dense-vs-decomposed arbiter; "
                             "it does not compose with --quantize int8-qat")
        if not args.checkpoint:
            raise SystemExit("--quantize int8-qat needs a QAT fine-tune "
                             "checkpoint (the observers are learned, not "
                             "calibrated); use --quantize int8 for random-"
                             "init demo artifacts")
        if args.qat_folded_bn and not args.no_fold_bn:
            n = fold_batchnorm(model, variables)
            logger.info(f"fold_batchnorm: {n} pairs (pre-QAT, replaying the "
                        f"demo_experiment-style fold->prepare_qat flow)")
        filter_fn = (None if args.qat_include_substituted
                     else qat_substitution_filter(model))
        nq = prepare_qat(model, variables, filter_fn=filter_fn,
                         linears=not args.qat_no_linears)
        # strict: the replayed structure MUST match the checkpoint — a
        # flow mismatch (wrong --qat-* flags vs how the run was trained)
        # would otherwise silently keep random-init BN/observer leaves
        try:
            variables = load_model(variables, args.checkpoint, strict=True)
        except ValueError as e:
            raise SystemExit(
                f"{e}\nthe --qat-* replay flags must match the training "
                f"run: --qat-folded-bn if it folded BN before prepare_qat "
                f"(demo_experiment --int8-qat), --qat-no-linears / "
                f"--qat-include-substituted to mirror PrepareQAT's "
                f"settings") from e
    elif args.checkpoint:
        variables = load_model(variables, args.checkpoint)
    else:
        logger.warning("no --checkpoint: exporting RANDOM-INIT weights "
                       "(perf/serving demo artifact, not a trained model)")

    shape = (args.batch,) + tuple(args.input_size)
    if args.never_lose:
        res = never_lose_deploy(model, variables, shape, dtype=dtype)
        logger.info(f"never-lose: {res['kept_decomposed']}/"
                    f"{len(res['layers'])} kept decomposed")
    if not args.no_fold_bn and not qat:
        n = fold_batchnorm(model, variables)
        logger.info(f"fold_batchnorm: {n} pairs")
    if dtype != jnp.float32:
        variables = {"params": cast_floating(variables["params"], dtype),
                     "state": variables.get("state", {})}
    if qat:
        nconv = convert_qat_to_int8(model, variables)
        logger.info(f"convert_qat_to_int8: {nconv}/{nq} modules (learned "
                    f"observer scales)")
    if args.quantize == "int8":
        calib = [jax.random.normal(jax.random.fold_in(rng, i),
                                   (8,) + tuple(args.input_size)).astype(dtype)
                 for i in range(4)]
        nq = quantize_int8(model, variables, calib)
        logger.info(f"quantize_int8: {nq} modules (synthetic calibration — "
                    f"pass real batches through deploy.quantize_int8 for "
                    f"accuracy-grade scales)")

    params, state = variables["params"], variables.get("state", {})

    def fwd(p, x):
        y, _, _ = model.apply(p, x, state=state, training=False)
        return y

    x = jax.random.normal(rng, shape).astype(dtype)
    platforms = tuple(args.platforms.split(",")) if args.platforms else None
    export_serving(fwd, (params, x), path=args.out,
                   symbolic_batch=args.symbolic_batch, platforms=platforms)
    from convnet_approximater_tpu.deploy import load_serving

    y_live = fwd(params, x)
    y_art = load_serving(args.out)(params, x)
    err = float(jnp.max(jnp.abs(y_art.astype(jnp.float32)
                                - y_live.astype(jnp.float32))))
    assert err < 1e-3, f"artifact mismatch: {err}"
    save_model(variables, args.out + ".params.npz")
    # preprocessing contract sidecar (ADVICE r3): the aval records only
    # shape/dtype — record what the inputs MEAN so serve.py can't silently
    # feed an artifact trained under different normalization
    import json

    with open(args.out + ".meta.json", "w") as f:
        json.dump({"preprocessing": "normalized",
                   "note": "inputs are mean/std-normalized NHWC float; "
                           "--ship-uint8 servers must apply the recorded "
                           "mean/std before the artifact",
                   "mean": list(args.norm_mean), "std": list(args.norm_std),
                   "quantize": args.quantize, "dtype": dtype.name}, f)
    logger.info(f"exported {args.out} (+ .params.npz), artifact max err "
                f"{err:.2e} vs live forward, batch {args.batch}, "
                f"dtype {dtype.name}")


if __name__ == "__main__":
    main()
