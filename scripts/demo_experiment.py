#!/usr/bin/env python
"""End-to-end experiment protocol demo (the reference's headline experiment
table, `doc/low-rank-exp/low-rank-exp.md:39-49`, in miniature).

Runs the full scientific loop on a self-contained dataset (synthetic by
default; point --dataset/--data-root at CIFAR-10 for the real protocol):

1. train a baseline model to convergence           -> top-1(base)
2. scheme-1 decompose (SVD, per-layer bases)       -> top-1(approx), MACs
3. L2-reconstruction fine-tune (teacher = original)-> top-1(L2)
4. CE fine-tune                                    -> top-1(L2->CE)

and prints the resulting table.  Every stage goes through the same public
pipeline pieces (TrainHelper, Runner, L2Reconstruct) a real experiment uses.
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--model", default="AlexNet")
    ap.add_argument("--num-classes", type=int, default=10)
    ap.add_argument("--image-size", type=int, nargs=2, default=(64, 64))
    ap.add_argument("--num-bases", type=int, nargs="+", default=[8, 8, 6, 4])
    ap.add_argument("--indices", type=int, nargs="+", default=[2, 3, 4, 5])
    ap.add_argument("--train-epochs", type=int, default=30)
    ap.add_argument("--ft-epochs", type=int, default=5)
    ap.add_argument("--batch-size", type=int, default=32)
    ap.add_argument("--samples", type=int, default=512)
    ap.add_argument("--dataset", default=None)
    ap.add_argument("--data-root", default=None)
    ap.add_argument("--platform", default=None)
    ap.add_argument("--work-dir", default="work_dirs/demo_experiment")
    args = ap.parse_args()
    if args.platform:
        os.environ["JAX_PLATFORMS"] = args.platform

    import jax

    if args.platform:
        jax.config.update("jax_platforms", args.platform)

    from convnet_approximater_tpu.classification import TrainHelper, ValidateHelper
    from convnet_approximater_tpu.hooks.model_analysis import analyze_model
    from convnet_approximater_tpu.runner import Runner
    from convnet_approximater_tpu.utils import (
        build_logger, get_cfg, init_cfg, save_model, update_cfg,
    )

    build_logger()
    os.makedirs(args.work_dir, exist_ok=True)
    size = tuple(args.image_size)
    ds_cfg = (dict(type=args.dataset, root=args.data_root) if args.dataset
              else dict(type="Synthetic", num_samples=args.samples,
                        image_size=size + (3,), num_classes=args.num_classes,
                        signal=0.8))

    # The synthetic dataset carries a per-class signal shared across splits,
    # so held-out evaluation is meaningful even without external data.
    eval_split = "validation"

    def evaluate(model, variables, tag):
        res = ValidateHelper(model, dict(batch_size=args.batch_size,
                                         input_size=size + (3,),
                                         num_classes=args.num_classes,
                                         dataset=ds_cfg, split=eval_split,
                                         log_freq=10**9), variables).validate()
        info = analyze_model(model, variables, (1,) + size + (3,))
        return dict(tag=tag, top1=res["top1"], macs=info["macs"] / 1e6,
                    params=info["params"] / 1e6)

    rows = []

    # --- 1. baseline training -------------------------------------------
    from convnet_approximater_tpu.models import build_model

    model = build_model(dict(type=args.model, num_classes=args.num_classes))
    variables = {"params": model.init(jax.random.key(0)), "state": model.init_state()}
    TrainHelper(model, variables, dict(
        dataset=ds_cfg, num_classes=args.num_classes, epochs=args.train_epochs,
        batch_size=args.batch_size, lr=1e-3, image_size=size,
        work_dir=os.path.join(args.work_dir, "baseline"), log_interval=10**9,
    )).train()
    base_ckpt = os.path.join(args.work_dir, "baseline", "model_best.ckpt.npz")
    rows.append(evaluate(model, variables, "original"))

    # --- 2-4: pipeline configs ------------------------------------------
    def pipeline(hooks_py, tag):
        cfg = os.path.join(args.work_dir, f"cfg_{tag}.py")
        with open(cfg, "w") as f:
            f.write(f"""
model = dict(type="{args.model}", num_classes={args.num_classes},
             init_cfg=r"{base_ckpt}")
app = dict(type="LowRankExpV1", max_iter=0, min_lmda=0, max_lmda=0,
           init_method="svd", lmda_length=1,
           num_bases={tuple(args.num_bases)}, do_decomp=True)
filters = [dict(type="SimpleConvFilter"),
           dict(type="IndicesFilter", indices={tuple(args.indices)})]
hooks = {hooks_py}
""")
        init_cfg(cfg)
        update_cfg(work_dir=os.path.join(args.work_dir, tag), config_name=tag, seed=0)
        runner = Runner()
        runner.run()
        rows.append(evaluate(runner.model, runner.variables, tag))

    ft_common = f"""
        dataset_args=dict(dataset={ds_cfg!r}, batch_size={args.batch_size}),
        data_config=dict(image_size={size}),
        optim_args=dict(opt="adamw", lr=1e-4, weight_decay=0.01),
        sche_args=dict(epochs={args.ft_epochs}),
        other_args=dict(num_classes={args.num_classes}, log_interval=10**9),
"""
    pipeline("[]", "approx_svd")
    pipeline(f"""[dict(type="L2Reconstruct", priority=50, asym=True,
        l2_weight=1.0, cls_weight=0.0,{ft_common})]""", "approx_l2ft")
    pipeline(f"""[dict(type="L2Reconstruct", priority=50, asym=True, no_norm=True,
        l2_weight=0.0, cls_weight=1.0,{ft_common})]""", "approx_ceft")

    # --- table ------------------------------------------------------------
    print("\n=== experiment table (cf. reference doc/low-rank-exp table) ===")
    print(f"{'config':<14} | {'top-1 %':>8} | {'MACs (M)':>9} | {'params (M)':>10}")
    print("-" * 52)
    for r in rows:
        print(f"{r['tag']:<14} | {r['top1']:8.2f} | {r['macs']:9.1f} | {r['params']:10.2f}")


if __name__ == "__main__":
    main()
