#!/usr/bin/env python
"""Training-path payoff of the width-prune family (VERDICT r4 #7).

The emitted recovery chains (plan_serving --emit-recovery) fine-tune the
PRUNED structure — so the width cut pays twice: at serving AND during
the recovery training itself.  This measures the full CE+AdamW train
step (fwd+bwd+update) dense vs pruned, f32 and amp, with approximate
train-step MFU (3x forward FLOPs / step time — the standard fwd+bwd
estimate) next to the serving MFU bench.py reports:

  ResNet-18: dense vs trunk+chain keep=0.5 (round_to=64)
  MSCAN-t:   dense vs the quad width cut (deploy.prune_width 0.5) —
             the structure the quad-record recovery chain trains

Usage: python scripts/exp_train_pruned.py [--model resnet18|mscan|all]
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update("jax_compilation_cache_dir", os.path.expanduser("~/.cat_jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

from bench import B, KEY, log  # noqa: F401 (B/KEY used by exp_train_models)
from exp_train_models import bench as _bench
from convnet_approximater_tpu.deploy import (prune_chains, prune_trunks,
                                             prune_width)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--model", default="all",
                    choices=["resnet18", "mscan", "all"])
    args = ap.parse_args()
    log(f"devices: {jax.devices()}")

    if args.model in ("resnet18", "all"):
        from convnet_approximater_tpu.models import ResNet

        def dense():
            m = ResNet(depth=18, num_classes=1000)
            return m, {"params": m.init(KEY), "state": m.init_state()}

        def pruned():
            m, var = dense()
            prune_trunks(m, var, keep_ratio=0.5, round_to=64)
            prune_chains(m, var, keep_ratio=0.5, round_to=64)
            return m, var

        td = _bench("ResNet-18 dense", dense, mfu=True)
        tp = _bench("ResNet-18 trunk+chain 0.5", pruned, mfu=True)
        for tag in td:
            log(f"  -> R18 {tag} train speedup {td[tag] / tp[tag]:.2f}x")

    if args.model in ("mscan", "all"):
        from convnet_approximater_tpu.models import MSCAN_Classifier

        def dense():
            m = MSCAN_Classifier(num_classes=1000)
            return m, {"params": m.init(KEY), "state": m.init_state()}

        def pruned():
            m, var = dense()
            prune_width(m, var, keep_ratio=0.5, round_to=64,
                        ffn_round_to=128)
            return m, var

        td = _bench("MSCAN-t dense", dense, mfu=True)
        tp = _bench("MSCAN-t quad-width 0.5", pruned, mfu=True)
        for tag in td:
            log(f"  -> MSCAN-t {tag} train speedup {td[tag] / tp[tag]:.2f}x")


if __name__ == "__main__":
    main()
