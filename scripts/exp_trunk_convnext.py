#!/usr/bin/env python
"""prune_trunks on ConvNeXt-T (b=64 @224): trunk cut under the record
triple (DwSepRep r1 + MlpPrune 0.5 + int8 = 4.659 ms, r4d).

The trunk feeds the dw 7x7 (VPU), both MLP matmul I/O dims, the
downsample convs and the LNs — a 0.5 trunk cut roughly quarters the MLP
FLOPs on top of MlpPrune's hidden halving.  Rows:

  dense bf16 (fold)                       — context
  dwsep r1 + mlpprune 0.5 + int8          — the 4.659 ms record
  trunk 0.5 + mlpprune 0.5 (bf16)
  trunk 0.5 + dwsep r1 + mlpprune 0.5 (bf16)
  trunk 0.5 + dwsep r1 + mlpprune 0.5 + int8

All trunk rows are compressed-checkpoint class (CE recovery).

Usage: python scripts/exp_trunk_convnext.py
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update("jax_compilation_cache_dir", os.path.expanduser("~/.cat_jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

from bench import B, KEY, log, run_pipeline
from exp_prune_chains import int8ify, serve_time
from convnet_approximater_tpu.core import DwSepRep, MlpPrune
from convnet_approximater_tpu.deploy import fold_batchnorm, prune_trunks
from convnet_approximater_tpu.filters import DepthwiseConvFilter
from convnet_approximater_tpu.models import build_model


def build():
    m = build_model(dict(type="ConvNeXt", arch="tiny", num_classes=1000))
    return m, {"params": m.init(KEY), "state": m.init_state()}


def main():
    shape = (B, 224, 224, 3)
    log(f"devices: {jax.devices()}")

    m, var = build()
    fold_batchnorm(m, var)
    t_dense = serve_time(m, var, shape, "ConvNeXt-T dense bf16")

    m, var = build()
    run_pipeline(m, var, MlpPrune(keep_ratio=0.5, round_to=128), [])
    run_pipeline(m, var, DwSepRep(ranks=1), [DepthwiseConvFilter()])
    m, var = int8ify(m, var, shape)
    t_rec = serve_time(m, var, shape,
                       "ConvNeXt-T dwsep r1 + mlpprune 0.5 + int8 (record)",
                       cast=False)
    log(f"  -> {t_dense / t_rec:.3f}x vs dense bf16")

    m, var = build()
    nt = prune_trunks(m, var, keep_ratio=0.5, round_to=128, verbose=True)
    run_pipeline(m, var, MlpPrune(keep_ratio=0.5, round_to=128), [])
    t = serve_time(m, var, shape,
                   f"ConvNeXt-T trunk 0.5 ({nt}) + mlpprune 0.5 (bf16)")
    log(f"  -> {t_dense / t:.3f}x vs dense")

    m, var = build()
    prune_trunks(m, var, keep_ratio=0.5, round_to=128)
    run_pipeline(m, var, MlpPrune(keep_ratio=0.5, round_to=128), [])
    run_pipeline(m, var, DwSepRep(ranks=1), [DepthwiseConvFilter()])
    t = serve_time(m, var, shape,
                   "ConvNeXt-T trunk + dwsep + mlpprune (bf16)")
    log(f"  -> {t_dense / t:.3f}x vs dense")

    m, var = build()
    prune_trunks(m, var, keep_ratio=0.5, round_to=128)
    run_pipeline(m, var, MlpPrune(keep_ratio=0.5, round_to=128), [])
    run_pipeline(m, var, DwSepRep(ranks=1), [DepthwiseConvFilter()])
    m, var = int8ify(m, var, shape)
    t = serve_time(m, var, shape,
                   "ConvNeXt-T trunk + dwsep + mlpprune + int8", cast=False)
    log(f"  -> {t_dense / t:.3f}x vs dense, {t_rec / t:.3f}x vs the "
        f"4.659-class record")


if __name__ == "__main__":
    main()
