#!/usr/bin/env python
"""A/B the deploy-time BN fold (``deploy.fold_batchnorm``) at model level.

Round-2 trace: the stem's BN+GELU elementwise fusion sits between two layout
copies (copy.153/154, ~0.26 ms/fwd b=64 bf16).  Folding BN into the convs
removes the BN ops; does XLA then skip the layout round-trip?
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update("jax_compilation_cache_dir", os.path.expanduser("~/.cat_jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

from bench import B, KEY, log, time_apply
from convnet_approximater_tpu.deploy import fold_batchnorm
from exp_strip_matmul import build


def main():
    for cfg in ("best", "rep"):
        model, variables, dtype = build(cfg)
        x = jax.random.normal(KEY, (B, 224, 224, 3)).astype(dtype)
        t0 = time_apply(model, variables, x)
        n = fold_batchnorm(model, variables)
        t1 = time_apply(model, variables, x)
        log(f"[{cfg} {dtype.__name__ if hasattr(dtype,'__name__') else dtype}] "
            f"no-fold {t0*1e3:.3f} ms -> fold({n} BNs) {t1*1e3:.3f} ms "
            f"({(t0-t1)*1e3:+.3f} ms)")


if __name__ == "__main__":
    main()
