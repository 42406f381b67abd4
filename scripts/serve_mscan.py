#!/usr/bin/env python
"""End-to-end serving demo: the production inference story in one script.

Builds the best MSCAN-t serving surface (msca-rep d1+fix+dconv0 + FfnRep +
BN-fold + pw-matmul, bf16), then drives a steady-state serving loop:

* host side: the C++ thread-pooled batch prep (gather+resize+normalize,
  no GIL) feeding through the double-buffered Loader;
* device side: one jitted forward; requests are pipelined (dispatch batch
  i+1 while i executes) and throughput counts a scalar readback per batch.

Usage: python scripts/serve_mscan.py [--batch 128] [--batches 32]
       [--dtype bfloat16] [--tiny] [--platform cpu]
(``--tiny --platform cpu`` is the hardware-independent smoke mode.)
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=128)
    ap.add_argument("--batches", type=int, default=32)
    ap.add_argument("--dtype", default="bfloat16")
    ap.add_argument("--image-size", type=int, default=224)
    ap.add_argument("--tiny", action="store_true",
                    help="tiny model + few batches (smoke mode)")
    ap.add_argument("--platform", default=None)
    args = ap.parse_args()

    import jax

    if args.platform:
        jax.config.update("jax_platforms", args.platform)
    jax.config.update("jax_compilation_cache_dir",
                      os.path.expanduser("~/.cat_jax_cache"))

    import jax.numpy as jnp
    import numpy as np

    from bench import KEY, run_pipeline
    from convnet_approximater_tpu.core import FfnRep, MscaRep
    from convnet_approximater_tpu.data import Loader, Synthetic
    from convnet_approximater_tpu.deploy import enable_pw_matmul, fold_batchnorm
    from convnet_approximater_tpu.filters import IndicesFilter
    from convnet_approximater_tpu.models import MSCAN_Classifier
    from convnet_approximater_tpu.utils import cast_floating

    if args.tiny:
        model = MSCAN_Classifier(num_channels=(8, 16, 24, 32),
                                 num_blocks=(1, 1, 1, 1),
                                 exp_ratios=(2, 2, 2, 2), num_classes=16)
        args.image_size = min(args.image_size, 64)
        args.batch = min(args.batch, 8)
        args.batches = min(args.batches, 4)
    else:
        model = MSCAN_Classifier(num_classes=1000)
    variables = {"params": model.init(KEY), "state": model.init_state()}
    model, variables = run_pipeline(
        model, variables, MscaRep(decomp=1, fix=True, decomp_conv0=True), [])
    if not args.tiny:
        model, variables = run_pipeline(model, variables, FfnRep(fix=True),
                                        [IndicesFilter((1, 2, 3, 4, 5, 6))])
    fold_batchnorm(model, variables)
    enable_pw_matmul(model)
    dt = jnp.dtype(args.dtype)
    if dt != jnp.float32:
        variables = {"params": cast_floating(variables["params"], dt),
                     "state": variables["state"]}

    size = (args.image_size, args.image_size)
    ds = Synthetic(max(args.batch * 4, 64), size + (3,), 1000)
    loader = Loader(ds, args.batch, shuffle=False, drop_last=True,
                    dtype=np.float32)

    @jax.jit
    def serve(params, state, x):
        y, _, _ = model.apply(params, x.astype(dt), state=state,
                              training=False)
        return jnp.argmax(y, axis=-1)

    params, state = variables["params"], variables["state"]
    # warm / compile
    x0 = np.zeros((args.batch,) + size + (3,), np.float32)
    t0 = time.time()
    np.asarray(serve(params, state, x0))
    print(f"compile+first batch: {time.time() - t0:.1f}s", flush=True)

    served = 0
    preds = None
    t0 = time.time()
    it = iter(_cycle(loader, args.batches))
    for images, _ in it:
        preds = serve(params, state, images)  # dispatch; host preps next batch
        served += images.shape[0]
    np.asarray(preds)  # drain the pipeline
    dt_s = time.time() - t0
    print(f"served {served} images in {dt_s:.3f}s = {served / dt_s:.0f} img/s "
          f"end-to-end (host prep + H2D + forward, batch {args.batch}, "
          f"{args.dtype})", flush=True)


def _cycle(loader, n_batches):
    i = 0
    while i < n_batches:
        for batch in loader:
            if i >= n_batches:
                return
            yield batch
            i += 1


if __name__ == "__main__":
    main()
