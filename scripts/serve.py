#!/usr/bin/env python
"""Generic serving loop for exported artifacts — any model family.

Consumes what ``scripts/export_model.py`` produces (a StableHLO artifact +
its ``.params.npz``) and drives the same steady-state pipelined loop as
``serve_mscan.py``: C++ thread-pooled host batch prep feeding a jitted
device forward, requests double-buffered, one scalar readback per batch.
Sub-``--min-batch`` requests run through ``deploy.pad_batch`` (batch-1
tiling is degenerate on v5e — doc/serving.md).

Usage:
  python scripts/export_model.py --config <cfg> --checkpoint <ckpt> \
      --out model.stablehlo [--quantize int8] [--symbolic-batch]
  python scripts/serve.py --artifact model.stablehlo [--batch 64]
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--artifact", required=True)
    ap.add_argument("--params", default=None,
                    help="default: <artifact>.params.npz")
    ap.add_argument("--batch", type=int, default=64)
    ap.add_argument("--batches", type=int, default=32)
    ap.add_argument("--image-size", type=int, default=224)
    ap.add_argument("--min-batch", type=int, default=2,
                    help="pad smaller requests up (deploy.pad_batch)")
    ap.add_argument("--max-batch", type=int, default=None,
                    help="run larger requests as sequential chunks of this "
                         "size (deploy.chunk_batch) — set to the measured "
                         "throughput knee (e.g. 128) when the batch sweep "
                         "regresses past it")
    ap.add_argument("--ship-uint8", action="store_true",
                    help="transfer RAW uint8 batches and normalize on "
                         "device (4x fewer bytes than f32, 2x fewer than "
                         "bf16 — the right design when ingestion rides a "
                         "network)")
    ap.add_argument("--data-parallel", action="store_true",
                    help="shard each batch over ALL local devices (data-"
                         "parallel serving: params replicated, jit runs the "
                         "artifact SPMD; validated on the virtual CPU mesh — "
                         "on a multi-chip host this is the scale-out path)")
    ap.add_argument("--platform", default=None)
    args = ap.parse_args()

    import jax

    if args.platform:
        jax.config.update("jax_platforms", args.platform)
    jax.config.update("jax_compilation_cache_dir",
                      os.path.expanduser("~/.cat_jax_cache"))

    import jax.numpy as jnp
    import numpy as np

    from convnet_approximater_tpu.data import Loader, Synthetic
    from convnet_approximater_tpu.deploy import (chunk_batch, load_serving,
                                             pad_batch,
                                             pad_batch_to_multiple)
    from convnet_approximater_tpu.utils.serialize import load_ckpt

    served_fn = load_serving(args.artifact)
    variables = load_ckpt(args.params or args.artifact + ".params.npz")
    # device-resident weights ONCE: numpy trees would re-ship the whole
    # param set host->device on EVERY call (review r3f — dominates the
    # batch bytes on bandwidth-bound links)
    data_sh = None
    if args.data_parallel and jax.device_count() > 1:
        from convnet_approximater_tpu.parallel import (
            batch_sharding, make_mesh, replicate)

        mesh = make_mesh(model=1)  # every device on the data axis
        data_sh = batch_sharding(mesh)
        params = replicate(variables["params"], mesh)
        # a padded request must still split evenly over the data axis
        args.min_batch = max(args.min_batch, jax.device_count())
        print(f"data-parallel serving over {jax.device_count()} devices "
              f"(non-dividing batches are padded up)", flush=True)
    else:
        params = jax.device_put(variables["params"])
    # the exported calling convention records the input contract (the last
    # in_aval is the batch) — derive dtype AND geometry from it
    x_aval = served_fn.in_avals[-1]
    dt = x_aval.dtype
    if isinstance(x_aval.shape[1], int):
        if (args.image_size, args.image_size) != tuple(x_aval.shape[1:3]):
            print(f"note: artifact expects {x_aval.shape[1:3]} inputs — "
                  f"overriding --image-size {args.image_size}", flush=True)
        args.image_size = int(x_aval.shape[1])
    if isinstance(x_aval.shape[0], int) and args.batch != x_aval.shape[0]:
        print(f"note: artifact is batch-static at {x_aval.shape[0]} — "
              f"overriding --batch {args.batch}", flush=True)
        args.batch = int(x_aval.shape[0])

    if args.ship_uint8:
        from convnet_approximater_tpu.data.datasets import (
            IMAGENET_DEFAULT_MEAN,
            IMAGENET_DEFAULT_STD,
        )

        # preprocessing contract: prefer the exporter's .meta.json sidecar
        # (ADVICE r3 — the aval records only shape/dtype, not what the
        # floats MEAN); fall back to ImageNet defaults with a warning
        import json

        meta_path = args.artifact + ".meta.json"
        if os.path.exists(meta_path):
            with open(meta_path) as f:
                meta = json.load(f)
            norm_mean = meta.get("mean", IMAGENET_DEFAULT_MEAN)
            norm_std = meta.get("std", IMAGENET_DEFAULT_STD)
            if "mean" not in meta:
                print(f"warning: {meta_path} records no mean/std — "
                      f"assuming ImageNet normalization", flush=True)
        else:
            print(f"warning: no {meta_path} — assuming ImageNet mean/std "
                  f"normalization (re-export with scripts/export_model.py "
                  f"to record the real contract)", flush=True)
            norm_mean, norm_std = IMAGENET_DEFAULT_MEAN, IMAGENET_DEFAULT_STD

        # on-device normalize: the artifact expects normalized `dt` inputs,
        # so compose (u8 - mean)/std (in the 0..255 range) in front of it —
        # one jit, the cast/normalize fuses into the transfer epilogue
        mean = jnp.asarray(norm_mean, jnp.float32) * 255.0
        std = jnp.asarray(norm_std, jnp.float32) * 255.0

        @jax.jit
        def _fwd_u8(p, x_u8):
            x = (x_u8.astype(jnp.float32) - mean) / std
            return served_fn(p, x.astype(dt))

        base_u8 = lambda x: _fwd_u8(params, x)
        if data_sh is not None:
            base_u8 = (lambda f: lambda x: f(jax.device_put(x, data_sh)))(base_u8)
            # any batch reaching the data axis must divide the device
            # count (incl. chunk_batch remainder chunks) — pad up
            base_u8 = pad_batch_to_multiple(base_u8, jax.device_count())
        # pad INSIDE chunk: a remainder chunk of size 1 must still get
        # the min-batch padding (b=1 tiling degeneracy)
        fwd = pad_batch(base_u8, args.min_batch)
        if args.max_batch:
            fwd = chunk_batch(fwd, args.max_batch)
    else:
        base = lambda x: served_fn(params, x)
        if data_sh is not None:
            base = (lambda f: lambda x: f(jax.device_put(x, data_sh)))(base)
            base = pad_batch_to_multiple(base, jax.device_count())
        fwd = pad_batch(base, args.min_batch)
        if args.max_batch:
            fwd = chunk_batch(fwd, args.max_batch)

    size = (args.image_size, args.image_size)
    ds = Synthetic(max(args.batch * 4, 64), size + (3,), 1000)
    if args.ship_uint8:
        pool = np.asarray(ds.images, np.uint8)
        loader = [(pool[i:i + args.batch], None)
                  for i in range(0, len(pool) - args.batch + 1, args.batch)]
    else:
        # host cast rides the Loader's prefetch thread (a bf16 batch ships
        # half the bytes of f32 — matters wherever ingestion is
        # bandwidth-bound: the relay tunnel here, DCN-fed pools generally)
        import ml_dtypes

        host_dt = ml_dtypes.bfloat16 if dt == jnp.bfloat16 else np.dtype(dt)
        loader = Loader(ds, args.batch, shuffle=False, drop_last=True,
                        dtype=host_dt)

    x0 = jnp.zeros((args.batch,) + size + (3,),
                   jnp.uint8 if args.ship_uint8 else dt)
    t0 = time.time()
    jax.block_until_ready(fwd(x0))
    print(f"artifact load + compile + first batch: {time.time() - t0:.1f}s",
          flush=True)


    served, preds = 0, None
    t0 = time.time()
    i = 0
    while i < args.batches:
        for images, _ in loader:
            if i >= args.batches:
                break
            preds = fwd(jnp.asarray(images))
            served += images.shape[0]
            i += 1
    float(jnp.sum(preds.astype(jnp.float32)))  # drain
    dt_s = time.time() - t0
    print(f"served {served} images in {dt_s:.3f}s = {served / dt_s:.0f} img/s "
          f"end-to-end (batch {args.batch}, {jnp.dtype(dt).name})", flush=True)


if __name__ == "__main__":
    main()
