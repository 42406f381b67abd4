#!/usr/bin/env python
"""Speed-up-ratio micro-benchmark (reference ``scripts/low_rank_exp_spr.py:26-63``):
per-conv-shape measured + theoretical speed-up vs ``num_bases`` for the
AlexNet conv shapes, on the current backend.  Writes a CSV (and a matplotlib
plot when available) to --out."""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

from convnet_approximater_tpu.core import LowRankExpV1
from convnet_approximater_tpu.nn import Conv2d, Ctx

# (in_channels, out_channels, kernel, stride, padding, feature HxW) for the
# 4 substitutable AlexNet convs at 224x224 input
ALEXNET_SHAPES = [
    (64, 192, 5, 1, 2, 27),
    (192, 384, 3, 1, 1, 13),
    (384, 256, 3, 1, 1, 13),
    (256, 256, 3, 1, 1, 13),
]


def time_fn(fn, *args, iters=16):
    f = jax.jit(fn)
    float(jnp.sum(f(*args)))
    g = jax.jit(lambda a: a + 1)
    float(jnp.sum(g(jnp.ones(8))))
    t0 = time.time()
    float(jnp.sum(g(jnp.ones(8))))
    ov = time.time() - t0
    t0 = time.time()
    for _ in range(iters):
        r = f(*args)
    float(jnp.sum(r))
    return max((time.time() - t0 - ov) / iters, 1e-9)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=64)
    ap.add_argument("--bases", type=int, nargs="+", default=[2, 4, 8, 16, 32])
    ap.add_argument("--out", default="work_dirs/spr")
    args = ap.parse_args()
    os.makedirs(args.out, exist_ok=True)
    key = jax.random.key(0)
    rows = ["shape,num_bases,theoretical_spr,measured_spr"]
    for (C, N, d, s, p, hw) in ALEXNET_SHAPES:
        x = jax.random.normal(key, (args.batch, hw, hw, C))
        conv = Conv2d(C, N, d, stride=s, padding=p)
        cparams = conv.init(key)
        t_dense = time_fn(lambda xx: conv(cparams, xx, Ctx()), x)
        for M in args.bases:
            app = LowRankExpV1(num_bases=(M,), max_iter=0, lmda_length=1,
                               min_lmda=0, max_lmda=0, init_method="svd",
                               do_decomp=True)
            sub, sp = app.initialize(conv, cparams, key)
            app.optimize(sub, sp)
            mod, np_ = app.postprocess(sub, sp)
            t_lr = time_fn(lambda xx: mod(np_, xx, Ctx()), x)
            theo = (d * d * C * N) / (C * M * (2 * d + N))
            meas = t_dense / t_lr
            rows.append(f"{C}x{N}x{d},{M},{theo:.3f},{meas:.3f}")
            print(rows[-1], flush=True)
    csv_path = os.path.join(args.out, "spr.csv")
    with open(csv_path, "w") as f:
        f.write("\n".join(rows) + "\n")
    print(f"wrote {csv_path}")
    try:
        import matplotlib

        matplotlib.use("Agg")
        import matplotlib.pyplot as plt

        data = {}
        for r in rows[1:]:
            shape, M, theo, meas = r.split(",")
            data.setdefault(shape, []).append((int(M), float(theo), float(meas)))
        fig, ax = plt.subplots()
        for shape, pts in data.items():
            pts.sort()
            ax.plot([m for m, _, _ in pts], [v for _, _, v in pts], "-o", label=f"{shape} measured")
            ax.plot([m for m, _, _ in pts], [v for _, v, _ in pts], "--", label=f"{shape} theory")
        ax.set_xlabel("num_bases")
        ax.set_ylabel("speed-up ratio")
        ax.legend(fontsize=6)
        fig.savefig(os.path.join(args.out, "spr.png"), dpi=120)
        print(f"wrote {os.path.join(args.out, 'spr.png')}")
    except Exception as e:
        print(f"(plot skipped: {e})")


if __name__ == "__main__":
    main()
