#!/usr/bin/env python
"""Pipeline CLI (reference ``scripts/main.py``): ``--config`` drives the
4-phase Runner; ``--checkpoint`` implies deploy mode (skip optimize +
postprocess, load the saved model after initialize).

Multi-chip runs need no torchrun wrapper: one process sees all local devices
and the fine-tune/eval hooks jit over the mesh (``--coordinator`` enables
multi-host ``jax.distributed`` init — the dist_main.sh replacement).
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def parse_args():
    p = argparse.ArgumentParser(description="TPU-native ConvNet approximation pipeline")
    p.add_argument("--config", required=True, help="config file (.py/.yaml with _base_ support)")
    p.add_argument("--checkpoint", default=None, help="deploy mode: load this checkpoint")
    p.add_argument("--skip-optim", action="store_true")
    p.add_argument("--skip-post", action="store_true")
    p.add_argument("--seed", type=int, default=42)
    p.add_argument("--work-dir", default=None)
    p.add_argument("--platform", default=None, help="force a jax platform (cpu/tpu)")
    p.add_argument("--coordinator", default=None, help="multi-host coordinator address")
    p.add_argument("--num-processes", type=int, default=None)
    p.add_argument("--process-id", type=int, default=None)
    return p.parse_args()


def main():
    args = parse_args()
    if args.platform:
        os.environ["JAX_PLATFORMS"] = args.platform

    import jax

    if args.platform:
        jax.config.update("jax_platforms", args.platform)

    from convnet_approximater_tpu.parallel import initialize_distributed, is_main_process
    from convnet_approximater_tpu.runner import Runner
    from convnet_approximater_tpu.utils import (
        build_logger,
        get_cfg,
        init_cfg,
        random_seed,
        update_cfg,
    )

    initialize_distributed(args.coordinator, args.num_processes, args.process_id)
    init_cfg(args.config)
    cfg = get_cfg()

    deploy = args.checkpoint is not None
    skip_optim = args.skip_optim or deploy
    skip_post = args.skip_post or deploy

    work_dir = args.work_dir or os.path.join(
        cfg.work_dir, time.strftime("%Y%m%d_%H%M%S")
    )
    if is_main_process():
        os.makedirs(work_dir, exist_ok=True)
        build_logger(os.path.join(work_dir, "run.log"))

    rng = random_seed(args.seed, jax.process_index())
    update_cfg(
        work_dir=work_dir,
        config_name=cfg.name,
        checkpoint=args.checkpoint,
        seed=args.seed,
    )

    runner = Runner(deploy=deploy, skip_optim=skip_optim, skip_post=skip_post, rng=rng)
    runner.run()


if __name__ == "__main__":
    main()
