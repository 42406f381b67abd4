#!/usr/bin/env python
"""Train a from-scratch baseline checkpoint (e.g. AlexNet on CIFAR-10) that
the approximation pipeline then consumes as ``model.init_cfg``.  Replaces the
reference's reliance on externally-produced pretrained .pth files."""
import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--model", default="AlexNet")
    ap.add_argument("--num-classes", type=int, default=10)
    ap.add_argument("--dataset", default=None, help="DATASET type (e.g. CIFAR10)")
    ap.add_argument("--data-root", default=None)
    ap.add_argument("--image-size", type=int, nargs=2, default=(224, 224))
    ap.add_argument("--epochs", type=int, default=20)
    ap.add_argument("--batch-size", type=int, default=128)
    ap.add_argument("--lr", type=float, default=1e-3)
    ap.add_argument("--work-dir", default="work_dirs/baseline")
    args = ap.parse_args()

    import jax

    from convnet_approximater_tpu.classification import TrainHelper
    from convnet_approximater_tpu.models import build_model
    from convnet_approximater_tpu.utils import build_logger

    build_logger()
    model = build_model(dict(type=args.model, num_classes=args.num_classes))
    variables = {"params": model.init(jax.random.key(0)), "state": model.init_state()}
    dataset = dict(type=args.dataset, root=args.data_root) if args.dataset else None
    TrainHelper(model, variables, dict(
        dataset=dataset, num_classes=args.num_classes, epochs=args.epochs,
        batch_size=args.batch_size, lr=args.lr, image_size=tuple(args.image_size),
        work_dir=args.work_dir,
    )).train()


if __name__ == "__main__":
    main()
