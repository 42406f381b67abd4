# Mirror of the reference's
# configs/low-rank-exp/low-rank-exp-v1_l2345_svd_dodecomp_ce_alexnet.py:
# cross-entropy-only fine-tune of the fully decomposed model (BASELINE.md
# row 8: CE recovers 80.65% from 77.43%).
_base_ = ["./low-rank-exp-v1_l2345_svd_dodecomp_alexnet.py"]

hooks = [
    dict(
        type="L2Reconstruct",
        priority=50,
        asym=True,
        l2_weight=0.0,
        cls_weight=1.0,
        no_norm=True,
        dataset_args=dict(dataset=dict(type="CIFAR10", root="data/cifar10"), batch_size=64),
        data_config=dict(image_size=(224, 224),
                         mean=(0.485, 0.456, 0.406), std=(0.229, 0.224, 0.225)),
        optim_args=dict(opt="adamw", lr=1e-4, momentum=0.9, weight_decay=0.01),
        sche_args=dict(epochs=10),
        other_args=dict(log_interval=300, num_classes=10),
    ),
]
