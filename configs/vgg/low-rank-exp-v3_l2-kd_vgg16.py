# V3 channel-rank factorization of VGG-16 + combined L2-reconstruction /
# logit-distillation recovery (kd_weight: soft-target KL against the dense
# teacher; beyond the reference's L2/CE-only recovery).
_base_ = ["./low-rank-exp-v3_all_vgg16.py"]

hooks = [
    dict(
        type="L2Reconstruct",
        priority=50,
        asym=True,
        l2_weight=1.0,
        cls_weight=0.0,
        kd_weight=0.5,
        kd_temperature=4.0,
        dataset_args=dict(dataset=dict(type="CIFAR10", root="data/cifar10"), batch_size=32),
        data_config=dict(image_size=(224, 224),
                         mean=(0.485, 0.456, 0.406), std=(0.229, 0.224, 0.225)),
        optim_args=dict(opt="adamw", lr=1e-3, weight_decay=0.01),
        sche_args=dict(epochs=8),
        other_args=dict(log_interval=300, num_classes=10),
    ),
]
