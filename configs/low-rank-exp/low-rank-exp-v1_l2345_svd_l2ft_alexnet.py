_base_ = ["./low-rank-exp-v1_l2345_svd_alexnet.py"]

hooks = [
    dict(
        type="L2Reconstruct",
        priority=50,
        asym=True,
        l2_weight=1.0,
        cls_weight=0.0,
        optim_args=dict(opt="adamw", lr=1e-4, weight_decay=0.01),
        sche_args=dict(epochs=20),
        dataset_args=dict(dataset=dict(type="CIFAR10", root="data/cifar10"), batch_size=64),
        data_config=dict(image_size=(224, 224),
                         mean=(0.4914, 0.4822, 0.4465), std=(0.2470, 0.2435, 0.2616)),
        other_args=dict(num_classes=10),
    ),
]
