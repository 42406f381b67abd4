# Mirror of the reference's
# configs/low-rank-exp/low-rank-exp-v1_l2345_svd_dodecomp_l2-sym_alexnet.py:
# layer-wise SYMMETRIC L2 reconstruction (student's own old branch is the
# teacher via force_branch; both branches stay in the param tree).
_base_ = ["./low-rank-exp-v1_l2345_svd_dodecomp_alexnet.py"]

layer_epochs = 2

hooks = [
    dict(
        type="L2Reconstruct",
        priority=50,
        asym=False,
        l2_weight=1.0,
        cls_weight=0.0,
        epoch_behavior=[0, 0, 1, 1, 2, 2, 3, 3],
        dataset_args=dict(dataset=dict(type="CIFAR10", root="data/cifar10"), batch_size=64),
        data_config=dict(image_size=(224, 224),
                         mean=(0.485, 0.456, 0.406), std=(0.229, 0.224, 0.225)),
        optim_args=dict(opt="adamw", lr=1e-2, momentum=0.9, weight_decay=0.01),
        sche_args=dict(epochs=layer_epochs * 4),
        other_args=dict(log_interval=300, num_classes=10),
    ),
]
