# DwSepRep rank-1 on ConvNeXt-T + asymmetric L2 reconstruction recovery:
# the per-channel strip taps are trainable, so the lossy rank-1 split
# recovers against the dense teacher's block outputs.
_base_ = ["./dw-sep-rep_r1_convnext-t.py"]

hooks = [
    dict(
        type="L2Reconstruct",
        priority=50,
        asym=True,
        l2_weight=1.0,
        cls_weight=0.0,
        dataset_args=dict(dataset=dict(type="CIFAR10", root="data/cifar10"), batch_size=32),
        data_config=dict(image_size=(224, 224),
                         mean=(0.485, 0.456, 0.406), std=(0.229, 0.224, 0.225)),
        optim_args=dict(opt="adamw", lr=1e-3, weight_decay=0.01),
        sche_args=dict(epochs=6),
        other_args=dict(log_interval=300, num_classes=10),
    ),
]
