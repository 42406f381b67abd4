_base_ = ["./dummy_alexnet.py"]

# CE-only fine-tune of the unmodified model through the Dummy pipeline
hooks = [
    dict(
        type="L2Reconstruct",
        priority=50,
        asym=True,
        no_norm=True,
        l2_weight=0.0,
        cls_weight=1.0,
        optim_args=dict(opt="adamw", lr=1e-4, weight_decay=0.01),
        sche_args=dict(epochs=10),
        epoch_behavior=[-2] * 10,
    ),
]
