_base_ = ["../msca-rep_d1_fix_mscan-t.py"]

filters = [dict(type="IndicesFilter", indices=(1,))]

hooks = [
    dict(
        type="L2Reconstruct",
        priority=50,
        asym=True,
        l2_weight=1.0,
        cls_weight=0.0,
        sche_args=dict(epochs=20),
        optim_args=dict(opt="adamw", lr=1e-4, weight_decay=0.01),
        epoch_behavior=[-1] * 20,
    ),
]
