# SegNeXt-T msca-rep recovery fine-tune: L2 feature reconstruction +
# per-pixel CE, mIoU model selection (segmentation/finetune.py).
_base_ = ["../msca-rep_d1_fix_segnext-t.py"]

hooks = [
    dict(
        type="SegL2Reconstruct",
        priority=50,
        asym=True,
        l2_weight=1.0,
        cls_weight=1.0,
        dataset_args=dict(batch_size=16),
        data_config=dict(image_size=(512, 512)),
        sche_args=dict(epochs=20),
        optim_args=dict(opt="adamw", lr=1e-4, weight_decay=0.01),
        other_args=dict(num_classes=150, eval_metric="miou"),
    ),
]
