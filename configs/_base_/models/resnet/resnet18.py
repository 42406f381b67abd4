model = dict(
    type="ResNet",
    depth=18,
    num_classes=1000,
    init_cfg=None,
)
