model = dict(
    type="ResNet",
    depth=50,
    num_classes=1000,
    init_cfg=None,
)
