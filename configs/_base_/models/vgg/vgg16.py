model = dict(
    type="VGG",
    depth=16,
    num_classes=10,
    init_cfg=None,
)
