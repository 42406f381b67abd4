model = dict(
    type="ConvNeXt",
    arch="tiny",
    num_classes=1000,
    drop_path_rate=0.0,
    init_cfg=None,
)
