model = dict(
    type="AlexNet",
    init_cfg=None,  # set to a pretrained .ckpt.npz path when available
)
