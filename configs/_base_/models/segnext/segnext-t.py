# SegNeXt-T: MSCAN-t backbone + Light-Ham decode head (the model family the
# reference's commented-out models/segnext.py intended; ADE20K head defaults)
model = dict(
    type="SegNeXt",
    num_channels=(32, 64, 160, 256),
    num_blocks=(3, 3, 5, 2),
    exp_ratios=(8, 8, 4, 4),
    drop_path_rate=0.1,
    num_classes=150,
    ham_channels=256,
)
