# Residual-trunk + block-internal chain pruning of ResNet-18 with CE
# recovery (round 4e).  prune_trunks slices ONE shared channel mask per
# stage trunk (projection shortcut + every block's last conv/BN + all
# consumer conv1s + fc); prune_chains then halves the block-internal
# junctions.  The stack is the measured ResNet record surface
# (R18 1.235 ms / R50 1.729 ms +int8, doc/perf-notes.md r4e); the CE
# fine-tune recovers from the pruned init.  A checkpoint saved from this
# run reloads through THIS SAME config (the passes replay and shapes
# match) — including scripts/export_model.py.
_base_ = ["../_base_/models/resnet/resnet18.py"]

app = dict(type="Dummy")
filters = []

structure_passes = [
    dict(fn="prune_trunks", keep_ratio=0.5, round_to=64),
    dict(fn="prune_chains", keep_ratio=0.5, round_to=64),
]

hooks = [
    dict(
        type="L2Reconstruct",
        priority=50,
        asym=True,
        no_norm=True,          # CE phase trains everything
        l2_weight=0.0,
        cls_weight=1.0,
        optim_args=dict(opt="adamw", lr=1e-4, weight_decay=0.01,
                        clip_grad=1.0),
        sche_args=dict(epochs=10),
    ),
]
