# Cross-layer chain pruning of VGG-16 with CE recovery (round 4).
# `structure_passes` rewrites run after init_cfg weight load and before
# the (Dummy) app pipeline: prune_chains halves every producer->consumer
# junction width (conv stacks + the 4096-wide classifier Linears), then
# the CE fine-tune recovers from the pruned init.  A checkpoint saved
# from this run reloads through THIS SAME config (the pass replays and
# the shapes match) — including scripts/export_model.py.
_base_ = ["../_base_/models/vgg/vgg16.py"]

app = dict(type="Dummy")
filters = []

structure_passes = [
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
