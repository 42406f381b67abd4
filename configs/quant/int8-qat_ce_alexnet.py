# Quantization-aware training through the standard pipeline (round 4):
# Dummy app keeps the model dense; PrepareQAT swaps every dense Conv2d /
# Linear for its fake-quant STE twin BEFORE the CE fine-tune runs, so the
# recovery phase trains under int8 serving numerics.  Export the result
# with:  scripts/export_model.py --config <this> --checkpoint <ckpt>
#        --quantize int8-qat --out model.stablehlo
_base_ = ["../low-rank-exp/dummy_alexnet.py"]

hooks = [
    dict(type="PrepareQAT", priority=48),
    dict(
        type="L2Reconstruct",
        priority=50,
        asym=True,
        no_norm=True,
        l2_weight=0.0,
        cls_weight=1.0,
        optim_args=dict(opt="adamw", lr=1e-4, weight_decay=0.01,
                        clip_grad=1.0),
        sche_args=dict(epochs=5),
        epoch_behavior=[-2] * 5,
    ),
]
