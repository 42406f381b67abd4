# Structured FFN hidden-channel pruning (round 4, beyond-reference app):
# CalibrationHook streams raw substitution-input maps, FfnPrune selects
# the kept hidden set by greedy explained-variance (OMP) and refits fc2
# in closed form, then the standard asymmetric L2 reconstruction recovers
# the remainder.  keep_ratio=0.75 cuts 25% of the FFN MACs — on MSCAN
# the FFNs carry exp_ratio 8/8/4/4, i.e. most of the model's MXU work.
_base_ = ["../_base_/models/mscan/mscan-t.py"]

app = dict(type="FfnPrune", keep_ratio=0.75)

filters = []

hooks = [
    dict(type="CalibrationHook", priority=40, num_batches=2, batch_size=8,
         image_size=(224, 224)),
    dict(
        type="L2Reconstruct",
        priority=50,
        asym=True,
        l2_weight=1.0,
        cls_weight=0.0,
        sche_args=dict(epochs=20),
        optim_args=dict(opt="adamw", lr=1e-4, weight_decay=0.01),
    ),
    dict(type="InferenceTimeHook", priority=60,
         infer_cfg=dict(input_size=(64, 224, 224, 3))),
]
