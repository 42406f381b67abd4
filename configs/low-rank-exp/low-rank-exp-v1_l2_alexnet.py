# Mirror of the reference's configs/low-rank-exp/low-rank-exp-v1_l2_alexnet.py:
# the ITERATIVE scheme-1 solve on conv2 only — 10 alternations per lambda over
# a 10-point continuation schedule (the path that exercised cvxpy in the
# reference; here the jitted proximal-IRLS solver, core/low_rank_solvers.py).
_base_ = ["../_base_/models/alexnet/alexnet.py"]

app = dict(
    type="LowRankExpV1",
    max_iter=10,
    min_lmda=0.0001,
    max_lmda=0.01,
    init_method="svd",
    lmda_length=10,
    num_bases=(8,),
    do_decomp=False,
    init_decomp=False,
)

filters = [
    dict(type="SimpleConvFilter"),
    dict(type="IndicesFilter", indices=(2,)),
]

hooks = [
    dict(type="ModelAnalysis", priority=50, input_shape=(3, 224, 224)),
    dict(
        type="ClassEvalHook",
        priority=50,
        eval_cfg=dict(
            dataset=dict(type="CIFAR10", root="data/cifar10"),
            input_size=(224, 224, 3),
            num_classes=10,
            mean=(0.485, 0.456, 0.406),
            std=(0.229, 0.224, 0.225),
        ),
    ),
    dict(
        type="InferenceTimeHook",
        priority=50,
        infer_cfg=dict(input_size=(64, 224, 224, 3)),
    ),
]
