_base_ = ["./low-rank-exp-v1_all_svd_vgg16.py"]

app = dict(
    _cover_=True,
    type="LowRankExpV2",
    num_bases=(32,) * 12,
    data_driven_iters=30,
)

hooks = [
    dict(type="CalibrationHook", priority=30, num_batches=2, batch_size=8,
         image_size=(224, 224)),
    dict(type="ModelAnalysis", priority=40, input_shape=(224, 224, 3), batch_size=64),
]
