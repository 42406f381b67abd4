# Data-driven V3: CalibrationHook streams patch second moments; the solve
# minimizes the response error E||y - yhat||^2 instead of the kernel
# Frobenius error (response-optimal whitened SVD).
_base_ = ["./low-rank-exp-v3_all_vgg16.py"]

app = dict(data_driven=True)

hooks = [
    dict(type="CalibrationHook", priority=30, num_batches=2, batch_size=8,
         image_size=(224, 224)),
    dict(type="ModelAnalysis", priority=40, input_shape=(224, 224, 3), batch_size=64),
]
