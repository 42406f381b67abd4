# Dense ResNet-50 serving-export config: no substitution (Dummy app finds
# no DummyLayer sites), the surface comes entirely from the deploy stack —
#   python scripts/export_model.py --config configs/resnet/serve_int8_resnet50.py \
#       --checkpoint <r50.ckpt.npz> --out r50_int8.stablehlo \
#       --dtype bfloat16 --quantize int8
#   python scripts/serve.py --artifact r50_int8.stablehlo --batch 128
# (measured surface: fold+int8 = 3.78 ms @b64, 18.2k img/s @b128 —
# doc/serving.md)
model = dict(type="ResNet50", num_classes=1000)
app = dict(type="Dummy")
filters = []
hooks = []
