"""Measurement-hook smoke tests on the CPU backend (tiny model): Fps,
InferenceTimeHook, ClassEvalHook, and the ClassInference comparator."""

import os

import numpy as np
import pytest

import tests.test_finetune  # registers TinyNet
from convnet_approximater_tpu.runner import ClassInference, Runner
from convnet_approximater_tpu.utils import init_cfg, update_cfg

BASE = """
model = dict(type="TinyNet", num_classes=4)
app = dict(type="LowRankExpV1", max_iter=0, min_lmda=0, max_lmda=0,
           init_method="svd", lmda_length=1, num_bases=(4,))
filters = [dict(type="SimpleConvFilter"), dict(type="IndicesFilter", indices=(2,))]
"""


def _run(tmp_path, hooks, **runner_kw):
    p = tmp_path / "cfg.py"
    p.write_text(BASE + f"hooks = {hooks}\n")
    init_cfg(str(p))
    update_cfg(work_dir=str(tmp_path / "work"), config_name="m", seed=0)
    runner = Runner(**runner_kw)
    runner.run()
    return runner


def test_fps_hook(tmp_path):
    runner = _run(tmp_path, """[dict(type="Fps", priority=50, repeat_times=2,
        total_iters=8, num_warmup=2, log_interval=4,
        dataset_args=dict(batch_size=4),
        data_config=dict(image_size=(16, 16)))]""")
    hook = runner.hooks[0]
    assert hook.result["average_fps"] > 0
    assert "fps_variance" in hook.result


def test_inference_time_hook(tmp_path):
    runner = _run(tmp_path, """[dict(type="InferenceTimeHook", priority=50,
        infer_cfg=dict(input_size=(2, 16, 16, 3), num_iters=3, warmup=1))]""")
    hook = runner.hooks[0]
    assert hook.result["median_ms"] > 0
    assert np.isfinite(hook.result["flops"])


def test_inference_time_hook_nchw_input_size(tmp_path):
    # reference configs pass NCHW tuples; the hook must transpose them
    runner = _run(tmp_path, """[dict(type="InferenceTimeHook", priority=50,
        infer_cfg=dict(input_size=(2, 3, 16, 16), num_iters=2, warmup=1))]""")
    assert runner.hooks[0].input_size == (2, 16, 16, 3)


def test_class_eval_hook(tmp_path):
    runner = _run(tmp_path, """[dict(type="ClassEvalHook", priority=50,
        eval_cfg=dict(batch_size=8, input_size=(16, 16, 3), num_classes=4,
                      num_batches=2))]""")
    res = runner.hooks[0].result
    assert 0 <= res["top1"] <= 100 and res["top5"] >= res["top1"]
    assert res["param_count"] > 0


def test_class_inference_comparator(tmp_path):
    runner = _run(tmp_path, "[]")
    ckpt = runner.output_path
    assert os.path.exists(ckpt)
    ci = ClassInference(checkpoint=ckpt, batch_size=2, input_size=(16, 16, 3))
    ci.run()  # must complete: original + approximated reports


def test_class_inference_bf16_serving(tmp_path):
    """Serving dtype: reports run in bf16 and the BN fold defaults on
    (TinyNet has no conv->BN pairs, so the fold is a no-op here — the point
    is the surface runs end-to-end with fold_bn enabled)."""
    runner = _run(tmp_path, "[]")
    ci = ClassInference(checkpoint=runner.output_path, batch_size=2,
                        input_size=(16, 16, 3), dtype="bfloat16")
    assert ci.fold_bn is True
    ci.run()
    ci2 = ClassInference(checkpoint=runner.output_path, batch_size=2,
                         input_size=(16, 16, 3))
    assert ci2.fold_bn is False  # f32 parity surface: fold off by default


def test_decomp_hook(tmp_path):
    runner = _run(
        tmp_path,
        """[dict(type="LowRankExpV1Decomp", priority=50)]""",
    )
    from convnet_approximater_tpu.layers.low_rank_conv import SeparableConv

    mod = runner.model.get_switchable_module(0)
    assert isinstance(mod.s_conv, SeparableConv)
    # params were updated in place to the separable structure
    from convnet_approximater_tpu.utils import tree_get

    name = runner.model.switchable_names[0]
    sp = tree_get(runner.variables["params"], name)
    assert "v_conv" in sp["s_conv"]


def test_class_inference_never_lose_persists_decisions(tmp_path):
    """The deploy comparator's arbiter path runs end-to-end on CPU and
    persists the per-layer decision table to the work dir."""
    import json

    runner = _run(tmp_path, "[]")
    ci = ClassInference(checkpoint=runner.output_path, batch_size=2,
                        input_size=(16, 16, 3), never_lose=True)
    ci.run()
    path = tmp_path / "work" / "never_lose_decisions.json"
    assert path.exists()
    res = json.loads(path.read_text())
    assert len(res["layers"]) == 1  # TinyNet's one substituted conv
    assert res["layers"][0]["kept"] in ("dense", "decomposed")
    assert res["t_decomposed"] > 0 and res["t_dense"] > 0


def test_class_inference_int8_serving(tmp_path):
    """quantize='int8' PTQs the approximated surface end to end (fold ->
    cast -> calibrate -> QuantConv2d rewrite -> report)."""
    from convnet_approximater_tpu.layers.quant import QuantConv2d

    runner = _run(tmp_path, "[]")
    ci = ClassInference(checkpoint=runner.output_path, batch_size=2,
                        input_size=(16, 16, 3), dtype="bfloat16",
                        quantize="int8")
    ci.run()
    quantized = [m for _, m in ci.new_model.named_modules()
                 if isinstance(m, QuantConv2d)]
    assert quantized, "no convs were quantized"
    with pytest.raises(ValueError):
        ClassInference(checkpoint=runner.output_path, quantize="int4")
