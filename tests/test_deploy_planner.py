"""Serving auto-planner (deploy_planner.plan_serving): candidate synthesis,
ranking, the dense never-lose floor, and the min_agree accuracy gate."""

import jax
import jax.numpy as jnp
import pytest

from convnet_approximater_tpu.deploy_planner import (
    apply_app,
    default_candidates,
    plan_serving,
    plan_to_json,
)
from convnet_approximater_tpu.models import ConvNeXt

KEY = jax.random.key(0)
SHAPE = (4, 32, 32, 3)


def _make_convnext():
    # fold_in: every candidate must see the SAME weights (the planner
    # compares surfaces of one model, not different random models)
    m = ConvNeXt(num_classes=10, depths=(1, 1, 1, 1), dims=(8, 12, 16, 20))
    v = {"params": m.init(jax.random.fold_in(KEY, 7)), "state": {}}
    return m, v


def _fake_timer(times_by_name):
    def time_fn(name, model, variables, shape, dtype):
        return times_by_name.get(name, 1.0)
    return time_fn


def test_default_candidates_cover_convnext():
    m, _ = _make_convnext()
    names = [n for n, _ in default_candidates(m)]
    # ConvNeXt has depthwise 7x7s AND dense kxk (downsample) convs
    assert names[0] == "dense/bfloat16"
    assert "int8" in names
    assert any(n.startswith("v3/") for n in names)
    assert any(n.startswith("tucker/") for n in names)
    assert any(n.startswith("dwsep/") and "int8" not in n for n in names)
    assert any("dwsep" in n and "int8" in n for n in names)


def test_planner_picks_fastest_qualified():
    fake = _fake_timer({"dense/float32": 0.010, "dense/bfloat16": 0.008,
                        "int8": 0.004, "v3/e=0.9": 0.006,
                        "dwsep/r=1": 0.007, "dwsep/r=1+int8": 0.005})
    plan = plan_serving(_make_convnext, SHAPE, time_fn=fake,
                        min_agree=0.0, verbose=False)
    assert plan["winner"] == "int8"
    assert plan["speedup_vs_dense"] == pytest.approx(2.0)
    rows = {r["name"]: r for r in plan["report"]}
    assert rows["dense/float32"]["note"] == "reference (context only)"
    assert not rows["dense/float32"]["qualified"]
    assert all(r["qualified"] for n, r in rows.items()
               if n != "dense/float32")
    # the winning surface is returned and runs at the serving dtype
    y, _, _ = plan["model"].apply(plan["variables"]["params"],
                                  jnp.ones(SHAPE, jnp.bfloat16),
                                  state=plan["variables"]["state"],
                                  training=False)
    assert y.shape == (SHAPE[0], 10)


def test_min_agree_gate_falls_back_to_dense():
    """With an unreachable agreement bar every rewritten surface is
    disqualified (needs_recovery) and the dense baseline wins even though
    the fake timer says it is the slowest — the never-lose floor."""
    fake = _fake_timer({"dense/bfloat16": 0.010, "int8": 0.001,
                        "v3/e=0.9": 0.001, "dwsep/r=1": 0.001,
                        "dwsep/r=1+int8": 0.001})
    plan = plan_serving(_make_convnext, SHAPE, time_fn=fake,
                        min_agree=1.1, verbose=False)
    assert plan["winner"] == "dense/bfloat16"
    for r in plan["report"]:
        if r["name"] not in ("dense/float32", "dense/bfloat16") \
                and r["ms"] is not None:
            assert not r["qualified"]
            assert "needs_recovery" in r["note"]


def test_planner_real_timing_smoke():
    """End-to-end with the real slope timer on tiny shapes (CPU)."""
    plan = plan_serving(_make_convnext, (2, 32, 32, 3), num_iters=2,
                        warmup=1, probe_batches=1, min_agree=0.0,
                        verbose=False)
    for r in plan["report"]:
        if r["ms"] is not None:
            assert r["ms"] > 0
    j = plan_to_json(plan)
    import json

    json.dumps(j)  # persistable
    assert j["winner"] == plan["winner"]
    assert "model" not in j


def test_apply_app_counts_and_skips():
    """apply_app returns the rewrite count; a filter matching nothing
    yields 0 (the planner's skip signal)."""
    from convnet_approximater_tpu.core import DwSepRep
    from convnet_approximater_tpu.filters import DepthwiseConvFilter
    from convnet_approximater_tpu.models import AlexNet

    m, v = _make_convnext()
    n = apply_app(m, v, DwSepRep(ranks=1),
                  [DepthwiseConvFilter()], KEY)
    assert n == 4  # one dwconv per block, depths (1,1,1,1)

    a = AlexNet(num_classes=10)
    va = {"params": a.init(KEY), "state": {}}
    n0 = apply_app(a, va, DwSepRep(ranks=1),
                   [DepthwiseConvFilter()], KEY)
    assert n0 == 0  # AlexNet has no depthwise convs


def test_plan_serving_cli(tmp_path):
    """scripts/plan_serving.py end to end on a tiny config: table printed,
    plan JSON written, winner exported as a verified artifact."""
    import json
    import os
    import subprocess
    import sys

    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    cfg = tmp_path / "tiny_convnext.py"
    cfg.write_text(
        "model = dict(type='ConvNeXt', num_classes=10,\n"
        "             depths=(1, 1, 1, 1), dims=(8, 12, 16, 20))\n"
        "seed = 0\n")
    plan_path = tmp_path / "plan.json"
    art = tmp_path / "winner.stablehlo"
    env = dict(os.environ, JAX_PLATFORMS="cpu")
    r = subprocess.run(
        [sys.executable, os.path.join(root, "scripts/plan_serving.py"),
         "--config", str(cfg), "--batch", "2",
         "--input-size", "32", "32", "3", "--min-agree", "0.0",
         "--out", str(plan_path), "--export", str(art),
         "--skip", "trunk+",  # the quad candidates re-time the whole
         # arbitrated rep on CPU — minutes the smoke doesn't need
         "--platform", "cpu"],
        capture_output=True, text=True, timeout=900, env=env)
    assert r.returncode == 0, r.stderr[-3000:]
    out = r.stderr + r.stdout
    assert "winner:" in out
    plan = json.loads(plan_path.read_text())
    assert plan["winner"] in {r_["name"] for r_ in plan["report"]}
    assert art.exists() and (tmp_path / "winner.stablehlo.params.npz").exists()
    meta = json.loads((tmp_path / "winner.stablehlo.meta.json").read_text())
    assert meta["surface"] == plan["winner"]


def _make_mscan():
    from convnet_approximater_tpu.models import MSCAN_Classifier

    m = MSCAN_Classifier(num_channels=(8, 16), num_blocks=(2, 2),
                         exp_ratios=(4, 4), num_classes=7)
    v = {"params": m.init(jax.random.fold_in(KEY, 9)),
         "state": m.init_state()}
    return m, v


def test_default_candidates_msca_gated_by_structure():
    m, _ = _make_mscan()
    names = [n for n, _ in default_candidates(m)]
    assert any(n.startswith("mscarep/") for n in names)
    m2, _ = _make_convnext()  # no MSCA attention -> no mscarep candidate
    assert not any(n.startswith("mscarep/")
                   for n, _ in default_candidates(m2))


def test_planner_mscarep_candidate_builds():
    """build_mscarep end to end on a tiny MSCAN: MSCA-rep + per-stage
    arbitrated FfnRep + BN fold + cast; the surface runs and is ranked."""
    shape = (2, 32, 32, 3)
    cands = [c for c in default_candidates(_make_mscan()[0],
                                           input_shape=shape)
             if c[0].startswith(("dense/", "mscarep/"))]
    plan = plan_serving(_make_mscan, shape, candidates=cands, num_iters=2,
                        warmup=1, probe_batches=1, min_agree=0.0,
                        verbose=False)
    row = next(r for r in plan["report"] if r["name"].startswith("mscarep/"))
    assert row["ms"] is not None and row["ms"] > 0
    assert row["agree"] is not None
    # surface executes at the serving dtype with BN folded
    m, v = plan["model"], plan["variables"]
    if plan["winner"].startswith("mscarep/"):
        y, _, _ = m.apply(v["params"], jnp.ones(shape, jnp.bfloat16),
                          state=v["state"], training=False)
        assert y.shape == (2, 7)


def test_prune_candidates_gated_by_structure():
    from convnet_approximater_tpu.deploy_planner import default_candidates

    m, _ = _make_mscan()
    names = [n for n, _ in default_candidates(m)]
    assert "ffnprune/0.5+mscarep" in names
    assert not any(n.startswith("mlpprune/") for n in names)
    m2, _ = _make_convnext()
    names2 = [n for n, _ in default_candidates(m2)]
    assert "mlpprune/0.5" in names2 and "mlpprune/0.5+int8" in names2
    assert not any(n.startswith("ffnprune/") for n in names2)


def test_planner_prune_candidate_builds():
    """The ffnprune+mscarep stack builds end-to-end through plan_serving
    (two-pass calibrated apply_app inside a candidate builder) and is
    ranked with an agreement grade."""
    shape = (2, 32, 32, 3)
    cands = [c for c in default_candidates(_make_mscan()[0],
                                           input_shape=shape)
             if c[0].startswith(("dense/", "ffnprune/"))]
    plan = plan_serving(_make_mscan, shape, candidates=cands, num_iters=2,
                        warmup=1, probe_batches=1, min_agree=0.0,
                        verbose=False)
    row = next(r for r in plan["report"] if r["name"].startswith("ffnprune/"))
    assert row["ms"] is not None and row["ms"] > 0
    assert row["agree"] is not None


def test_planner_segmentation_per_pixel_agreement():
    """plan_serving generalizes to segmentation unchanged: SegNeXt logits
    are (B, H/8, W/8, K), so the agreement gate's argmax(-1) grades
    PER-PIXEL top-1 vs the dense f32 reference."""
    from convnet_approximater_tpu.segmentation import SegNeXt

    def make():
        m = SegNeXt(num_channels=(8, 8, 16, 16), num_blocks=(1, 1, 1, 1),
                    exp_ratios=(2, 2, 2, 2), num_classes=5,
                    ham_channels=8, ham_rank=4, ham_iters=2)
        v = {"params": m.init(jax.random.fold_in(KEY, 11)),
             "state": m.init_state()}
        return m, v

    shape = (2, 64, 64, 3)
    cands = [c for c in default_candidates(make()[0], input_shape=shape)
             if c[0].startswith(("dense/", "mscarep/"))]
    plan = plan_serving(make, shape, candidates=cands, num_iters=2,
                        warmup=1, probe_batches=1, min_agree=0.0,
                        verbose=False)
    row = next(r for r in plan["report"] if r["name"].startswith("mscarep/"))
    assert row["ms"] is not None and row["ms"] > 0
    # MSCA-rep is exact algebra; only the bf16 cast can flip borderline
    # pixels on random weights — agreement stays high
    assert 0.5 <= row["agree"] <= 1.0


def test_recovery_plan_mapping():
    from convnet_approximater_tpu.deploy_planner import recovery_plan

    assert recovery_plan("dense/bfloat16") == []
    assert recovery_plan("mscarep/d1+fix+dconv0+arb-ffnrep") == []
    v3 = recovery_plan("v3/e=0.9", v3_energy=0.9)
    assert v3[0]["app"]["type"] == "LowRankExpV3" and v3[0]["calibration"]
    # triple stack: stages in builder order (prune, dwsep), then QAT
    s = recovery_plan("dwsep/r=1+mlpprune/0.5+int8")
    kinds = [("qat" if st.get("qat") else st["app"]["type"]) for st in s]
    assert kinds == ["MlpPrune", "DwSepRep", "qat"]
    assert recovery_plan("int8") == [dict(qat=True)]


def test_emit_recovery_cli_and_chain_runs(tmp_path):
    """plan_serving.py --emit-recovery writes chained configs for gated
    surfaces, and an emitted config (placeholders filled the documented
    way) runs end-to-end through scripts/main.py."""
    import os
    import subprocess
    import sys

    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    cfg = tmp_path / "tiny_mscan.py"
    cfg.write_text(
        "model = dict(type='MSCAN_Classifier', num_channels=(8, 16),\n"
        "             num_blocks=(1, 1), exp_ratios=(4, 4), num_classes=7)\n"
        "seed = 0\n")
    rec_dir = tmp_path / "recovery"
    env = dict(os.environ, JAX_PLATFORMS="cpu")
    # min-agree > 1 gates every lossy surface -> recovery emitted for all
    r = subprocess.run(
        [sys.executable, os.path.join(root, "scripts/plan_serving.py"),
         "--config", str(cfg), "--batch", "2",
         "--input-size", "32", "32", "3", "--min-agree", "1.01",
         "--out", str(tmp_path / "plan.json"),
         "--emit-recovery", str(rec_dir),
         "--recovery-epochs", "1", "--recovery-ce-epochs", "1",
         "--skip", "trunk+",
         "--platform", "cpu"],
        capture_output=True, text=True, timeout=1200, env=env)
    assert r.returncode == 0, r.stderr[-3000:]
    emitted = sorted(os.listdir(rec_dir))
    assert any("ffnprune" in e for e in emitted), emitted
    assert any("v3" in e for e in emitted), emitted
    # fill the documented placeholders and run the ffnprune stage
    p = rec_dir / next(e for e in emitted if "ffnprune" in e)
    body = p.read_text()
    assert "_base_" in body and "CalibrationHook" in body
    body = body.replace("num_classes=10)  # FILL", "num_classes=7)")
    body = body.replace("NUM_CLASSES = 10  # FILL", "NUM_CLASSES = 7")
    p.write_text(body)
    r2 = subprocess.run(
        [sys.executable, os.path.join(root, "scripts/main.py"),
         "--config", str(p), "--work-dir", str(tmp_path / "work"),
         "--platform", "cpu"],
        capture_output=True, text=True, timeout=1200, env=env)
    assert r2.returncode == 0, r2.stderr[-3000:]


def test_plan_reuse_replays_winner_without_timing():
    """VERDICT r4 #5: a persisted plan is replayed — only the stored winner
    is rebuilt, nothing is re-timed, so repeated runs yield the identical
    structure even when fresh timings would pick a different winner."""
    fake = _fake_timer({"dense/float32": 0.010, "dense/bfloat16": 0.008,
                        "int8": 0.004, "v3/e=0.9": 0.006,
                        "dwsep/r=1": 0.007, "dwsep/r=1+int8": 0.005})
    plan = plan_serving(_make_convnext, SHAPE, time_fn=fake,
                        min_agree=0.0, verbose=False)
    stored = plan_to_json(plan)
    assert stored["winner"] == "int8"

    def poisoned(*a, **k):
        raise AssertionError("reuse_plan must not re-time")

    plan2 = plan_serving(_make_convnext, SHAPE, time_fn=poisoned,
                         min_agree=0.0, verbose=False, reuse_plan=stored)
    assert plan2["replayed"] and plan2["winner"] == "int8"
    assert plan2["report"] == stored["report"]
    y, _, _ = plan2["model"].apply(plan2["variables"]["params"],
                                   jnp.ones(SHAPE, jnp.bfloat16),
                                   state=plan2["variables"]["state"],
                                   training=False)
    assert y.shape == (SHAPE[0], 10)

    # a stale winner (not among current candidates) falls back to measuring
    stale = dict(stored, winner="gone/surface")
    fake2 = _fake_timer({"dense/float32": 0.010, "dense/bfloat16": 0.008,
                         "v3/e=0.9": 0.002, "int8": 0.004,
                         "dwsep/r=1": 0.007, "dwsep/r=1+int8": 0.005})
    plan3 = plan_serving(_make_convnext, SHAPE, time_fn=fake2,
                         min_agree=0.0, verbose=False, reuse_plan=stale)
    assert plan3["winner"] == "v3/e=0.9" and "replayed" not in plan3
