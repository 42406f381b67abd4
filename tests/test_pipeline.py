"""End-to-end Runner pipeline tests (the reference's Dummy-app smoke-test
mechanism, SURVEY.md §4, plus a real scheme-1 pass with deploy round-trip)."""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from convnet_approximater_tpu.runner import Runner
from convnet_approximater_tpu.utils import get_cfg, init_cfg, load_ckpt, update_cfg
from convnet_approximater_tpu.utils.config import Config


@pytest.fixture()
def small_model_cfg(tmp_path):
    """A tiny AlexNet-ish config for fast CPU pipeline runs."""

    def write(name, text):
        p = tmp_path / name
        p.write_text(text)
        return str(p)

    return write, tmp_path


def _init_global_cfg(path, tmp_path, **extra):
    init_cfg(path)
    update_cfg(work_dir=str(tmp_path / "work"), config_name="test", seed=0, **extra)
    return get_cfg()


SMALL_MODEL = """
model = dict(type="AlexNet", num_classes=10)
"""


def test_dummy_pipeline(small_model_cfg):
    write, tmp_path = small_model_cfg
    # DummyLayer-based smoke: a model with no DummyLayer children still runs
    # the full lifecycle with zero switchables.
    path = write(
        "dummy.py",
        SMALL_MODEL + "app = dict(type='Dummy')\nfilters = []\nhooks = []\n",
    )
    _init_global_cfg(path, tmp_path)
    runner = Runner()
    runner.run()
    assert runner.model.length_switchable == 0
    assert os.path.exists(runner.output_path)


def test_low_rank_pipeline_and_deploy(small_model_cfg):
    write, tmp_path = small_model_cfg
    path = write(
        "lre.py",
        SMALL_MODEL
        + """
app = dict(type="LowRankExpV1", max_iter=0, min_lmda=0, max_lmda=0,
           init_method="svd", lmda_length=1, num_bases=(8, 8, 6, 4))
filters = [
    dict(type="SimpleConvFilter"),
    dict(type="IndicesFilter", indices=(2, 3, 4, 5)),
]
hooks = []
""",
    )
    _init_global_cfg(path, tmp_path)
    runner = Runner()
    runner.run()
    assert runner.model.length_switchable == 4
    # after postprocess the switchable slots hold bare LowRankExpConvV1
    from convnet_approximater_tpu.layers import LowRankExpConvV1

    for mod in runner.model.switchable_modules():
        assert isinstance(mod, LowRankExpConvV1)
    # forward works on the final model
    x = jnp.ones((1, 96, 96, 3))
    y, _, _ = runner.model.apply(runner.variables["params"], x)
    assert y.shape == (1, 10)
    ckpt_path = runner.output_path
    assert os.path.exists(ckpt_path)

    # -- deploy mode: rebuild, load, same outputs ------------------------
    _init_global_cfg(path, tmp_path, checkpoint=ckpt_path)
    runner2 = Runner(deploy=True, skip_optim=True, skip_post=True)
    runner2.run()
    y2, _, _ = runner2.model.apply(runner2.variables["params"], x)
    np.testing.assert_allclose(np.asarray(y), np.asarray(y2), rtol=1e-5, atol=1e-5)


def test_ckpt_hook_save_and_load(small_model_cfg):
    write, tmp_path = small_model_cfg
    save_path = str(tmp_path / "stage.ckpt.npz")
    path = write(
        "ck.py",
        SMALL_MODEL
        + f"""
app = dict(type="LowRankExpV1", max_iter=0, min_lmda=0, max_lmda=0,
           init_method="svd", lmda_length=1, num_bases=(8,))
filters = [dict(type="SimpleConvFilter"), dict(type="IndicesFilter", indices=(2,))]
hooks = [dict(type="CkptHook", priority=50,
              ckpt_cfg=dict(after_optimize=dict(action="save", path=r"{save_path}")))]
""",
    )
    _init_global_cfg(path, tmp_path)
    runner = Runner()
    runner.run()
    assert os.path.exists(save_path)
    loaded = load_ckpt(save_path)
    assert "params" in loaded


def test_model_analysis_hook(small_model_cfg):
    write, tmp_path = small_model_cfg
    path = write(
        "ma.py",
        SMALL_MODEL
        + """
app = dict(type="Dummy")
filters = []
hooks = [dict(type="ModelAnalysis", priority=40, input_shape=(96, 96, 3))]
""",
    )
    _init_global_cfg(path, tmp_path)
    runner = Runner()
    runner.run()
    hook = runner.hooks[0]
    assert hook.result["params"] > 1e6
    assert np.isfinite(hook.result["flops"])


def test_config_tree_loads():
    """The shipped configs must parse and build."""
    root = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "configs")
    cfg = Config(os.path.join(root, "low-rank-exp", "low-rank-exp-v1_l2345_svd_dodecomp_alexnet.py"))
    assert cfg.app.do_decomp is True
    assert cfg.app.num_bases == (8, 8, 6, 4)
    assert cfg.model.type == "AlexNet"
    cfg2 = Config(os.path.join(root, "msca-rep", "multi_layers", "msca-rep_d1_ml6_fix_mscan-t.py"))
    assert cfg2.filters[0]["indices"] == tuple(range(1, 7))
    assert cfg2.app.decomp == 1
    cfg3 = Config(os.path.join(root, "msca-rep", "profiler", "msca-rep-profile_d2_fix_mscan-t.py"))
    assert cfg3.app.type == "MscaRepProfile" and "deploy" not in cfg3.app


def test_every_shipped_config_parses():
    """Every config in the tree (including the reference-mirror additions)
    must at least parse through the _base_ resolution machinery."""
    import glob

    root = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "configs")
    paths = [p for p in glob.glob(os.path.join(root, "**", "*.py"), recursive=True)
             if ".pytest_cache" not in p]
    assert len(paths) > 50
    for p in paths:
        cfg = Config(p)
        assert isinstance(cfg, dict) and len(cfg) > 0, p


def test_reference_mirror_configs():
    """The round-2 additions reproduce the reference's experiment matrix."""
    root = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "configs")
    lre = os.path.join(root, "low-rank-exp")
    cfg = Config(os.path.join(lre, "low-rank-exp-v1_l2_alexnet.py"))
    assert cfg.app.max_iter == 10 and cfg.app.lmda_length == 10
    assert cfg.filters[1]["indices"] == (2,)
    cfg = Config(os.path.join(lre, "low-rank-exp-v1_l2_svd_dodecomp_alexnet.py"))
    assert cfg.app.max_iter == 0 and cfg.app.do_decomp is True
    assert cfg.app.num_bases == (8,)
    for name, asym, cls_w in (
        ("low-rank-exp-v1_l2345_svd_dodecomp_ce_alexnet.py", True, 1.0),
        ("low-rank-exp-v1_l2345_svd_dodecomp_l2-aysm_alexnet.py", True, 0.0),
        ("low-rank-exp-v1_l2345_svd_dodecomp_l2-sym_alexnet.py", False, 0.0),
    ):
        cfg = Config(os.path.join(lre, name))
        hook = cfg.hooks[0]
        assert hook["type"] == "L2Reconstruct"
        assert hook["asym"] is asym and hook["cls_weight"] == cls_w
        assert cfg.app.do_decomp is True  # inherited from the dodecomp base
    cfg = Config(os.path.join(root, "msca-rep", "msca-rep_d1_mscan-t.py"))
    assert cfg.app.fix is False and cfg.app.decomp == 1


def test_quadprune_structure_pass_convnext(small_model_cfg):
    """ADVICE r4 (medium): prune_width's internal apply_app calls re-run
    register_switchable for its own apps; on ConvNeXt the LAST app in its
    tuple (MlpPrune) matches ConvNeXtBlocks, leaking them into the Runner's
    app loop where Dummy.initialize's isinstance assert crashes.  The Runner
    must re-register for the configured app after structure passes."""
    write, tmp_path = small_model_cfg
    path = write(
        "quad_convnext.py",
        "model = dict(type='ConvNeXt', num_classes=10,\n"
        "             depths=(1, 1, 1, 1), dims=(32, 32, 64, 64))\n"
        "app = dict(type='Dummy')\nfilters = []\nhooks = []\n"
        "structure_passes = [dict(fn='prune_width', keep_ratio=0.5,\n"
        "                         round_to=None, ffn_round_to=None)]\n",
    )
    _init_global_cfg(path, tmp_path)
    runner = Runner()
    runner.run()  # crashed before the re-register fix
    # Dummy's src_type (DummyLayer) matches nothing in ConvNeXt
    assert runner.model.length_switchable == 0
    # the quad pass really ran: MLP hiddens are halved
    blk = runner.model.stages[0][0]
    assert blk.hidden == 32 * 2  # 4*dim * 0.5 keep
    x = jnp.zeros((1, 32, 32, 3))
    y, _, _ = runner.model.apply(runner.variables["params"], x,
                                 state=runner.variables["state"],
                                 training=False)
    assert y.shape == (1, 10)
