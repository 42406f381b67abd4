"""Deploy-time BN folding: exactness + structure/param-tree pairing."""

import jax
import jax.numpy as jnp
import pytest

import convnet_approximater_tpu.nn as nn
from convnet_approximater_tpu.deploy import fold_batchnorm
from convnet_approximater_tpu.models import MSCAN_Classifier
from convnet_approximater_tpu.nn import Identity

KEY = jax.random.PRNGKey(0)


def _randomize_bn_state(state):
    """Fresh-init BN stats are (0,1) — make them non-trivial so the fold is
    actually exercised."""
    def walk(node, key):
        if isinstance(node, dict):
            for i, (k, v) in enumerate(sorted(node.items())):
                sub = jax.random.fold_in(key, i)
                if k == "mean" and not isinstance(v, dict):
                    node[k] = jax.random.normal(sub, v.shape) * 0.5
                elif k == "var" and not isinstance(v, dict):
                    node[k] = jax.random.uniform(sub, v.shape, minval=0.3, maxval=2.0)
                else:
                    walk(v, sub)
    walk(state, KEY)


def test_fold_batchnorm_sequential_exact():
    model = nn.Sequential(
        nn.Conv2d(3, 8, 3, stride=2, padding=1),
        nn.BatchNorm2d(8),
        nn.GELU(),
        nn.Conv2d(8, 16, 3, padding=1, bias=False),
        nn.BatchNorm2d(16),
    )
    params = model.init(KEY)
    state = model.init_state()
    _randomize_bn_state(state)
    x = jax.random.normal(KEY, (2, 16, 16, 3))
    y_ref, _, _ = model.apply(params, x, state=state, training=False)

    variables = {"params": params, "state": state}
    n = fold_batchnorm(model, variables)
    assert n == 2
    assert isinstance(model[1], Identity) and isinstance(model[4], Identity)
    assert "1" not in variables["params"] and "4" not in variables["params"]
    assert "bias" in variables["params"]["3"]  # bias=False conv gained one
    y, _, _ = model.apply(variables["params"], x,
                          state=variables["state"], training=False)
    assert jnp.max(jnp.abs(y - y_ref)) < 1e-5


def test_fold_batchnorm_mscan_model_level():
    """Stem + 3 DownSamples fold; whole-model outputs unchanged."""
    model = MSCAN_Classifier(num_classes=10, num_channels=(8, 12, 16, 20),
                             num_blocks=(1, 1, 1, 1), exp_ratios=(2, 2, 2, 2))
    variables = {"params": model.init(KEY), "state": model.init_state()}
    _randomize_bn_state(variables["state"])
    x = jax.random.normal(KEY, (2, 64, 64, 3))
    y_ref, _, _ = model.apply(variables["params"], x,
                              state=variables["state"], training=False)
    n = fold_batchnorm(model, variables)
    assert n == 5  # stem conv1+conv2, downsample x3
    y, _, _ = model.apply(variables["params"], x,
                          state=variables["state"], training=False)
    assert jnp.max(jnp.abs(y - y_ref)) < 1e-4
    # block-internal norm1/norm2 BNs must survive (pre-norm, not foldable)
    kept = [p for p, m in model.named_modules()
            if isinstance(m, nn.layers.BatchNorm2d)]
    assert any("norm1" in p for p in kept) and any("norm2" in p for p in kept)


def test_fold_batchnorm_training_forward_differs():
    """Folded models are serving-only: training-mode BN would recompute batch
    stats, so the transform must not silently equal the training path."""
    model = nn.Sequential(nn.Conv2d(3, 4, 3, padding=1), nn.BatchNorm2d(4))
    params = model.init(KEY)
    state = model.init_state()
    _randomize_bn_state(state)
    x = jax.random.normal(KEY, (4, 8, 8, 3))
    y_train, _, _ = model.apply(params, x, state=state, training=True)
    variables = {"params": params, "state": state}
    fold_batchnorm(model, variables)
    y_fold, _, _ = model.apply(variables["params"], x,
                               state=variables["state"], training=False)
    assert jnp.max(jnp.abs(y_fold - y_train)) > 1e-3


def test_compile_serving_matches_default_jit():
    """AUTO-layout serving session: same numerics, pre-formatted inputs."""
    from convnet_approximater_tpu.deploy import compile_serving

    m = nn.Sequential(nn.Conv2d(3, 8, 3, padding=1), nn.GELU(),
                      nn.Conv2d(8, 4, 3, padding=1))
    params = m.init(KEY)

    def fwd(p, x):
        y, _, _ = m.apply(p, x, training=False)
        return y

    x = jax.random.normal(KEY, (2, 16, 16, 3))
    compiled, put = compile_serving(fwd, params, x)
    p2, x2 = put(params, x)
    assert jnp.max(jnp.abs(compiled(p2, x2) - fwd(params, x))) < 1e-6


def test_fold_batchnorm_idempotent():
    model = nn.Sequential(nn.Conv2d(3, 4, 3), nn.BatchNorm2d(4))
    variables = {"params": model.init(KEY), "state": model.init_state()}
    fold_batchnorm(model, variables)
    assert fold_batchnorm(model, variables) == 0


if __name__ == "__main__":
    pytest.main([__file__, "-q"])


def test_pointwise_matmul_exact():
    """1x1-as-matmul lowering matches the conv emitter bit-for-bit in f32
    (same f32 accumulate), including bias."""
    import os

    from convnet_approximater_tpu.ops import conv as conv_ops

    x = jax.random.normal(KEY, (2, 14, 14, 16))
    w = jax.random.normal(jax.random.fold_in(KEY, 1), (1, 1, 16, 24)) * 0.1
    b = jax.random.normal(jax.random.fold_in(KEY, 2), (24,)) * 0.1
    y_conv = conv_ops.conv2d(x, w, b)
    try:
        os.environ["CAT_PW_MATMUL"] = "1"
        conv_ops._pw_matmul_env.cache_clear()
        y_mm = conv_ops.conv2d(x, w, b)
    finally:
        os.environ.pop("CAT_PW_MATMUL", None)
        conv_ops._pw_matmul_env.cache_clear()
    assert jnp.max(jnp.abs(y_mm - y_conv)) < 1e-5


def test_enable_pw_matmul_selects_only_qualifying():
    from convnet_approximater_tpu.deploy import enable_pw_matmul

    model = nn.Sequential(
        nn.Conv2d(8, 16, 1),                 # qualifies
        nn.Conv2d(16, 16, 3, padding=1),     # k=3: no
        nn.Conv2d(16, 16, 1, groups=2),      # grouped: no
        nn.Conv2d(16, 16, 1, stride=2),      # strided: no
        nn.Conv2d(16, 8, 1),                 # qualifies
    )
    n = enable_pw_matmul(model)
    assert n == 2
    flags = [m.pw_matmul for _, m in model.named_modules()
             if isinstance(m, nn.Conv2d)]
    assert flags == [True, False, False, False, True]
    assert enable_pw_matmul(model) == 0  # idempotent


def test_enable_pw_matmul_mscan_numerics_unchanged():
    """Flag-setting rewrite: no params change, eval forward identical on CPU
    (the matmul lowering itself only engages on TPU backends)."""
    from convnet_approximater_tpu.deploy import enable_pw_matmul

    model = MSCAN_Classifier(num_classes=10, num_channels=(8, 12, 16, 20),
                             num_blocks=(1, 1, 1, 1), exp_ratios=(2, 2, 2, 2))
    variables = {"params": model.init(KEY), "state": model.init_state()}
    x = jax.random.normal(KEY, (2, 32, 32, 3))
    y0, _, _ = model.apply(variables["params"], x, state=variables["state"],
                           training=False)
    assert enable_pw_matmul(model) > 0
    y1, _, _ = model.apply(variables["params"], x, state=variables["state"],
                           training=False)
    assert jnp.max(jnp.abs(y1 - y0)) == 0


def test_space_to_depth_stem_exact():
    """S2D stem rewrite (deploy.SpaceToDepthConv): bit-level equivalent
    contraction, 4x lane width, reshape instead of layout copy."""
    from convnet_approximater_tpu.deploy import space_to_depth_stem

    model = nn.Sequential(
        nn.Conv2d(3, 16, 3, stride=2, padding=1),
        nn.GELU(),
        nn.Conv2d(16, 24, 3, stride=2, padding=1),  # C_in 16 > 4: untouched
    )
    params = model.init(KEY)
    x = jax.random.normal(KEY, (2, 32, 32, 3))
    y_ref, _, _ = model.apply(params, x, training=False)

    variables = {"params": params}
    n = space_to_depth_stem(model, variables)
    assert n == 1
    from convnet_approximater_tpu.deploy import SpaceToDepthConv

    assert isinstance(model[0], SpaceToDepthConv)
    assert variables["params"]["0"]["weight"].shape == (2, 2, 12, 16)
    y, _, _ = model.apply(variables["params"], x, training=False)
    assert y.shape == y_ref.shape
    assert float(jnp.max(jnp.abs(y - y_ref))) < 1e-5

    # pre-blocked host input path
    model[0].expects_s2d_input = True
    xs2d = SpaceToDepthConv.s2d(x)
    y2, _, _ = model.apply(variables["params"], xs2d, training=False)
    assert float(jnp.max(jnp.abs(y2 - y_ref))) < 1e-5


def test_export_serving_roundtrip(tmp_path):
    """StableHLO serving artifact: export -> file -> deserialize -> same
    numerics, with no reference to the model object."""
    from convnet_approximater_tpu.deploy import export_serving, load_serving

    m = nn.Sequential(nn.Conv2d(3, 8, 3, padding=1), nn.GELU(),
                      nn.Conv2d(8, 4, 3, padding=1))
    params = m.init(KEY)

    def fwd(p, x):
        y, _, _ = m.apply(p, x, training=False)
        return y

    x = jax.random.normal(KEY, (2, 16, 16, 3))
    path = str(tmp_path / "model.stablehlo")
    data = export_serving(fwd, (params, x), path=path)
    assert isinstance(data, (bytes, bytearray)) and len(data) > 0

    served = load_serving(path)
    assert jnp.max(jnp.abs(served(params, x) - fwd(params, x))) < 1e-6
    # bytes path too
    served2 = load_serving(data)
    assert jnp.max(jnp.abs(served2(params, x) - fwd(params, x))) < 1e-6


def test_fold_batchnorm_resnet_bottleneck_block():
    """The Bottleneck fold pattern (conv1/2/3 -> bn1/2/3 plus the downsample
    Sequential) folds exactly on a single block."""
    from convnet_approximater_tpu.models.resnet import Bottleneck

    block = Bottleneck(16, 8, stride=2)
    params = block.init(KEY)
    state = block.init_state()
    _randomize_bn_state(state)
    x = jax.random.normal(KEY, (2, 16, 16, 16))
    y_ref, _, _ = block.apply(params, x, state=state, training=False)

    variables = {"params": params, "state": state}
    n = fold_batchnorm(block, variables)
    assert n == 4  # conv1/2/3 + downsample proj
    y, _, _ = block.apply(variables["params"], x,
                          state=variables["state"], training=False)
    assert jnp.max(jnp.abs(y - y_ref)) < 2e-4


def test_fold_batchnorm_resnet_whole_model():
    """ResNet-18 folds ALL 20 conv->BN pairs (stem + blocks + downsample
    Sequentials) and the folded eval forward matches exactly."""
    from convnet_approximater_tpu.models import ResNet

    model = ResNet(depth=18, num_classes=10)
    params = model.init(KEY)
    state = model.init_state()
    _randomize_bn_state(state)
    x = jax.random.normal(KEY, (2, 64, 64, 3))
    y_ref, _, _ = model.apply(params, x, state=state, training=False)

    variables = {"params": params, "state": state}
    n = fold_batchnorm(model, variables)
    assert n == 20
    y, _, _ = model.apply(variables["params"], x,
                          state=variables["state"], training=False)
    assert jnp.max(jnp.abs(y - y_ref)) < 2e-4


def test_fold_batchnorm_through_v3_resnet():
    """BN folds THROUGH a V3-decomposed conv site into its 1x1 mix_conv
    (deploy.FOLD_TAILS), so decomposed ResNets keep the BN-free serving
    surface.  Exactness vs the decomposed-but-unfolded forward."""
    from convnet_approximater_tpu.core import LowRankExpV3
    from convnet_approximater_tpu.filters import KernelSizeFilter
    from convnet_approximater_tpu.layers import LowRankExpConvV3
    from convnet_approximater_tpu.models import ResNet

    model = ResNet(depth=18, num_classes=10)
    variables = {"params": model.init(KEY), "state": model.init_state()}
    _randomize_bn_state(variables["state"])
    app = LowRankExpV3(num_bases=(32,) * 16, deploy=True)
    model.register_switchable(app.src_type, [KernelSizeFilter(min_kernel=2, max_kernel=5)])
    assert model.length_switchable == 16
    for idx in range(model.length_switchable):
        from convnet_approximater_tpu.utils.serialize import tree_get
        name = model.switchable_names[idx]
        src = model.get_switchable_module(idx)
        sub, sp = app.initialize(src, tree_get(variables["params"], name), KEY)
        model.set_switchable_module(idx, sub, variables, {"params": sp})

    x = jax.random.normal(KEY, (2, 64, 64, 3))
    y_ref, _, _ = model.apply(variables["params"], x,
                              state=variables["state"], training=False)
    n = fold_batchnorm(model, variables)
    assert n == 20  # every pair still folds, 16 of them through V3 tails
    # the V3 mix convs now carry the folded bias
    n_v3 = 0
    for _, mod in model.named_modules():
        if isinstance(mod, LowRankExpConvV3):
            assert mod.mix_conv.use_bias
            n_v3 += 1
    assert n_v3 == 16
    y, _, _ = model.apply(variables["params"], x,
                          state=variables["state"], training=False)
    assert jnp.max(jnp.abs(y - y_ref)) < 2e-4


def test_fold_batchnorm_substitution_both_branches():
    """A live Substitution feeding a BN absorbs the fold into BOTH branch
    terminal convs, so old/new branch switching stays exact after the fold."""
    from convnet_approximater_tpu.layers import LowRankExpConvV3, Substitution
    from convnet_approximater_tpu.nn.module import Ctx

    old = nn.Conv2d(3, 8, 3, padding=1, bias=False)
    new = LowRankExpConvV3(3, 8, num_base=4, kernel_size=3, stride=1, padding=1)
    model = nn.Sequential(Substitution(old, new), nn.BatchNorm2d(8))
    params = model.init(KEY)
    state = model.init_state()
    _randomize_bn_state(state)
    x = jax.random.normal(KEY, (2, 16, 16, 3))

    def fwd(branch):
        ctx = Ctx(training=False, state=state, force_branch=branch)
        return model(params, x, ctx)

    y_old_ref, y_new_ref = fwd("old"), fwd("new")
    variables = {"params": params, "state": state}
    n = fold_batchnorm(model, variables)
    assert n == 1
    params, state = variables["params"], variables["state"]
    assert jnp.max(jnp.abs(fwd("old") - y_old_ref)) < 2e-4
    assert jnp.max(jnp.abs(fwd("new") - y_new_ref)) < 2e-4


def test_export_serving_symbolic_batch(tmp_path):
    """symbolic_batch=True: one artifact serves any batch size."""
    from convnet_approximater_tpu.deploy import export_serving, load_serving

    m = nn.Sequential(nn.Conv2d(3, 8, 3, padding=1), nn.GELU(),
                      nn.Conv2d(8, 4, 1))
    params = m.init(KEY)

    def fwd(p, x):
        y, _, _ = m.apply(p, x, training=False)
        return y

    x0 = jax.random.normal(KEY, (2, 16, 16, 3))
    path = str(tmp_path / "poly.stablehlo")
    export_serving(fwd, (params, x0), path=path, symbolic_batch=True)
    served = load_serving(path)
    for B in (1, 2, 8):
        x = jax.random.normal(jax.random.fold_in(KEY, B), (B, 16, 16, 3))
        assert jnp.max(jnp.abs(served(params, x) - fwd(params, x))) < 1e-6


def test_pad_batch_wrapper():
    """pad_batch: sub-min batches run padded and slice back exactly;
    >=min batches pass through untouched."""
    from convnet_approximater_tpu.deploy import pad_batch

    m = nn.Sequential(nn.Conv2d(3, 8, 3, padding=1), nn.GELU(),
                      nn.Conv2d(8, 4, 1))
    params = m.init(KEY)

    calls = []

    def fwd(p, x):
        calls.append(x.shape[0])
        y, _, _ = m.apply(p, x, training=False)
        return y.mean(axis=(1, 2))

    served = pad_batch(fwd, min_batch=4)
    x1 = jax.random.normal(KEY, (1, 16, 16, 3))
    y1 = served(params, x1)
    assert y1.shape[0] == 1 and calls[-1] == 4
    assert jnp.max(jnp.abs(y1 - fwd(params, x1)[:1])) < 1e-6
    x3 = jax.random.normal(KEY, (3, 16, 16, 3))
    assert served(params, x3).shape[0] == 3 and calls[-1] == 4
    x8 = jax.random.normal(KEY, (8, 16, 16, 3))
    assert served(params, x8).shape[0] == 8 and calls[-1] == 8


def test_fold_batchnorm_resnet_subclass_stem():
    """Registry subclasses (ResNet50 etc.) inherit the family FOLD_PATTERNS
    via the MRO walk — the stem conv1/bn1 must fold too (53 pairs on a
    Bottleneck-50, not 52)."""
    from convnet_approximater_tpu.models.resnet import ResNet50

    model = ResNet50(num_classes=10)
    variables = {"params": model.init(KEY), "state": model.init_state()}
    _randomize_bn_state(variables["state"])
    x = jax.random.normal(KEY, (1, 64, 64, 3))
    y_ref, _, _ = model.apply(variables["params"], x,
                              state=variables["state"], training=False)
    n = fold_batchnorm(model, variables)
    assert n == 53
    y, _, _ = model.apply(variables["params"], x,
                          state=variables["state"], training=False)
    assert jnp.max(jnp.abs(y - y_ref)) < 3e-4


def test_pad_batch_rejects_batchfree_leaves():
    """pad_batch refuses forwards whose outputs carry batch-free aux
    leaves (they would be silently truncated by the slice-back)."""
    import pytest

    from convnet_approximater_tpu.deploy import pad_batch

    def fwd(x):
        return {"logits": x * 2.0, "aux_scalar": jnp.float32(1.0)}

    served = pad_batch(fwd, min_batch=4)
    with pytest.raises(ValueError, match="no leading batch dim"):
        served(jnp.ones((1, 3)))


def test_chunk_batch_wrapper():
    """chunk_batch: over-max batches run as sequential chunks (exact
    concat, remainder handled); <=max passes through untouched."""
    from convnet_approximater_tpu.deploy import chunk_batch, pad_batch

    m = nn.Sequential(nn.Conv2d(3, 8, 3, padding=1), nn.GELU(),
                      nn.Conv2d(8, 4, 1))
    params = m.init(KEY)

    calls = []

    def fwd(p, x):
        calls.append(x.shape[0])
        y, _, _ = m.apply(p, x, training=False)
        return y.mean(axis=(1, 2))

    served = chunk_batch(fwd, max_batch=4)
    x3 = jax.random.normal(KEY, (3, 16, 16, 3))
    assert served(params, x3).shape[0] == 3 and calls[-1] == 3
    x10 = jax.random.normal(jax.random.fold_in(KEY, 1), (10, 16, 16, 3))
    y = served(params, x10)
    assert y.shape[0] == 10 and calls[-3:] == [4, 4, 2]
    assert jnp.max(jnp.abs(y - fwd(params, x10))) < 1e-6

    # composes with pad_batch to clamp both ends of the sweep — pad INSIDE
    # chunk, so a size-1 remainder chunk still gets the min-batch padding
    both = chunk_batch(pad_batch(fwd, 2), 4)
    x1 = jax.random.normal(jax.random.fold_in(KEY, 2), (1, 16, 16, 3))
    assert both(params, x1).shape[0] == 1 and calls[-1] == 2
    x9 = jax.random.normal(jax.random.fold_in(KEY, 3), (9, 16, 16, 3))
    y9 = both(params, x9)
    assert y9.shape[0] == 9 and calls[-3:] == [4, 4, 2]  # remainder padded
    assert jnp.max(jnp.abs(y9 - fwd(params, x9))) < 1e-6


def test_chunk_batch_rejects_batchfree_leaves():
    import pytest

    from convnet_approximater_tpu.deploy import chunk_batch

    def fwd(x):
        return {"logits": x * 2.0, "aux_scalar": jnp.float32(1.0)}

    served = chunk_batch(fwd, max_batch=2)
    with pytest.raises(ValueError, match="no leading batch dim"):
        served(jnp.ones((5, 3)))


def test_pad_batch_to_multiple():
    """pad_batch_to_multiple: any batch is padded up to the next multiple
    (the data-parallel device_put constraint) and sliced back exactly;
    dividing batches pass through; composes under chunk_batch so a
    remainder chunk is padded too."""
    from convnet_approximater_tpu.deploy import (chunk_batch,
                                                 pad_batch_to_multiple)

    calls = []

    def fwd(x):
        assert x.shape[0] % 4 == 0, x.shape
        calls.append(x.shape[0])
        return x * 2.0

    served = pad_batch_to_multiple(fwd, 4)
    x = jnp.arange(12 * 3, dtype=jnp.float32).reshape(12, 3)
    assert served(x).shape[0] == 12 and calls[-1] == 12  # pass-through
    y5 = served(x[:5])
    assert y5.shape[0] == 5 and calls[-1] == 8
    assert jnp.max(jnp.abs(y5 - x[:5] * 2.0)) == 0.0
    y1 = served(x[:1])
    assert y1.shape[0] == 1 and calls[-1] == 4

    both = chunk_batch(served, 8)
    y11 = both(x[:11])  # chunks 8 + 3 -> the 3-row remainder pads to 4
    assert y11.shape[0] == 11 and calls[-2:] == [8, 4]
    assert jnp.max(jnp.abs(y11 - x[:11] * 2.0)) == 0.0


def test_pad_batch_to_multiple_rejects_batchfree_leaves():
    import pytest

    from convnet_approximater_tpu.deploy import pad_batch_to_multiple

    def fwd(x):
        return {"logits": x * 2.0, "aux_scalar": jnp.float32(1.0)}

    served = pad_batch_to_multiple(fwd, 4)
    with pytest.raises(ValueError, match="no leading batch dim"):
        served(jnp.ones((3, 2)))
