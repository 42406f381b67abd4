"""Checkpoint converter scripts: substitution wrap/unwrap round-trip and
torch -> TPU layout conversion."""

import importlib.util
import os
import sys

import numpy as np
import pytest

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _load(name):
    path = os.path.join(ROOT, "scripts", "ckpt_converter", name)
    spec = importlib.util.spec_from_file_location(name[:-3], path)
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def test_add_remove_substitution_roundtrip():
    add = _load("add_substitution.py")
    rem = _load("remove_substitution.py")
    tree = {
        "params": {
            "features": {
                "3": {"weight": np.ones((3, 3, 4, 8)), "bias": np.zeros(8)},
                "0": {"weight": np.ones((3, 3, 3, 4))},
            }
        }
    }
    wrapped = add.add_substitution(tree, ["features.3"], branch="new")
    assert "new" in wrapped["params"]["features"]["3"]
    assert "weight" in wrapped["params"]["features"]["0"]  # untouched
    flat = rem.remove_substitution(wrapped, keep_branch="new")
    np.testing.assert_array_equal(
        flat["params"]["features"]["3"]["weight"], tree["params"]["features"]["3"]["weight"]
    )


def test_torch_layout_conversion():
    t2t = _load("torch_to_tpu.py")
    w = np.arange(2 * 3 * 5 * 7).reshape(2, 3, 5, 7).astype(np.float32)  # OIHW
    hwio = t2t.convert_conv(w)
    assert hwio.shape == (5, 7, 3, 2)
    np.testing.assert_array_equal(hwio[1, 2, 0, 1], w[1, 0, 1, 2])
    lw = np.arange(6).reshape(2, 3).astype(np.float32)
    assert t2t.convert_linear(lw).shape == (3, 2)


def test_torch_state_dict_conversion_with_bn():
    t2t = _load("torch_to_tpu.py")
    sd = {
        "features.0.weight": np.zeros((8, 3, 3, 3), np.float32),
        "features.0.bias": np.zeros(8, np.float32),
        "features.1.weight": np.ones(8, np.float32),  # BN scale
        "features.1.bias": np.zeros(8, np.float32),
        "features.1.running_mean": np.zeros(8, np.float32),
        "features.1.running_var": np.ones(8, np.float32),
        "features.1.num_batches_tracked": np.array(10),
        "classifier.weight": np.zeros((10, 8), np.float32),
        "classifier.bias": np.zeros(10, np.float32),
    }
    tree = t2t.convert_state_dict(sd, "generic")
    assert tree["params"]["features"]["0"]["weight"].shape == (3, 3, 3, 8)
    assert tree["params"]["features"]["1"]["scale"].shape == (8,)
    assert tree["state"]["features"]["1"]["mean"].shape == (8,)
    assert tree["params"]["classifier"]["weight"].shape == (8, 10)


def test_mscan_rename():
    t2t = _load("torch_to_tpu.py")
    key = "block1.0.attn.spatial_gating_unit.conv0_1.weight"
    out = t2t._mscan_rename(key)
    assert out == "backbone.layers.0.1.0.attn.spatial_gating_unit.sd_convs.branches.0.conv1.weight"
    assert t2t._mscan_rename("head.weight") == "head.weight"


def test_mscan_rename_block_internal_norms():
    """Stage-level normN maps to layers.N.2, but block-INTERNAL norm1/norm2
    (BatchNorms inside every block) must keep their names (ADVICE r1 high)."""
    t2t = _load("torch_to_tpu.py")
    assert t2t._mscan_rename("norm1.weight") == "backbone.layers.0.2.weight"
    assert t2t._mscan_rename("norm4.bias") == "backbone.layers.3.2.bias"
    assert (t2t._mscan_rename("block1.0.norm1.weight")
            == "backbone.layers.0.1.0.norm1.weight")
    assert (t2t._mscan_rename("block3.4.norm2.running_mean")
            == "backbone.layers.2.1.4.norm2.running_mean")
    assert (t2t._mscan_rename("block2.1.mlp.dwconv.dwconv.weight")
            == "backbone.layers.1.1.1.mlp.dconv.weight")
    assert (t2t._mscan_rename("backbone.block1.0.attn.spatial_gating_unit.conv3.weight")
            == "backbone.layers.0.1.0.attn.spatial_gating_unit.channel_mix.weight")


def test_mscan_rep_rename():
    """Fine-tuned re-parameterized checkpoints: rep_conv -> sd_convs
    (ref scripts/ckpt_converter/mscan-rep_converter.py:76-84)."""
    t2t = _load("torch_to_tpu.py")
    assert (t2t._mscan_rename("block1.0.attn.spatial_gating_unit.rep_conv.conv1.weight")
            == "backbone.layers.0.1.0.attn.spatial_gating_unit.sd_convs.conv1.weight")
    assert (t2t._mscan_rename("block4.1.attn.spatial_gating_unit.rep_conv.branches.1.conv2.bias")
            == "backbone.layers.3.1.1.attn.spatial_gating_unit.sd_convs.branches.1.conv2.bias")


def test_first_fc_flatten_permutation():
    """convert_state_dict(first_fc_shape=...) permutes the first Linear's
    input dim from CHW-major to HWC-major flatten order (ADVICE r1 medium)."""
    t2t = _load("torch_to_tpu.py")
    C, H, W, out = 3, 2, 2, 5
    w = np.arange(out * C * H * W, dtype=np.float32).reshape(out, C * H * W)
    sd = {"classifier.1.weight": w, "classifier.1.bias": np.zeros(out, np.float32),
          "classifier.4.weight": np.zeros((4, out), np.float32)}
    tree = t2t.convert_state_dict(sd, "generic", first_fc_shape=(C, H, W))
    got = tree["params"]["classifier"]["1"]["weight"]  # (in, out)
    x = np.random.RandomState(0).randn(C, H, W).astype(np.float32)
    y_torch_order = w.dot(x.reshape(-1))  # torch flatten: CHW-major
    y_ours = x.transpose(1, 2, 0).reshape(-1).dot(got)  # our flatten: HWC-major
    np.testing.assert_allclose(y_ours, y_torch_order, rtol=1e-6)
    # later linears untouched (shape transposed only)
    assert tree["params"]["classifier"]["4"]["weight"].shape == (out, 4)


def test_resnet_torchvision_checkpoint_roundtrip():
    """A torchvision-topology ResNet-18 state_dict converts with the GENERIC
    arch (no rename table) and reproduces torch's logits exactly — the
    module naming contract models/resnet.py promises."""
    torch = pytest.importorskip("torch")
    import jax
    import jax.numpy as jnp
    from convnet_approximater_tpu.models import ResNet

    tnn = torch.nn

    class TBasic(tnn.Module):
        def __init__(self, in_c, planes, stride=1):
            super().__init__()
            self.conv1 = tnn.Conv2d(in_c, planes, 3, stride, 1, bias=False)
            self.bn1 = tnn.BatchNorm2d(planes)
            self.relu = tnn.ReLU()
            self.conv2 = tnn.Conv2d(planes, planes, 3, 1, 1, bias=False)
            self.bn2 = tnn.BatchNorm2d(planes)
            self.downsample = None
            if stride != 1 or in_c != planes:
                self.downsample = tnn.Sequential(
                    tnn.Conv2d(in_c, planes, 1, stride, bias=False),
                    tnn.BatchNorm2d(planes),
                )

        def forward(self, x):
            idt = x if self.downsample is None else self.downsample(x)
            y = self.relu(self.bn1(self.conv1(x)))
            return self.relu(self.bn2(self.conv2(y)) + idt)

    class TResNet18(tnn.Module):
        def __init__(self, num_classes=13):
            super().__init__()
            self.conv1 = tnn.Conv2d(3, 64, 7, 2, 3, bias=False)
            self.bn1 = tnn.BatchNorm2d(64)
            self.relu = tnn.ReLU()
            self.maxpool = tnn.MaxPool2d(3, 2, 1)
            in_c = 64
            for i, planes in enumerate((64, 128, 256, 512)):
                blocks = []
                for j in range(2):
                    blocks.append(TBasic(in_c, planes, 2 if (i > 0 and j == 0) else 1))
                    in_c = planes
                setattr(self, f"layer{i + 1}", tnn.Sequential(*blocks))
            self.avgpool = tnn.AdaptiveAvgPool2d((1, 1))
            self.fc = tnn.Linear(512, num_classes)

        def forward(self, x):
            x = self.maxpool(self.relu(self.bn1(self.conv1(x))))
            for n in ("layer1", "layer2", "layer3", "layer4"):
                x = getattr(self, n)(x)
            return self.fc(torch.flatten(self.avgpool(x), 1))

    torch.manual_seed(0)
    tm = TResNet18()
    # non-trivial BN running stats: a couple of training-mode passes
    tm.train()
    with torch.no_grad():
        for _ in range(2):
            tm(torch.randn(4, 3, 64, 64))
    tm.eval()
    x = torch.randn(2, 3, 64, 64)
    with torch.no_grad():
        ref = tm(x).numpy()

    t2t = _load("torch_to_tpu.py")
    sd = {k: v.numpy() for k, v in tm.state_dict().items()}
    tree = t2t.convert_state_dict(sd, "generic")

    m = ResNet(depth=18, num_classes=13)
    x_nhwc = jnp.asarray(np.transpose(x.numpy(), (0, 2, 3, 1)))
    y, _, _ = m.apply(tree["params"], x_nhwc, state=tree["state"])
    np.testing.assert_allclose(np.asarray(y), ref, rtol=2e-5, atol=2e-5)
