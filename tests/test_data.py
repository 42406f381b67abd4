"""Data pipeline: datasets, loader batching/normalization/sharding, and the
native C++ batch-prep parity with the numpy path."""

import numpy as np
import pytest

from convnet_approximater_tpu.data import Loader, Npz, Synthetic, build_dataset
from convnet_approximater_tpu.data.loader import _resize_nearest


def test_synthetic_deterministic():
    a = Synthetic(16, (8, 8, 3), 4, seed=1)
    b = Synthetic(16, (8, 8, 3), 4, seed=1)
    np.testing.assert_array_equal(a.images, b.images)
    assert a.images.shape == (16, 8, 8, 3) and a.images.dtype == np.uint8


def test_npz_roundtrip(tmp_path):
    p = str(tmp_path / "d.npz")
    np.savez(p, images=np.zeros((4, 8, 8, 3), np.uint8), labels=np.arange(4))
    ds = Npz(p)
    assert len(ds) == 4


def test_build_dataset_registry():
    ds = build_dataset(dict(type="Synthetic", num_samples=8, image_size=(4, 4, 3)))
    assert len(ds) == 8


def test_loader_batches_and_epoch_shuffle():
    ds = Synthetic(32, (8, 8, 3), 4, seed=0)
    loader = Loader(ds, 8, shuffle=True, prefetch=0, mean=(0, 0, 0), std=(1, 1, 1))
    batches = list(loader)
    assert len(batches) == 4
    images, labels = batches[0]
    assert images.shape == (8, 8, 8, 3) and labels.shape == (8,)
    loader.set_epoch(1)
    batches2 = list(loader)
    assert not np.allclose(np.asarray(batches[0][0]), np.asarray(batches2[0][0]))


def test_loader_prefetch_matches_sync():
    ds = Synthetic(24, (8, 8, 3), 4, seed=0)
    kw = dict(shuffle=False, mean=(0.5, 0.5, 0.5), std=(0.25, 0.25, 0.25))
    sync = [np.asarray(b[0]) for b in Loader(ds, 8, prefetch=0, **kw)]
    pre = [np.asarray(b[0]) for b in Loader(ds, 8, prefetch=2, **kw)]
    for a, b in zip(sync, pre):
        np.testing.assert_allclose(a, b)


def test_native_prep_matches_numpy():
    from convnet_approximater_tpu.data.native import get_lib, prep_batch

    if get_lib() is None:
        pytest.skip("native batch-prep unavailable (no g++?)")
    pool = np.random.RandomState(0).randint(0, 256, (10, 12, 14, 3), dtype=np.uint8)
    idx = np.array([3, 1, 7], np.int64)
    mean = np.array([0.5, 0.4, 0.3], np.float32) * 255
    std = np.array([0.2, 0.3, 0.25], np.float32) * 255
    out = prep_batch(pool, idx, (6, 7), mean, std)
    assert out is not None and out.shape == (3, 6, 7, 3)
    ref = (_resize_nearest(pool[idx], (6, 7)).astype(np.float32) - mean) / std
    np.testing.assert_allclose(out, ref, rtol=1e-5, atol=1e-5)


def test_native_prep_no_resize():
    from convnet_approximater_tpu.data.native import get_lib, prep_batch

    if get_lib() is None:
        pytest.skip("native batch-prep unavailable")
    pool = np.random.RandomState(1).randint(0, 256, (6, 8, 8, 3), dtype=np.uint8)
    idx = np.arange(6, dtype=np.int64)
    mean = np.zeros(3, np.float32)
    std = np.ones(3, np.float32)
    out = prep_batch(pool, idx, (8, 8), mean, std)
    np.testing.assert_allclose(out, pool.astype(np.float32))


def test_loader_sharded_device_put():
    import jax
    from convnet_approximater_tpu.parallel import batch_sharding, make_mesh

    mesh = make_mesh()
    ds = Synthetic(16, (8, 8, 3), 4, seed=0)
    loader = Loader(ds, 8, sharding=batch_sharding(mesh), prefetch=0)
    images, labels = next(iter(loader))
    assert len(images.sharding.device_set) == len(jax.devices())


def test_cifar10_missing_gives_actionable_error(tmp_path):
    from convnet_approximater_tpu.data import CIFAR10

    with pytest.raises(FileNotFoundError, match="no network download"):
        CIFAR10(str(tmp_path), split="train")


def test_loader_abandoned_iteration_releases_worker():
    """Breaking out of a prefetching epoch early (max_steps_per_epoch style)
    must not strand the prefetch worker on a full queue (ADVICE r1 low)."""
    import threading
    import time

    ds = Synthetic(64, (8, 8, 3), 4, seed=0)
    loader = Loader(ds, 4, shuffle=False, prefetch=2)
    before = threading.active_count()
    for _ in range(3):
        it = iter(loader)
        next(it)  # consume one batch, then abandon
        it.close()
    deadline = time.time() + 10.0
    while threading.active_count() > before and time.time() < deadline:
        time.sleep(0.05)
    assert threading.active_count() <= before


# -- augmentation + ImageFolder (round 3: VERDICT r2 #5) -------------------

def test_augment_hflip_deterministic_and_flips():
    from convnet_approximater_tpu.data.loader import augment_batch

    imgs = np.arange(2 * 4 * 6 * 3, dtype=np.uint8).reshape(2, 4, 6, 3)
    rs1, rs2 = np.random.RandomState(3), np.random.RandomState(3)
    a = augment_batch(imgs, rs1, hflip=1.0)
    b = augment_batch(imgs, rs2, hflip=1.0)
    np.testing.assert_array_equal(a, b)
    np.testing.assert_array_equal(a, imgs[:, :, ::-1])
    # original untouched (copy semantics)
    assert imgs[0, 0, 0, 0] == 0


def test_augment_crop_pad_shape_and_content():
    from convnet_approximater_tpu.data.loader import augment_batch

    imgs = np.random.RandomState(0).randint(0, 256, (5, 8, 8, 3), np.uint8)
    out = augment_batch(imgs, np.random.RandomState(1), crop_pad=2)
    assert out.shape == imgs.shape
    padded = np.pad(imgs, ((0, 0), (2, 2), (2, 2), (0, 0)), mode="reflect")
    # every output must be SOME window of the padded image
    for i in range(5):
        found = any(
            np.array_equal(out[i], padded[i, y:y + 8, x:x + 8])
            for y in range(5) for x in range(5))
        assert found


def test_augment_rrc_resizes_to_out_size():
    from convnet_approximater_tpu.data.loader import augment_batch

    imgs = np.random.RandomState(0).randint(0, 256, (3, 16, 16, 3), np.uint8)
    out = augment_batch(imgs, np.random.RandomState(2),
                        rrc_scale=(0.3, 1.0), out_size=(8, 8))
    assert out.shape == (3, 8, 8, 3)


def test_loader_aug_path_end_to_end():
    from convnet_approximater_tpu.data import Loader, Synthetic

    ds = Synthetic(16, (10, 10, 3), 4, seed=0)
    loader = Loader(ds, 8, shuffle=True, prefetch=0, mean=(0, 0, 0),
                    std=(1, 1, 1), image_size=(8, 8),
                    aug=dict(hflip=0.5, crop_pad=2))
    batches = list(loader)
    assert len(batches) == 2
    images, labels = batches[0]
    assert images.shape == (8, 8, 8, 3)
    # deterministic per (seed, epoch): same loader state -> same batches
    again = list(loader)
    np.testing.assert_allclose(np.asarray(batches[0][0]), np.asarray(again[0][0]))
    # different epoch -> different augmentation draws
    loader.set_epoch(1)
    other = list(loader)
    assert not np.allclose(np.asarray(batches[0][0]), np.asarray(other[0][0]))


def test_image_folder_reads_class_tree(tmp_path):
    PIL = pytest.importorskip("PIL")
    from PIL import Image

    from convnet_approximater_tpu.data import build_dataset

    root = tmp_path / "train"
    for ci, cname in enumerate(["cat", "dog"]):
        d = root / cname
        d.mkdir(parents=True)
        for j in range(3):
            arr = np.full((12, 14, 3), 40 * ci + j, np.uint8)
            Image.fromarray(arr).save(d / f"img{j}.png")
    ds = build_dataset(dict(type="ImageFolder", root=str(tmp_path),
                            image_size=(8, 8)), split="train")
    assert len(ds) == 6 and ds.num_classes == 2
    assert ds.classes == ["cat", "dog"]
    assert ds.images.shape == (6, 8, 8, 3)
    np.testing.assert_array_equal(ds.labels, [0, 0, 0, 1, 1, 1])
    assert int(ds.images[0, 0, 0, 0]) == 0 and int(ds.images[3, 0, 0, 0]) == 40


def test_image_folder_missing_gives_actionable_error(tmp_path):
    from convnet_approximater_tpu.data import build_dataset

    with pytest.raises(FileNotFoundError, match="ImageFolder"):
        build_dataset(dict(type="ImageFolder",
                           root=str(tmp_path / "nope")), split="train")


def test_native_aug_matches_numpy():
    """The fused C++ aug kernel must be bit-identical to apply_aug+normalize."""
    from convnet_approximater_tpu.data.loader import apply_aug, draw_aug_params
    from convnet_approximater_tpu.data.native import get_lib, prep_batch_aug

    if get_lib() is None:
        pytest.skip("native library unavailable")
    rs0 = np.random.RandomState(0)
    pool = rs0.randint(0, 256, (20, 14, 18, 3), np.uint8)
    idx = np.asarray([3, 0, 7, 19, 5], np.int64)
    mean = np.asarray([0.4, 0.5, 0.6], np.float32) * 255.0
    std = np.asarray([0.2, 0.25, 0.3], np.float32) * 255.0
    for aug in (dict(hflip=0.7, crop_pad=3),
                dict(rrc_scale=(0.3, 1.0), hflip=0.5),
                dict(hflip=1.0),
                dict()):
        for out_hw in ((14, 18), (8, 8), (20, 24)):
            params = draw_aug_params(np.random.RandomState(42), len(idx),
                                     14, 18, **aug)
            native = prep_batch_aug(pool, idx, out_hw, mean, std, params)
            assert native is not None
            ref = apply_aug(pool[idx], params, out_hw)
            ref = (ref.astype(np.float32) - mean) / std
            np.testing.assert_allclose(native, ref, rtol=0, atol=1e-6)


def test_loader_aug_native_path_matches_fallback(monkeypatch):
    from convnet_approximater_tpu.data import Loader, Synthetic

    ds = Synthetic(16, (10, 10, 3), 4, seed=0)
    kw = dict(shuffle=True, prefetch=0, mean=(0.5, 0.5, 0.5),
              std=(0.25, 0.25, 0.25), image_size=(8, 8),
              aug=dict(hflip=0.5, crop_pad=2))
    native = [np.asarray(b[0]) for b in Loader(ds, 8, **kw)]
    monkeypatch.setenv("CAT_DISABLE_NATIVE", "1")
    import convnet_approximater_tpu.data.native as nat

    monkeypatch.setattr(nat, "_lib", None)
    monkeypatch.setattr(nat, "_tried", False)
    fallback = [np.asarray(b[0]) for b in Loader(ds, 8, **kw)]
    for a, b in zip(native, fallback):
        np.testing.assert_allclose(a, b, atol=1e-6)


def test_rand_augment_identity_and_determinism():
    from convnet_approximater_tpu.data import rand_augment_batch

    imgs = np.random.RandomState(0).randint(0, 256, (4, 16, 16, 3)).astype(np.uint8)
    # n=0 is the identity
    np.testing.assert_array_equal(
        rand_augment_batch(imgs, np.random.RandomState(1), n=0), imgs)
    # same seed -> same output; different seed -> (a.s.) different
    a = rand_augment_batch(imgs, np.random.RandomState(7), n=2, m=9)
    b = rand_augment_batch(imgs, np.random.RandomState(7), n=2, m=9)
    c = rand_augment_batch(imgs, np.random.RandomState(8), n=2, m=9)
    np.testing.assert_array_equal(a, b)
    assert a.dtype == np.uint8 and a.shape == imgs.shape
    assert not np.array_equal(a, c)


def test_rand_augment_op_goldens():
    from convnet_approximater_tpu.data.randaug import (
        _autocontrast, _posterize, _solarize)

    rs = np.random.RandomState(0)
    img = np.arange(64, dtype=np.uint8).reshape(4, 4, 4) * 4
    # posterize at m=10 keeps 4 bits
    assert np.all(_posterize(img, 10, rs) == (img & 0xF0))
    # solarize inverts above the threshold only
    sol = _solarize(img, 10, rs)
    th = 255 - int(round(255 * 0.75))
    assert np.all(sol[img >= th] == (255 - img)[img >= th])
    assert np.all(sol[img < th] == img[img < th])
    # autocontrast maps a full-range channel onto itself at the extremes
    full = np.zeros((2, 2, 1), np.uint8)
    full[0, 0, 0] = 255
    ac = _autocontrast(full, 10, rs)
    assert ac.min() == 0 and ac.max() == 255


def test_loader_rand_aug_integration():
    from convnet_approximater_tpu.data import ArrayDataset, Loader

    imgs = np.random.RandomState(0).randint(0, 256, (32, 16, 16, 3)).astype(np.uint8)
    labels = np.arange(32) % 4
    ds = ArrayDataset(imgs, labels)
    ld = Loader(ds, 8, shuffle=False, prefetch=0, image_size=(16, 16),
                aug=dict(hflip=0.5, rand_aug=dict(n=2, m=9)))
    ld_plain = Loader(ds, 8, shuffle=False, prefetch=0, image_size=(16, 16))
    xb, yb = next(iter(ld))
    xp, _ = next(iter(ld_plain))
    assert xb.shape == xp.shape
    assert not np.allclose(np.asarray(xb), np.asarray(xp))
    # deterministic across re-iterations (same epoch)
    xb2, _ = next(iter(ld))
    np.testing.assert_array_equal(np.asarray(xb), np.asarray(xb2))
