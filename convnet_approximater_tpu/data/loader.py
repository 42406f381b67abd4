"""Batch loader: normalize, resize, shard onto the device mesh.

Replaces timm's ``create_loader`` surface.  Host-side work is pure numpy
(uint8 -> normalized float32, optional nearest-neighbor resize); the batch is
``jax.device_put`` with the batch axis sharded over the mesh's data axis so
each device receives only its shard — the SPMD version of the reference's
per-rank DistributedSampler (``hooks/finetune.py:176-186``).  A
double-buffered background thread overlaps host prep with device compute.
"""

from __future__ import annotations

import queue
import threading
from typing import Iterator, Optional, Tuple

import jax
import numpy as np

from .datasets import ArrayDataset, IMAGENET_DEFAULT_MEAN, IMAGENET_DEFAULT_STD


def _resize_nearest(images: np.ndarray, size: Tuple[int, int]) -> np.ndarray:
    H, W = images.shape[1:3]
    th, tw = size
    if (H, W) == (th, tw):
        return images
    ri = (np.arange(th) * H // th).astype(np.int64)
    ci = (np.arange(tw) * W // tw).astype(np.int64)
    return images[:, ri][:, :, ci]


def _reflect_index(idx: np.ndarray, size: int) -> np.ndarray:
    """Map possibly-out-of-range indices into [0, size) by edge reflection
    (numpy ``pad(mode='reflect')`` semantics: -k -> k, size-1+k -> size-1-k)."""
    idx = np.abs(idx)
    over = idx > size - 1
    idx = np.where(over, 2 * (size - 1) - idx, idx)
    return np.clip(idx, 0, size - 1)


def draw_aug_params(rs: np.random.RandomState, n: int, H: int, W: int, *,
                    hflip: float = 0.0, crop_pad: int = 0, rrc_scale=None):
    """Draw per-image augmentation parameters (crop rect + flip flag).

    The geometry is expressed uniformly as a source rectangle
    ``(y0, x0, ch, cw)`` (``y0``/``x0`` may be negative for reflect-padded
    crops) nearest-resized to ``out_hw``, optionally horizontally flipped —
    so the numpy and native C++ appliers share one parameterization and are
    bit-identical.
    """
    if rrc_scale is not None:
        areas = rs.uniform(rrc_scale[0], rrc_scale[1], n) * H * W
        log_ratio = rs.uniform(np.log(3 / 4), np.log(4 / 3), n)
        ch = np.clip(np.round(np.sqrt(areas / np.exp(log_ratio))), 1, H
                     ).astype(np.int64)
        cw = np.clip(np.round(np.sqrt(areas * np.exp(log_ratio))), 1, W
                     ).astype(np.int64)
        y0 = np.asarray([rs.randint(0, H - c + 1) for c in ch], np.int64)
        x0 = np.asarray([rs.randint(0, W - c + 1) for c in cw], np.int64)
    elif crop_pad > 0:
        p = crop_pad
        ch = np.full(n, H, np.int64)
        cw = np.full(n, W, np.int64)
        y0 = rs.randint(0, 2 * p + 1, n).astype(np.int64) - p
        x0 = rs.randint(0, 2 * p + 1, n).astype(np.int64) - p
    else:
        ch = np.full(n, H, np.int64)
        cw = np.full(n, W, np.int64)
        y0 = np.zeros(n, np.int64)
        x0 = np.zeros(n, np.int64)
    flip = (rs.uniform(size=n) < hflip) if hflip > 0 else np.zeros(n, bool)
    return y0, x0, ch, cw, flip


def apply_aug(images: np.ndarray, params, out_hw) -> np.ndarray:
    """Numpy applier for :func:`draw_aug_params` (native path:
    ``native.prep_batch_aug`` fuses this with gather+normalize)."""
    y0, x0, ch, cw, flip = params
    n = len(images)
    H, W = images.shape[1:3]
    th, tw = out_hw
    out = np.empty((n, th, tw, images.shape[3]), images.dtype)
    r = np.arange(th)
    c = np.arange(tw)
    for i in range(n):
        rows = _reflect_index(y0[i] + (r * ch[i]) // th, H)
        cs = (tw - 1 - c) if flip[i] else c
        cols = _reflect_index(x0[i] + (cs * cw[i]) // tw, W)
        out[i] = images[i][rows][:, cols]
    return out


def augment_batch(images: np.ndarray, rs: np.random.RandomState, *,
                  hflip: float = 0.0, crop_pad: int = 0,
                  rrc_scale=None, out_size=None, rand_aug=None) -> np.ndarray:
    """Host-side train-time augmentation.

    The reference's fine-tune loaders came from timm ``create_loader``
    (``/root/reference/src/approx/hooks/finetune.py:165-186``); its L2 phase
    ran ``no_aug`` (so augmentation defaults OFF here — parity), but CE
    recovery on real data wants the classics:

    * ``hflip`` — probability of a horizontal flip per image.
    * ``crop_pad`` — CIFAR-style: reflect-pad by N then random-crop back.
    * ``rrc_scale`` — (lo, hi) area fraction: timm-style random-resized-crop
      to ``out_size`` (nearest resize; aspect jitter 3/4..4/3).
    * ``rand_aug`` — ``dict(n=2, m=9)``: RandAugment(n, m) applied per
      image BEFORE the geometric stage (``data/randaug.py``; uint8 input
      required — the timm ``auto_augment`` analog).

    ``crop_pad``/``hflip`` keep the input resolution unless ``rrc_scale``
    is set (then the output is ``out_size``).  The Loader's native path
    fuses the crop/flip parameterization into the C++ batch prep
    (``rand_aug`` routes through the numpy applier).
    """
    if rand_aug:
        from .randaug import rand_augment_batch

        images = rand_augment_batch(images, rs, **rand_aug)
    H, W = images.shape[1:3]
    out_hw = (tuple(out_size) if (rrc_scale is not None and out_size)
              else (H, W))
    params = draw_aug_params(rs, len(images), H, W, hflip=hflip,
                             crop_pad=crop_pad, rrc_scale=rrc_scale)
    return apply_aug(images, params, out_hw)


class Loader:
    def __init__(
        self,
        dataset: ArrayDataset,
        batch_size: int,
        *,
        shuffle: bool = False,
        drop_last: bool = True,
        mean=IMAGENET_DEFAULT_MEAN,
        std=IMAGENET_DEFAULT_STD,
        image_size: Optional[Tuple[int, int]] = None,
        seed: int = 0,
        sharding=None,
        prefetch: int = 2,
        dtype=np.float32,
        aug=None,
    ):
        self.dataset = dataset
        self.batch_size = batch_size
        self.shuffle = shuffle
        self.drop_last = drop_last
        self.mean = np.asarray(mean, np.float32) * 255.0
        self.std = np.asarray(std, np.float32) * 255.0
        self.image_size = image_size
        self.seed = seed
        self.sharding = sharding
        self.prefetch = prefetch
        self.dtype = dtype
        # train-time augmentation (see augment_batch); keys: hflip,
        # crop_pad, rrc_scale.  None/{} = no aug (the reference's L2
        # fine-tune parity default).
        self.aug = dict(aug or {})
        self._epoch = 0

    def set_epoch(self, epoch: int):
        """Vary the shuffle order per epoch (analog of sampler.set_epoch)."""
        self._epoch = epoch

    def __len__(self):
        n = len(self.dataset)
        return n // self.batch_size if self.drop_last else -(-n // self.batch_size)

    def _prep(self, idx: np.ndarray):
        labels = self.dataset.labels[idx].astype(np.int32)
        pool = self.dataset.images
        if self.aug:
            # one crop-rect+flip parameterization, applied either by the
            # fused native kernel (gather+aug+resize+normalize, no GIL) or
            # the numpy fallback — bit-identical by construction.
            # rand_aug (per-pixel photometric/affine ops) has no native
            # fusion: it materializes the gathered uint8 batch first.
            aug = dict(self.aug)
            rand_aug = aug.pop("rand_aug", None)
            H, W = pool.shape[1:3]
            out_hw = tuple(self.image_size or (H, W))
            rs = np.random.RandomState(
                (self.seed * 1000003 + self._epoch * 9176
                 + (int(idx[0]) if len(idx) else 0)) % (2 ** 31))
            if rand_aug:
                from .randaug import rand_augment_batch

                gathered = rand_augment_batch(pool[idx], rs, **rand_aug)
                params = draw_aug_params(rs, len(idx), H, W, **aug)
                images = apply_aug(gathered, params, out_hw)
                images = (images.astype(np.float32) - self.mean) / self.std
                return images.astype(self.dtype), labels
            params = draw_aug_params(rs, len(idx), H, W, **aug)
            if pool.dtype == np.uint8 and self.dtype == np.float32:
                from .native import prep_batch_aug

                out = prep_batch_aug(pool, np.asarray(idx), out_hw,
                                     self.mean, self.std, params)
                if out is not None:
                    return out, labels
            images = apply_aug(pool[idx], params, out_hw)
            images = (images.astype(np.float32) - self.mean) / self.std
            return images.astype(self.dtype), labels
        # native (C++ thread-pool) gather+resize+normalize; numpy fallback
        if pool.dtype == np.uint8 and self.dtype == np.float32:
            from .native import prep_batch

            target = self.image_size or pool.shape[1:3]
            out = prep_batch(pool, np.asarray(idx), target, self.mean, self.std)
            if out is not None:
                return out, labels
        images = pool[idx]
        if self.image_size is not None:
            images = _resize_nearest(images, self.image_size)
        images = (images.astype(np.float32) - self.mean) / self.std
        return images.astype(self.dtype), labels

    def _indices(self) -> np.ndarray:
        n = len(self.dataset)
        if self.shuffle:
            rs = np.random.RandomState(self.seed + self._epoch)
            return rs.permutation(n)
        return np.arange(n)

    def __iter__(self) -> Iterator:
        order = self._indices()
        nb = len(self)
        batches = [order[i * self.batch_size:(i + 1) * self.batch_size] for i in range(nb)]

        if self.prefetch <= 0:
            for idx in batches:
                yield self._put(self._prep(idx))
            return

        q: "queue.Queue" = queue.Queue(maxsize=self.prefetch)
        stop = object()
        cancel = threading.Event()  # set when the consumer abandons iteration

        def worker():
            try:
                for idx in batches:
                    if cancel.is_set():
                        return
                    item = self._prep(idx)
                    # bounded put that re-checks cancellation, so a consumer
                    # breaking out of the loop (max_steps_per_epoch /
                    # max_eval_batches) can't strand us on a full queue
                    while not cancel.is_set():
                        try:
                            q.put(item, timeout=0.1)
                            break
                        except queue.Full:
                            continue
            finally:
                # deliver the sentinel with the same cancel-aware bounded put
                # (put_nowait could drop it against a full queue and leave the
                # consumer blocked on q.get forever)
                while not cancel.is_set():
                    try:
                        q.put(stop, timeout=0.1)
                        break
                    except queue.Full:
                        continue

        t = threading.Thread(target=worker, daemon=True)
        t.start()
        try:
            while True:
                item = q.get()
                if item is stop:
                    break
                yield self._put(item)
        finally:
            cancel.set()
            try:  # drain so an in-flight put can finish
                while True:
                    q.get_nowait()
            except queue.Empty:
                pass
            t.join(timeout=5.0)

    def _put(self, batch):
        images, labels = batch
        if self.sharding is not None:
            images = jax.device_put(images, self.sharding)
            labels = jax.device_put(labels, self.sharding)
        return images, labels
