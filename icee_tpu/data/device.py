"""Device-resident captioner dataset — whole-epoch training programs.

The reference's only "device-resident" data path is the SentiCap family's
Theano shared arrays (``senticap/mrnn/mrnn.py:581-596``, SURVEY §2.5
P-resident row); the PyTorch captioners re-feed every batch from host
DataLoader workers (``stylenet/train_multitask.py:364-408``).  On the TPU
the per-batch host dispatch is the dominant epoch cost once the step itself
is fast (the axon relay adds a ~27 ms floor PER dispatch, and the host loop
also syncs on ``float(loss)`` every batch) — so the TPU-native formulation
pins the whole split on device and runs the ENTIRE epoch as one jitted
``lax.scan`` over shuffled batch-index rows: one dispatch per epoch.

:class:`DeviceCaptionData` packs a ``CaptionExample`` list (features via the
same ``image_provider`` the host loader uses) into device arrays and
reproduces :class:`icee_tpu.data.pipeline.BatchLoader`'s epoch composition
exactly — same seeded ``np.random.default_rng`` shuffle, same trailing
partial batch — so a device epoch and a host-loader epoch visit identical
batches and (with matching RNG splits in the trainer) produce bit-identical
parameters.

Memory: features are stored per UNIQUE image, not per example — Flickr-style
splits carry 5 reference captions per image (``FlickrDataset`` D3), so the
(N_examples, ...) feature array would be 5x larger than the data.  Each
example keeps a host-side ``image_index`` into the unique-feature array and
the epoch programs gather ``images[image_index[bidx]]`` — bit-identical to
the undeduplicated gather.  Pooled features for the whole Flickr8k train
split are ~13 MB; spatial attention features (U, 196, 2048) at ~1.6 MB per
unique image are gated by ``fits_device`` at the call site (pass the
UNIQUE-image count).
"""

from __future__ import annotations

import dataclasses
from typing import Callable, List, Optional, Tuple

import numpy as np

from icee_tpu.data.pipeline import pad_captions


@dataclasses.dataclass
class DeviceCaptionData:
    """A caption split pinned on device + the host-side epoch index maker.

    ``images``/``captions``/``lengths`` are device arrays of the FULL split;
    per-epoch shuffling happens on the host over int32 indices only (a
    (num_batches, batch_size) transfer, bytes not megabytes).
    """

    images: object                # (U, ...) f32 device array (features of
    #                               the UNIQUE images; U <= N)
    captions: object              # (N, T) int32 device array
    lengths: object               # (N,) int32 device array
    num_examples: int
    batch_size: int
    shuffle: bool = True
    seed: int = 0
    # host-side per-example reference caption lists (all 5 refs per image,
    # ``FlickrDataset`` D3) — consumed by the BLEU side of the device val
    # epoch, never shipped to the device
    references: Optional[List[List[List[int]]]] = None
    # host-side (N,) example -> unique-image row map (None for text-only
    # styled corpora); translated per batch by :meth:`image_rows` so the
    # device never holds the map
    image_index: Optional[np.ndarray] = None
    _rng: np.random.Generator = dataclasses.field(init=False, repr=False)

    def __post_init__(self):
        self._rng = np.random.default_rng(self.seed)

    def __len__(self) -> int:
        return -(-self.num_examples // self.batch_size)

    def epoch_indices(self) -> Tuple[np.ndarray, np.ndarray]:
        """-> ((nb, B) int32 gather indices, (nb, B) bool sample mask).

        Identical composition to ``BatchLoader._index_batches`` (same seeded
        generator, same trailing partial batch); padding rows gather example
        0 with ``valid=False`` so the masked loss ignores them.
        """
        idx = np.arange(self.num_examples)
        if self.shuffle:
            self._rng.shuffle(idx)
        nb = len(self)
        out = np.zeros((nb, self.batch_size), np.int32)
        valid = np.zeros((nb, self.batch_size), bool)
        for b in range(nb):
            chunk = idx[b * self.batch_size:(b + 1) * self.batch_size]
            out[b, : len(chunk)] = chunk
            valid[b, : len(chunk)] = True
        return out, valid

    def image_rows(self, idx: np.ndarray) -> np.ndarray:
        """Translate example-index batch rows (``epoch_indices`` output) to
        unique-image gather rows for the ``images`` array."""
        if self.image_index is None:
            return np.asarray(idx, np.int32)
        return self.image_index[idx].astype(np.int32)


def from_examples(
    examples: List,
    batch_size: int,
    max_len: int,
    image_provider: Callable[[str], np.ndarray],
    shuffle: bool = True,
    seed: int = 0,
    mesh=None,
) -> DeviceCaptionData:
    """Pack ``CaptionExample``s (+ cached features) into device arrays.

    Mirrors ``caption_dataset_loader``'s per-example encoding (captions were
    tokenized once at dataset build; features come from the same memoized
    provider).  With a mesh the arrays are replicated across it so the
    whole-epoch jit can reshard gathered batches over the data axis without
    cross-device gathers.
    """
    import jax
    import jax.numpy as jnp

    captions, lengths = pad_captions([e.caption_ids for e in examples],
                                     max_len)
    # features per UNIQUE image (5-ref splits would otherwise pin 5 copies)
    uniq, order = {}, []
    for e in examples:
        if e.image not in uniq:
            uniq[e.image] = len(order)
            order.append(e.image)
    image_index = np.asarray([uniq[e.image] for e in examples], np.int32)
    images = np.stack([image_provider(n) for n in order]).astype(np.float32)
    if mesh is not None:
        from icee_tpu.parallel.mesh import replicated

        sh = replicated(mesh)
        put = lambda a: jax.device_put(a, sh)  # noqa: E731
    else:
        put = jnp.asarray
    return DeviceCaptionData(
        images=put(images),
        captions=put(captions),
        lengths=put(lengths),
        num_examples=len(examples),
        batch_size=batch_size,
        shuffle=shuffle,
        seed=seed,
        references=[e.all_caption_ids for e in examples],
        image_index=image_index,
    )


def from_styled(
    caption_ids: List[List[int]],
    batch_size: int,
    max_len: int,
    shuffle: bool = True,
    seed: int = 0,
    mesh=None,
) -> DeviceCaptionData:
    """Pack a text-only styled corpus (the reference's ``get_style_loader``
    data, ``stylenet/data_loader.py:183-197``) for whole-epoch device
    training: captions/lengths pinned on device, ``images=None`` (the paper
    regime's emotion passes carry no features, ``stylenet/train.py:356-387``).
    """
    import jax
    import jax.numpy as jnp

    captions, lengths = pad_captions(caption_ids, max_len)
    if mesh is not None:
        from icee_tpu.parallel.mesh import replicated

        sh = replicated(mesh)
        put = lambda a: jax.device_put(a, sh)  # noqa: E731
    else:
        put = jnp.asarray
    return DeviceCaptionData(
        images=None,
        captions=put(captions),
        lengths=put(lengths),
        num_examples=len(caption_ids),
        batch_size=batch_size,
        shuffle=shuffle,
        seed=seed,
    )


def fits_device(
    num_examples: int,
    feature_shape: Tuple[int, ...],
    budget_bytes: int = 4 << 30,
) -> bool:
    """Conservative HBM gate for pinning a split (default 4 GiB of the
    v5e's 16 GiB, leaving room for params/activations/compiler staging).
    ``num_examples`` should be the UNIQUE-image count — features are
    deduplicated by :func:`from_examples` (5-ref splits pin one copy)."""
    per = int(np.prod(feature_shape)) * 4
    return num_examples * per <= budget_bytes
