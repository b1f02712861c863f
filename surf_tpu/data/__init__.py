"""Dataset factory + host-side loaders.

Functional re-design of the reference's datasets/__init__.py:12-43: name ->
class dispatch, un-batched per-scene dicts (batch_size=1 with
``collect_fn = data[0]``), a random sampler for training and a sequential
one for validation; finetune mode returns the bare dataset.

Multi-chip note: the reference shards scenes across GPU ranks with a
DistributedSampler.  Here sharding happens *inside* the train step (scenes
stacked on a leading device axis of a jax Mesh, surf_tpu/parallel), so the
loader can also yield stacked super-batches via ``batch`` > 1.
"""

from __future__ import annotations

import numpy as np

from .dtu import DTUDataset
from .dtu_finetune import (DTUDatasetFinetune, DTUDatasetFinetuneNeuS,
                           SyntheticDatasetFinetune)
from .mvs_generic import BMVSDataset, TanksDataset, ETH3DDataset
from .synthetic import SyntheticDataset

_DATASETS = {
    "DTUDataset": DTUDataset,
    "BMVSDataset": BMVSDataset,
    "TanksDataset": TanksDataset,
    "ETH3DDataset": ETH3DDataset,
    "SyntheticDataset": SyntheticDataset,
    "DTUDatasetFinetune": DTUDatasetFinetune,
    "DTUDatasetFinetuneNeuS": DTUDatasetFinetuneNeuS,
    "SyntheticDatasetFinetune": SyntheticDatasetFinetune,
}


class Loader:
    """Single-process host loader with optional shuffling.

    Iterating yields per-scene dicts (the reference's un-batched contract).
    """

    def __init__(self, dataset, shuffle, seed=0):
        self.dataset = dataset
        self.shuffle = shuffle
        self.epoch = 0
        self.seed = seed

    def set_epoch(self, epoch):
        self.epoch = epoch

    def __len__(self):
        return len(self.dataset)

    def __iter__(self):
        order = np.arange(len(self.dataset))
        if self.shuffle:
            np.random.RandomState(self.seed + self.epoch).shuffle(order)
        for i in order:
            yield self.dataset[int(i)]


def get_loader(conf, mode, distributed=False, seed=0):
    name = conf["dataset_name"]
    if name not in _DATASETS:
        raise NotImplementedError(f"Unknown dataset {name}!")
    cls = _DATASETS[name]
    try:
        dataset = cls(conf, mode, rng=np.random.RandomState(seed))
    except TypeError:  # dataset without host-side randomness
        dataset = cls(conf, mode)
    if mode == "finetune":
        return dataset
    loader = Loader(dataset, shuffle=(mode == "train"), seed=seed)
    return loader, loader, dataset  # (loader, sampler, dataset) triple
