"""Optional torch bridge: expose the tf.data RLDS pipeline as a torch
IterableDataset (reference src/data/dataset_torch.py:13-45).

The TPU training path feeds numpy -> jax.device_put directly and never
imports torch; this wrapper exists for API parity so reference users can
keep torch-side tooling (DataLoader-based eval scripts, visualization)."""

from __future__ import annotations


def make_torch_dataset(tf_dataset, train: bool = True):
    """tf.data.Dataset (frame- or batch-level) -> torch IterableDataset."""
    import torch

    class TorchRLDSDataset(torch.utils.data.IterableDataset):
        def __init__(self, ds, is_train):
            super().__init__()
            self._ds = ds
            self._is_train = is_train

        def __iter__(self):
            yield from self._ds.as_numpy_iterator()

        def __len__(self):
            # frames across the mix; mirrors the reference's use of
            # dataset_statistics num_transitions when available
            stats = getattr(self._ds, "dataset_statistics", None)
            if stats:
                return int(sum(s["num_transitions"] for s in stats))
            raise TypeError("length unknown for this dataset")

    return TorchRLDSDataset(tf_dataset, train)
