"""Host data loader: dataset -> padded device batches, prefetched.

Replaces torch DataLoader(num_workers=10) + DistributedSampler
(train_lidog.py:178-192).  This image has one CPU core, so instead of
worker processes we use a small thread pool (numpy releases the GIL for
the heavy ops) with double-buffered prefetch; per-host sharding for
multi-host SPMD is a `host_id`/`num_hosts` stride over the index list.
"""

from __future__ import annotations

from concurrent.futures import ThreadPoolExecutor
from typing import Dict, Iterator, Optional, Sequence

import numpy as np

from lidog_tpu.data.collate import (
    collate_padded,
    remap_selected_idx,
    stack_device_batches,
)


class Loader:
    def __init__(
        self,
        dataset,
        batch_size: int,
        capacity: int,
        shuffle: bool = True,
        seed: int = 0,
        num_devices: int = 1,
        drop_last: bool = True,
        num_threads: int = 2,
        prefetch: int = 2,
        multi_source: bool = False,
        bev_levels: Optional[Sequence[str]] = None,
        host_id: int = 0,
        num_hosts: int = 1,
    ):
        self.dataset = dataset
        self.batch_size = batch_size
        self.capacity = capacity
        self.shuffle = shuffle
        self.seed = seed
        self.num_devices = num_devices
        self.drop_last = drop_last
        self.num_threads = num_threads
        self.prefetch = prefetch
        self.multi_source = multi_source
        self.bev_levels = list(bev_levels) if bev_levels else None
        self.host_id = host_id
        self.num_hosts = num_hosts
        self.epoch = 0

    def __len__(self):
        per_step = self.batch_size * self.num_devices * self.num_hosts
        n = len(self.dataset)
        return n // per_step if self.drop_last else -(-n // per_step)

    def _collate_group(self, samples):
        if self.multi_source:
            out = {}
            for s, key in ((0, "source0"), (1, "source1")):
                group = [x[key] for x in samples]
                out.update(collate_padded(
                    group, self.capacity, suffix=str(s),
                    return_inverse=bool(self.bev_levels),
                ))
                if self.bev_levels:
                    inv = out.pop(f"_inv_maps{s}")
                    for lvl in self.bev_levels:
                        out[f"bev_labels_{lvl}{s}"] = np.stack(
                            [g["bev_labels"][lvl] for g in group]
                        )
                        if "bev_selected_idx" in group[0]:
                            out[f"bev_selected_idx_{lvl}{s}"] = np.stack([
                                remap_selected_idx(
                                    g["bev_selected_idx"][lvl], iv
                                )
                                for g, iv in zip(group, inv)
                            ])
            return out
        out = collate_padded(
            samples, self.capacity, return_inverse=bool(self.bev_levels)
        )
        if self.bev_levels:
            inv = out.pop("_inv_maps")
            for lvl in self.bev_levels:
                out[f"bev_labels_{lvl}"] = np.stack(
                    [x["bev_labels"][lvl] for x in samples]
                )
                if "bev_selected_idx" in samples[0]:
                    out[f"bev_selected_idx_{lvl}"] = np.stack([
                        remap_selected_idx(x["bev_selected_idx"][lvl], iv)
                        for x, iv in zip(samples, inv)
                    ])
        return out

    def __iter__(self) -> Iterator[Dict[str, np.ndarray]]:
        n = len(self.dataset)
        rng = np.random.RandomState(self.seed + self.epoch)
        order = rng.permutation(n) if self.shuffle else np.arange(n)
        order = order[self.host_id :: self.num_hosts]
        per_step = self.batch_size * self.num_devices
        steps = len(order) // per_step if self.drop_last else -(-len(order) // per_step)
        self.epoch += 1

        def make_batch(step):
            idxs = order[step * per_step : (step + 1) * per_step]
            samples = [self.dataset[int(i)] for i in idxs]
            if self.num_devices == 1:
                return self._collate_group(samples)
            groups = [
                self._collate_group(samples[d * self.batch_size : (d + 1) * self.batch_size])
                for d in range(self.num_devices)
            ]
            return stack_device_batches(groups)

        with ThreadPoolExecutor(max_workers=self.num_threads) as pool:
            futures = [
                pool.submit(make_batch, s)
                for s in range(min(self.prefetch, steps))
            ]
            next_submit = len(futures)
            for s in range(steps):
                batch = futures.pop(0).result()
                if next_submit < steps:
                    futures.append(pool.submit(make_batch, next_submit))
                    next_submit += 1
                yield batch
