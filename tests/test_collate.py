"""Collation invariants, incl. the capacity-overflow drop policy."""

import numpy as np

from lidog_tpu.data.collate import collate_padded, stack_device_batches


def _sample(rng, m):
    coords = np.unique(rng.randint(0, 40, (m, 3)).astype(np.int32), axis=0)
    m = len(coords)
    return {
        "coordinates": coords,
        "features": np.ones((m, 1), np.float32),
        "sem_labels": rng.randint(0, 7, m).astype(np.int32),
    }


def test_overflow_drop_unique_and_unbiased(rng):
    samples = [_sample(rng, 900), _sample(rng, 1100)]
    out = collate_padded(samples, 1024)
    assert out["dropped"] > 0
    kept = out["coords"][out["mask"]]
    # Unique coords (the bitgrid builder's scatter-OR invariant).
    assert len(np.unique(kept, axis=0)) == len(kept)
    # Unbiased: each scan's kept rows span its full lex-sorted range rather
    # than truncating the +x tail.
    for b, s in enumerate(samples):
        rows = kept[kept[:, 0] == b][:, 1:]
        assert rows[0].tolist() == s["coordinates"][0].tolist()
        last_kept = rows[-1]
        last_orig = s["coordinates"][-1]
        # Last kept row is within the final 2% of the sorted original rows.
        idx = np.where((s["coordinates"] == last_kept).all(axis=1))[0][0]
        assert idx >= 0.98 * (len(s["coordinates"]) - 1)


def test_no_overflow_identity(rng):
    samples = [_sample(rng, 300), _sample(rng, 200)]
    out = collate_padded(samples, 2048)
    assert int(out["dropped"]) == 0
    kept = out["coords"][out["mask"]]
    total = sum(len(s["coordinates"]) for s in samples)
    assert len(kept) == total


def test_stack_device_batches_shapes(rng):
    groups = [collate_padded([_sample(rng, 100)], 256) for _ in range(4)]
    stacked = stack_device_batches(groups)
    assert stacked["coords"].shape == (4, 256, 4)
    assert stacked["mask"].shape == (4, 256)
