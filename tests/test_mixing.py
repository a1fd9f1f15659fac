"""Mixing datasets: CoSMix frequency-weighted class sampling and the
sem_weights (weights_path) plumbing.

Reference: utils/datasets/cosmix.py:95-192 — half the donor's present
classes sampled with p proportional to the dataset's class-frequency
stats; utils/datasets/semantickitti.py:80-91 — weights loaded from the
weights_path .npy cache (or computed and saved there)."""

import numpy as np

from lidog_tpu.data.datasets.adapters import SyntheticAdapter
from lidog_tpu.data.mixing import CosMixSourceDataset, Mix3DSourceDataset


def _mini(phase="train", seed=None):
    return SyntheticAdapter(
        num_scans=3, points_per_scan=4000, phase=phase, seed=seed,
        voxel_size=0.05, sub_p=1.0, ignore_label=-1,
    )


def test_sem_weights_computed_and_cached(tmp_path):
    ds = _mini()
    wp = str(tmp_path / "stats" / "w.npy")
    ds.weights_path = wp
    w = ds.get_sem_weights()
    assert w.shape == (7,)
    assert w.sum() > 0  # raw per-class counts
    # second dataset loads the cache instead of recomputing
    ds2 = _mini()
    ds2.weights_path = wp
    ds2.get_scan = None  # would crash if it tried to recompute
    w2 = ds2.get_sem_weights()
    np.testing.assert_allclose(w, w2)


def test_cosmix_uses_frequency_weights(tmp_path):
    s0, s1 = _mini(seed=0), _mini(seed=1)
    mix = CosMixSourceDataset(s0, s1, sub_p=0.5, seed=3)
    # weights were resolved from the datasets' stats (non-uniform)
    assert mix.weights0.shape == (7,)
    assert mix.weights0.std() > 0
    np.testing.assert_allclose(mix.weights0, s0.get_sem_weights())

    # oracle: replay the reference's selection with the same rng stream
    # (cosmix.py:108-112): p = w[present]/sum, choose len(present)//2
    # classes without replacement.
    item = mix[0]
    assert {"coordinates", "xyz", "features", "sem_labels"} <= set(item)
    assert (item["sem_labels"] >= -1).all()
    assert item["coordinates"].shape[0] == item["sem_labels"].shape[0]


def test_cosmix_weighted_choice_matches_reference_formula():
    """The donor-class selection must be np.random.choice(present, k, p=w)
    with w = dataset_weights[present] / sum — replay with an identical rng
    stream and check the mixed cloud contains exactly those donor classes
    (plus the recipient's)."""
    s0, s1 = _mini(seed=0), _mini(seed=1)
    seed = 11
    mix = CosMixSourceDataset(s0, s1, sub_p=1.0, seed=seed)

    # replay the rng consumption of __getitem__(0) up to the choice
    rng = np.random.RandomState(seed)
    perm1 = rng.permutation(len(s1))
    d0, d1 = s0[0], s1[int(perm1[0])]
    donor_is_0 = rng.choice([0, 1]) == 0
    donor = d0 if donor_is_0 else d1
    weights = (
        s0.get_sem_weights() if donor_is_0 else s1.get_sem_weights()
    )
    present = np.unique(donor["sem_labels"])
    present = present[present != -1]
    w = weights[present] / weights[present].sum()
    k = max(int(len(present) / 2), 0)
    expected = set(rng.choice(present, k, p=w, replace=False).tolist())

    item = mix[0]
    recipient = d1 if donor_is_0 else d0
    got = set(np.unique(item["sem_labels"]).tolist())
    rec = set(np.unique(recipient["sem_labels"]).tolist())
    # every expected donor class must appear in the mix
    assert expected <= got
    # nothing outside recipient + chosen donor classes (+ ignore)
    assert got <= (rec | expected | {-1})


def test_mix3d_unions_scans():
    s0, s1 = _mini(seed=0), _mini(seed=1)
    mix = Mix3DSourceDataset(s0, s1, seed=0)
    item = mix[0]
    n0 = s0[0]["coordinates"].shape[0]
    assert item["coordinates"].shape[0] > n0  # union is bigger
