import jax
import jax.numpy as jnp
import numpy as np

from lidog_tpu.ops.norm import MaskedBatchNorm, MaskedInstanceNorm


def test_batchnorm_matches_torch_semantics(rng):
    n, c = 256, 8
    feats = rng.randn(n, c).astype(np.float32)
    mask = rng.rand(n) > 0.3
    feats[~mask] = 0
    bn = MaskedBatchNorm(momentum=0.1)
    variables = bn.init(jax.random.PRNGKey(0), jnp.asarray(feats), jnp.asarray(mask))
    out, updates = bn.apply(
        variables,
        jnp.asarray(feats),
        jnp.asarray(mask),
        use_running_average=False,
        mutable=["batch_stats"],
    )
    v = feats[mask]
    mean = v.mean(axis=0)
    var = v.var(axis=0)
    expect = (v - mean) / np.sqrt(var + 1e-5)
    np.testing.assert_allclose(np.asarray(out)[mask], expect, rtol=1e-4, atol=1e-4)
    assert np.all(np.asarray(out)[~mask] == 0)
    # Running stats: (1-m)*old + m*new, unbiased var.
    nv = mask.sum()
    np.testing.assert_allclose(
        np.asarray(updates["batch_stats"]["mean"]), 0.1 * mean, rtol=1e-4, atol=1e-5
    )
    np.testing.assert_allclose(
        np.asarray(updates["batch_stats"]["var"]),
        0.9 * 1.0 + 0.1 * var * nv / (nv - 1),
        rtol=1e-4,
        atol=1e-5,
    )
    # Eval mode uses running stats.
    out_eval = bn.apply(
        {"params": variables["params"], "batch_stats": updates["batch_stats"]},
        jnp.asarray(feats),
        jnp.asarray(mask),
        use_running_average=True,
    )
    rm = np.asarray(updates["batch_stats"]["mean"])
    rv = np.asarray(updates["batch_stats"]["var"])
    np.testing.assert_allclose(
        np.asarray(out_eval)[mask], (v - rm) / np.sqrt(rv + 1e-5), rtol=1e-4, atol=1e-4
    )


def test_batchnorm_sync_across_devices(rng):
    """psum-synced BN over shard_map == BN over the concatenated batch."""
    n_dev = jax.device_count()
    assert n_dev >= 2
    n, c = 64, 4
    feats = rng.randn(n_dev, n, c).astype(np.float32)
    mask = rng.rand(n_dev, n) > 0.2
    feats[~mask] = 0

    bn = MaskedBatchNorm(momentum=0.1, axis_name="data")
    variables = bn.init(
        jax.random.PRNGKey(0), jnp.asarray(feats[0]), jnp.asarray(mask[0])
    )

    mesh = jax.sharding.Mesh(np.array(jax.devices()), ("data",))
    P = jax.sharding.PartitionSpec

    def step(f, m):
        out, _ = bn.apply(
            variables, f[0], m[0], use_running_average=False, mutable=["batch_stats"]
        )
        return out[None]

    out = jax.jit(
        jax.shard_map(
            step, mesh=mesh, in_specs=(P("data"), P("data")), out_specs=P("data")
        )
    )(jnp.asarray(feats), jnp.asarray(mask))

    v = feats[mask]
    mean, var = v.mean(axis=0), v.var(axis=0)
    expect = (feats - mean) / np.sqrt(var + 1e-5)
    np.testing.assert_allclose(
        np.asarray(out)[mask], expect[mask], rtol=1e-4, atol=1e-4
    )


def test_instance_norm_per_sample(rng):
    n, c, b = 300, 6, 3
    feats = rng.randn(n, c).astype(np.float32)
    batch_idx = rng.randint(0, b, size=n).astype(np.int32)
    mask = rng.rand(n) > 0.25
    feats[~mask] = 0
    inorm = MaskedInstanceNorm(num_batches=4)
    out = inorm.apply(
        {}, jnp.asarray(feats), jnp.asarray(mask), jnp.asarray(batch_idx)
    )
    out = np.asarray(out)
    for bb in range(b):
        sel = mask & (batch_idx == bb)
        v = feats[sel]
        expect = (v - v.mean(axis=0)) / np.sqrt(v.var(axis=0) + 1e-5)
        np.testing.assert_allclose(out[sel], expect, rtol=1e-4, atol=1e-4)
    assert np.all(out[~mask] == 0)
