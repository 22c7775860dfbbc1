"""Tests for the fused Pallas instance-norm kernel (interpret mode on CPU)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from shmgan_tpu.ops.pallas.instance_norm import (
    fits_vmem, instance_norm_pallas, instance_norm_reference,
)


@pytest.fixture()
def data():
    k1, k2, k3 = jax.random.split(jax.random.PRNGKey(0), 3)
    x = jax.random.normal(k1, (2, 16, 128, 8))
    gamma = jax.random.uniform(k2, (8,), minval=0.5, maxval=1.5)
    beta = jax.random.normal(k3, (8,)) * 0.1
    return x, gamma, beta


class TestInstanceNormPallas:
    def test_forward_matches_reference(self, data):
        from jax.experimental.pallas import tpu as pltpu
        x, gamma, beta = data
        with pltpu.force_tpu_interpret_mode():
            out = instance_norm_pallas(x, gamma, beta)
        ref = instance_norm_reference(x, gamma, beta)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                                   rtol=1e-4, atol=1e-5)

    def test_gradients_match_reference(self, data):
        from jax.experimental.pallas import tpu as pltpu
        x, gamma, beta = data

        def loss_pallas(x, g, b):
            with pltpu.force_tpu_interpret_mode():
                return jnp.sum(jnp.square(instance_norm_pallas(x, g, b)))

        def loss_ref(x, g, b):
            return jnp.sum(jnp.square(instance_norm_reference(x, g, b)))

        gp = jax.grad(loss_pallas, argnums=(0, 1, 2))(x, gamma, beta)
        gr = jax.grad(loss_ref, argnums=(0, 1, 2))(x, gamma, beta)
        for a, b_ in zip(gp, gr):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b_),
                                       rtol=2e-3, atol=1e-4)

    def test_stats_are_per_instance(self):
        # different batch elements must normalize independently
        from jax.experimental.pallas import tpu as pltpu
        a = jnp.ones((1, 8, 128, 4)) * 5.0
        b = jax.random.normal(jax.random.PRNGKey(1), (1, 8, 128, 4))
        x = jnp.concatenate([a, b])
        gamma = jnp.ones((4,))
        beta = jnp.zeros((4,))
        with pltpu.force_tpu_interpret_mode():
            out = np.asarray(instance_norm_pallas(x, gamma, beta))
        # constant instance -> ~zero output; random instance -> ~unit variance
        assert np.abs(out[0]).max() < 1e-2
        assert 0.8 < out[1].std() < 1.2

    def test_fits_vmem_guard(self):
        assert fits_vmem(128, 128, 64)
        assert not fits_vmem(512, 512, 64)


def test_generator_with_pallas_in_matches(monkeypatch):
    """G forward with the Pallas IN (interpret mode) equals the XLA IN path."""
    import jax
    import jax.numpy as jnp
    from jax.experimental.pallas import tpu as pltpu
    from shmgan_tpu.models import SHMGenerator

    x = jax.random.uniform(jax.random.PRNGKey(0), (1, 32, 128, 10))
    mask = jax.random.uniform(jax.random.PRNGKey(1), (1, 32, 128, 1))
    g_ref = SHMGenerator(filter_size=8, in_pallas=False)
    params = g_ref.init(jax.random.PRNGKey(2), x, mask)["params"]
    out_ref = g_ref.apply({"params": params}, x, mask)
    g_pl = SHMGenerator(filter_size=8, in_pallas=True)
    with pltpu.force_tpu_interpret_mode():
        out_pl = g_pl.apply({"params": params}, x, mask)
    np.testing.assert_allclose(np.asarray(out_pl), np.asarray(out_ref),
                               rtol=1e-3, atol=1e-4)
