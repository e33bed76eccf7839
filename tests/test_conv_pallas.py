"""Column-packed Pallas conv (experimental): exact parity in interpret mode."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from mri_superresolution_tpu.experiments.conv_pallas import (conv3x3_packed,
                                                     conv3x3_packed_fwd,
                                                     pack_weights, _xla_conv)


@pytest.mark.parametrize("ci,co,h,w,ht", [
    (32, 16, 64, 64, 16),   # P=8, multiple strips
    (16, 16, 64, 64, 32),   # P=8
    (96, 32, 48, 32, 16),   # P=4, decoder-like shape
    (64, 64, 32, 32, 32),   # P=2, single strip
])
def test_packed_conv_matches_xla(rng, ci, co, h, w, ht):
    x = jnp.asarray(rng.random((3, h, w, ci), dtype=np.float32))
    k = jnp.asarray(rng.normal(0, 0.1, (3, 3, ci, co)).astype(np.float32))
    got = np.asarray(conv3x3_packed_fwd(x, k, h_tile=ht, interpret=True))
    want = np.asarray(_xla_conv(x, k))
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)


def test_packed_conv_gradients(rng):
    x = jnp.asarray(rng.random((1, 32, 64, 16), dtype=np.float32))
    k = jnp.asarray(rng.normal(0, 0.1, (3, 3, 16, 16)).astype(np.float32))
    g1 = jax.grad(lambda a: jnp.sum(conv3x3_packed(a, k, 32, True) ** 2))(x)
    g2 = jax.grad(lambda a: jnp.sum(_xla_conv(a, k) ** 2))(x)
    np.testing.assert_allclose(np.asarray(g1), np.asarray(g2),
                               rtol=1e-4, atol=1e-5)


def test_pack_weights_structure(rng):
    k = jnp.asarray(rng.normal(0, 1, (3, 3, 4, 16)).astype(np.float32))
    p = 8
    w = np.asarray(pack_weights(k, p)).reshape(3, p + 2, 4, p, 16)
    # column phase pc sees kernel tap dw at patch offset pc+dw, zeros elsewhere
    for pc in (0, 3, 7):
        for dw in range(3):
            np.testing.assert_array_equal(w[:, pc + dw, :, pc, :],
                                          np.asarray(k[:, dw]))
        np.testing.assert_array_equal(w[:, pc + 4:, :, pc, :] * 0,
                                      w[:, pc + 4:, :, pc, :] * 0)
        assert np.all(w[:, :pc, :, pc, :] == 0)
