"""Masked sequence pooling semantics (incl. the empty-sequence max case
that poisons downstream layers if the mask constant leaks)."""

import numpy as np
import jax.numpy as jnp
import pytest

from deepctr_tpu.layers.sequence import masked_pooling


def _seq():
    return jnp.asarray(np.arange(2 * 3 * 4, dtype=np.float32)
                       .reshape(2, 3, 4))


@pytest.mark.parametrize("mode", ["sum", "mean", "max"])
def test_empty_sequences_pool_to_zero(mode):
    seq = _seq()
    mask = jnp.zeros((2, 3), bool)            # everything padding
    out = masked_pooling([seq, mask], mode, supports_masking=True)
    np.testing.assert_allclose(np.asarray(out), 0.0, atol=1e-6)


def test_masked_max_ignores_padding():
    seq = _seq()
    mask = jnp.asarray([[True, True, False], [True, False, False]])
    out = masked_pooling([seq, mask], "max", supports_masking=True)
    expected = np.stack([np.asarray(seq)[0, :2].max(axis=0),
                         np.asarray(seq)[1, :1].max(axis=0)])[:, None, :]
    np.testing.assert_allclose(np.asarray(out), expected)


def test_length_based_mean():
    seq = _seq()
    lengths = jnp.asarray([[2.0], [3.0]])
    out = masked_pooling([seq, lengths], "mean", supports_masking=False)
    expected = np.stack([np.asarray(seq)[0, :2].mean(axis=0),
                         np.asarray(seq)[1, :3].mean(axis=0)])[:, None, :]
    np.testing.assert_allclose(np.asarray(out), expected, rtol=1e-5)
