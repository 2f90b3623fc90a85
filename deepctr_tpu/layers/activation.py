"""Activation layers (reference parity: deepctr_torch/layers/activation.py).

Stateless activations are plain jnp functions; Dice/PReLU carry parameters
and are flax modules.  ``activation_layer`` resolves a name (or module class)
into something callable as ``act(x, training=False)`` inside a linen module.
"""

import flax.linen as nn
import jax
import jax.numpy as jnp


class Dice(nn.Module):
    """Data-adaptive activation from DIN: a learned blend of identity and a
    BatchNorm-sigmoid gate, ``out = alpha * (1 - p) * x + p * x`` with
    ``p = sigmoid(BN(x))``.  Works on any rank; statistics are computed over
    all axes except the last (matching the reference's 2-D/3-D variants,
    deepctr_torch/layers/activation.py:6-45).
    """
    epsilon: float = 1e-8

    @nn.compact
    def __call__(self, x, training=False):
        emb_size = x.shape[-1]
        x_norm = nn.BatchNorm(use_running_average=not training,
                              momentum=0.9, epsilon=self.epsilon,
                              use_bias=False, use_scale=False,
                              name="bn")(x)
        x_p = jax.nn.sigmoid(x_norm)
        alpha = self.param("alpha", nn.initializers.zeros, (emb_size,))
        return alpha * (1.0 - x_p) * x + x_p * x


class PReLU(nn.Module):
    """Parametric ReLU with a single learned slope (torch nn.PReLU parity)."""
    init: float = 0.25

    @nn.compact
    def __call__(self, x, training=False):
        alpha = self.param("alpha",
                           lambda key, shape: jnp.full(shape, self.init),
                           (1,))
        return jnp.where(x >= 0, x, alpha * x)


class Identity(nn.Module):
    @nn.compact
    def __call__(self, x, training=False):
        return x


def _wrap(fn):
    return lambda x, training=False: fn(x)


def activation_layer(act_name, hidden_size=None, dice_dim=2):
    """Resolve an activation spec to ``callable(x, training) -> x``.

    Accepts 'sigmoid' | 'linear' | 'relu' | 'dice' | 'prelu' | 'tanh', a flax
    module class, or a plain callable.  ``hidden_size``/``dice_dim`` are
    accepted for API parity (Dice infers its size from the input).
    """
    if isinstance(act_name, str):
        name = act_name.lower()
        if name == "sigmoid":
            return _wrap(jax.nn.sigmoid)
        if name == "linear":
            return _wrap(lambda x: x)
        if name == "relu":
            return _wrap(jax.nn.relu)
        if name == "tanh":
            return _wrap(jnp.tanh)
        if name == "dice":
            return Dice()
        if name == "prelu":
            return PReLU()
        raise NotImplementedError("unknown activation %r" % act_name)
    if isinstance(act_name, type) and issubclass(act_name, nn.Module):
        return act_name()
    if callable(act_name):
        return _wrap(act_name)
    raise NotImplementedError(act_name)
