"""Core layers: DNN tower, prediction head, DIN activation unit, SAME conv.

Reference parity: deepctr_torch/layers/core.py.  All matmuls honor the
global compute dtype (bfloat16 on TPU for MXU throughput); parameters stay
float32.
"""

import math

import flax.linen as nn
import jax
import jax.numpy as jnp

from .. import config
from .activation import activation_layer


def _dense(features, init_std=None, use_bias=True, name=None):
    kernel_init = (nn.initializers.normal(init_std) if init_std is not None
                   else nn.initializers.lecun_normal())
    return nn.Dense(features, use_bias=use_bias, kernel_init=kernel_init,
                    dtype=config.compute_dtype(), name=name)


class DNN(nn.Module):
    """MLP tower: [Dense -> (BatchNorm) -> activation -> Dropout] * L.

    (reference parity: deepctr_torch/layers/core.py:67-134; only kernel
    weights are init-overridden with normal(init_std), biases start at 0.)
    """
    hidden_units: tuple
    activation: str = "relu"
    l2_reg: float = 0.0          # recorded by the engine's reg rules
    dropout_rate: float = 0.0
    use_bn: bool = False
    init_std: float = 1e-4
    dice_dim: int = 2            # API parity; Dice infers shapes

    @nn.compact
    def __call__(self, x, training=False):
        if len(self.hidden_units) == 0:
            raise ValueError("hidden_units is empty!!")
        for i, units in enumerate(self.hidden_units):
            x = _dense(units, self.init_std, name="dense_%d" % i)(x)
            if self.use_bn:
                x = nn.BatchNorm(use_running_average=not training,
                                 momentum=0.9, epsilon=1e-5,
                                 name="bn_%d" % i)(x)
            act = activation_layer(self.activation)
            x = act(x, training)
            if self.dropout_rate > 0:
                x = nn.Dropout(self.dropout_rate,
                               deterministic=not training)(x)
        return x


class PredictionLayer(nn.Module):
    """Adds a scalar bias and applies sigmoid iff task == 'binary'.
    (reference parity: deepctr_torch/layers/core.py:137-160)
    """
    task: str = "binary"
    use_bias: bool = True

    @nn.compact
    def __call__(self, x):
        if self.task not in ("binary", "multiclass", "regression"):
            raise ValueError("task must be binary, multiclass or regression")
        out = x
        if self.use_bias:
            bias = self.param("bias", nn.initializers.zeros, (1,))
            out = out + bias
        if self.task == "binary":
            out = jax.nn.sigmoid(out)
        return out


class LocalActivationUnit(nn.Module):
    """DIN attention scorer over [query, key, query-key, query*key].

    query [B,1,E], keys [B,T,E] -> scores [B,T,1].
    (reference parity: deepctr_torch/layers/core.py:10-64)
    """
    hidden_units: tuple = (64, 32)
    activation: str = "sigmoid"
    dropout_rate: float = 0.0
    use_bn: bool = False
    init_std: float = 1e-4

    @nn.compact
    def __call__(self, query, user_behavior, training=False):
        T = user_behavior.shape[1]
        queries = jnp.broadcast_to(query, (query.shape[0], T, query.shape[2]))
        att_input = jnp.concatenate(
            [queries, user_behavior, queries - user_behavior,
             queries * user_behavior], axis=-1)
        att_out = DNN(self.hidden_units, activation=self.activation,
                      dropout_rate=self.dropout_rate, use_bn=self.use_bn,
                      init_std=self.init_std, name="dnn")(att_input, training)
        score = _dense(1, name="dense")(att_out)  # [B, T, 1]
        return score


class Conv2dSame(nn.Module):
    """TF-style 'SAME'-padded 2-D convolution over NCHW inputs.
    (reference parity: deepctr_torch/layers/core.py:163-185)
    """
    in_channels: int
    out_channels: int
    kernel_size: tuple  # (kh, kw)
    stride: tuple = (1, 1)

    @nn.compact
    def __call__(self, x):
        kh, kw = self.kernel_size
        sh, sw = self.stride
        ih, iw = x.shape[-2:]
        oh = math.ceil(ih / sh)
        ow = math.ceil(iw / sw)
        pad_h = max((oh - 1) * sh + kh - ih, 0)
        pad_w = max((ow - 1) * sw + kw - iw, 0)
        kernel = self.param(
            "kernel", nn.initializers.xavier_uniform(),
            (self.out_channels, self.in_channels, kh, kw))
        bias = self.param("bias", nn.initializers.zeros, (self.out_channels,))
        dtype = config.compute_dtype()
        y = jax.lax.conv_general_dilated(
            x.astype(dtype), kernel.astype(dtype),
            window_strides=(sh, sw),
            padding=((pad_h // 2, pad_h - pad_h // 2),
                     (pad_w // 2, pad_w - pad_w // 2)),
            dimension_numbers=("NCHW", "OIHW", "NCHW"))
        return y + bias.astype(dtype)[None, :, None, None]
