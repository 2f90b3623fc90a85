"""CCPM (Liu et al., 2015): convolutional click prediction model.

Reference parity: deepctr_torch/models/ccpm.py:42-83.
"""

import jax.numpy as jnp

from .base_module import BaseModule
from .basemodel import BaseModel
from ..layers import DNN, ConvLayer
from ..layers.core import _dense


class CCPMModule(BaseModule):
    conv_kernel_width: tuple = (6, 5)
    conv_filters: tuple = (4, 4)
    dnn_hidden_units: tuple = (256,)
    dnn_dropout: float = 0.0
    dnn_activation: str = "relu"
    dnn_use_bn: bool = False

    def setup_model(self):
        if len(self.conv_kernel_width) != len(self.conv_filters):
            raise ValueError(
                "conv_kernel_width must have same element with conv_filters")
        filed_size = self.compute_input_dim(
            self.dnn_feature_columns, include_dense=False, feature_group=True)
        self.conv_layer = ConvLayer(field_size=filed_size,
                                    conv_kernel_width=self.conv_kernel_width,
                                    conv_filters=self.conv_filters)
        self.dnn = DNN(self.dnn_hidden_units, activation=self.dnn_activation,
                       dropout_rate=self.dnn_dropout, use_bn=self.dnn_use_bn,
                       init_std=self.init_std)
        self.dnn_linear = _dense(1, use_bias=False, name="dnn_linear")

    def __call__(self, X, training=False):
        linear_logit = self.linear_model(X)
        sparse_embedding_list, _ = self.input_from_feature_columns(
            X, self.dnn_feature_columns, support_dense=False)
        if len(sparse_embedding_list) == 0:
            raise ValueError("must have the embedding feature,now the "
                             "embedding feature is None!")
        conv_input = jnp.concatenate(sparse_embedding_list, axis=1)
        conv_input = conv_input[:, None, :, :]          # [B,1,F,E]
        pooling_result = self.conv_layer(conv_input)
        flat = pooling_result.reshape(pooling_result.shape[0], -1)
        dnn_output = self.dnn(flat, training)
        dnn_logit = self.dnn_linear(dnn_output)
        logit = linear_logit + dnn_logit.astype(linear_logit.dtype)
        return self.out(logit)


class CCPM(BaseModel):
    """CCPM (constructor parity: deepctr_torch/models/ccpm.py:42-46)."""

    def __init__(self, linear_feature_columns, dnn_feature_columns,
                 conv_kernel_width=(6, 5), conv_filters=(4, 4),
                 dnn_hidden_units=(256,), l2_reg_linear=1e-5,
                 l2_reg_embedding=1e-5, l2_reg_dnn=0, dnn_dropout=0,
                 init_std=1e-4, seed=1024, task="binary", device=None,
                 dnn_use_bn=False, dnn_activation="relu", gpus=None,
                 mesh=None, shard_embeddings=False):
        self._capture_init_args(locals())
        module = CCPMModule(
            linear_feature_columns=tuple(linear_feature_columns),
            dnn_feature_columns=tuple(dnn_feature_columns), task=task,
            init_std=init_std, conv_kernel_width=tuple(conv_kernel_width),
            conv_filters=tuple(conv_filters),
            dnn_hidden_units=tuple(dnn_hidden_units),
            dnn_dropout=dnn_dropout, dnn_activation=dnn_activation,
            dnn_use_bn=dnn_use_bn)
        super().__init__(linear_feature_columns, dnn_feature_columns, module,
                         l2_reg_linear=l2_reg_linear,
                         l2_reg_embedding=l2_reg_embedding, init_std=init_std,
                         seed=seed, task=task, device=device, gpus=gpus,
                         mesh=mesh, shard_embeddings=shard_embeddings)
        self.add_regularization_rule(r"^dnn/.*kernel$", l2=l2_reg_dnn)
        self.add_regularization_rule(r"^dnn_linear/kernel$", l2=l2_reg_dnn)
