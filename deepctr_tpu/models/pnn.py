"""PNN (Qu et al., 2016): product layers (inner/outer) feeding a DNN.

No wide/linear part: the base is built with an empty linear column list.
Reference parity: deepctr_torch/models/pnn.py:38-109.
"""

import jax.numpy as jnp

from .base_module import BaseModule
from .basemodel import BaseModel
from ..inputs import combined_dnn_input, embedding_size_of
from ..layers import DNN, InnerProductLayer, OutterProductLayer
from ..layers.core import _dense


class PNNModule(BaseModule):
    dnn_hidden_units: tuple = (128, 128)
    dnn_dropout: float = 0.0
    dnn_activation: str = "relu"
    use_inner: bool = True
    use_outter: bool = False
    kernel_type: str = "mat"

    def setup_model(self):
        if self.kernel_type not in ["mat", "vec", "num"]:
            raise ValueError("kernel_type must be mat,vec or num")
        num_inputs = self.compute_input_dim(
            self.dnn_feature_columns, include_dense=False, feature_group=True)
        if self.use_inner:
            self.innerproduct = InnerProductLayer()
        if self.use_outter:
            self.outterproduct = OutterProductLayer(
                num_inputs, embedding_size_of(self.dnn_feature_columns),
                kernel_type=self.kernel_type)
        self.dnn = DNN(self.dnn_hidden_units, activation=self.dnn_activation,
                       dropout_rate=self.dnn_dropout, use_bn=False,
                       init_std=self.init_std)
        self.dnn_linear = _dense(1, use_bias=False, name="dnn_linear")

    def __call__(self, X, training=False):
        sparse_embedding_list, dense_value_list = (
            self.input_from_feature_columns(X, self.dnn_feature_columns))
        emb = jnp.concatenate(sparse_embedding_list, axis=1)   # [B, F, E]
        linear_signal = emb.reshape(emb.shape[0], -1)

        parts = [linear_signal]
        if self.use_inner:
            inner = self.innerproduct(emb)
            parts.append(inner.reshape(inner.shape[0], -1))
        if self.use_outter:
            parts.append(self.outterproduct(emb))
        product_layer = jnp.concatenate(parts, axis=1) if len(parts) > 1 \
            else linear_signal

        dnn_input = combined_dnn_input([product_layer], dense_value_list)
        dnn_output = self.dnn(dnn_input, training)
        logit = self.dnn_linear(dnn_output).astype(jnp.float32)
        return self.out(logit)


class PNN(BaseModel):
    """PNN (constructor parity: deepctr_torch/models/pnn.py:38-41; takes only
    ``dnn_feature_columns``)."""

    def __init__(self, dnn_feature_columns, dnn_hidden_units=(128, 128),
                 l2_reg_embedding=1e-5, l2_reg_dnn=0, init_std=1e-4,
                 seed=1024, dnn_dropout=0, dnn_activation="relu",
                 use_inner=True, use_outter=False, kernel_type="mat",
                 task="binary", device=None, gpus=None, mesh=None,
                 shard_embeddings=False):
        self._capture_init_args(locals())
        module = PNNModule(
            linear_feature_columns=(),
            dnn_feature_columns=tuple(dnn_feature_columns), task=task,
            init_std=init_std, dnn_hidden_units=tuple(dnn_hidden_units),
            dnn_dropout=dnn_dropout, dnn_activation=dnn_activation,
            use_inner=use_inner, use_outter=use_outter,
            kernel_type=kernel_type)
        super().__init__([], dnn_feature_columns, module,
                         l2_reg_linear=0,
                         l2_reg_embedding=l2_reg_embedding, init_std=init_std,
                         seed=seed, task=task, device=device, gpus=gpus,
                         mesh=mesh, shard_embeddings=shard_embeddings)
        self.add_regularization_rule(r"^dnn/.*kernel$", l2=l2_reg_dnn)
        self.add_regularization_rule(r"^dnn_linear/kernel$", l2=l2_reg_dnn)
