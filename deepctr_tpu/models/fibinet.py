"""FiBiNET (Huang et al., 2019): SENET reweighting + bilinear interactions.

Reference parity: deepctr_torch/models/fibinet.py:38-102.  The one Bilinear
module is applied to both the raw and the SENET-reweighted embeddings
(shared weights, fibinet.py:85-86).
"""

import jax.numpy as jnp

from .base_module import BaseModule
from .basemodel import BaseModel
from ..features import SparseFeat, DenseFeat, VarLenSparseFeat
from ..inputs import combined_dnn_input, embedding_size_of
from ..layers import DNN, SENETLayer, BilinearInteraction
from ..layers.core import _dense


class FiBiNETModule(BaseModule):
    bilinear_type: str = "interaction"
    reduction_ratio: int = 3
    dnn_hidden_units: tuple = (128, 128)
    dnn_dropout: float = 0.0
    dnn_activation: str = "relu"

    def setup_model(self):
        field_size = len({f.embedding_name for f in self.dnn_feature_columns
                          if isinstance(f, (SparseFeat, VarLenSparseFeat))})
        self.SE = SENETLayer(field_size, self.reduction_ratio)
        self.Bilinear = BilinearInteraction(
            field_size, embedding_size_of(self.dnn_feature_columns),
            self.bilinear_type)
        self.dnn = DNN(self.dnn_hidden_units, activation=self.dnn_activation,
                       dropout_rate=self.dnn_dropout, use_bn=False,
                       init_std=self.init_std)
        self.dnn_linear = _dense(1, use_bias=False, name="dnn_linear")

    def __call__(self, X, training=False):
        sparse_embedding_list, dense_value_list = (
            self.input_from_feature_columns(X, self.dnn_feature_columns))
        sparse_embedding_input = jnp.concatenate(sparse_embedding_list,
                                                 axis=1)
        senet_output = self.SE(sparse_embedding_input, training)
        senet_bilinear_out = self.Bilinear(senet_output)
        bilinear_out = self.Bilinear(sparse_embedding_input)

        linear_logit = self.linear_model(X)
        pair_out = jnp.concatenate([senet_bilinear_out, bilinear_out], axis=1)
        dnn_input = combined_dnn_input([pair_out], dense_value_list)
        dnn_output = self.dnn(dnn_input, training)
        dnn_logit = self.dnn_linear(dnn_output).astype(linear_logit.dtype)

        if (len(self.linear_feature_columns) > 0 and
                len(self.dnn_feature_columns) > 0):
            final_logit = linear_logit + dnn_logit
        elif len(self.linear_feature_columns) == 0:
            final_logit = dnn_logit
        elif len(self.dnn_feature_columns) == 0:
            final_logit = linear_logit
        else:
            raise NotImplementedError
        return self.out(final_logit)


class FiBiNET(BaseModel):
    """FiBiNET (constructor parity: deepctr_torch/models/fibinet.py:38-42)."""

    def __init__(self, linear_feature_columns, dnn_feature_columns,
                 bilinear_type="interaction", reduction_ratio=3,
                 dnn_hidden_units=(128, 128), l2_reg_linear=1e-5,
                 l2_reg_embedding=1e-5, l2_reg_dnn=0, init_std=1e-4,
                 seed=1024, dnn_dropout=0, dnn_activation="relu",
                 task="binary", device=None, gpus=None, mesh=None,
                 shard_embeddings=False):
        self._capture_init_args(locals())
        module = FiBiNETModule(
            linear_feature_columns=tuple(linear_feature_columns),
            dnn_feature_columns=tuple(dnn_feature_columns), task=task,
            init_std=init_std, bilinear_type=bilinear_type,
            reduction_ratio=reduction_ratio,
            dnn_hidden_units=tuple(dnn_hidden_units),
            dnn_dropout=dnn_dropout, dnn_activation=dnn_activation)
        super().__init__(linear_feature_columns, dnn_feature_columns, module,
                         l2_reg_linear=l2_reg_linear,
                         l2_reg_embedding=l2_reg_embedding, init_std=init_std,
                         seed=seed, task=task, device=device, gpus=gpus,
                         mesh=mesh, shard_embeddings=shard_embeddings)
        self.add_regularization_rule(r"^dnn/.*kernel$", l2=l2_reg_dnn)

    def compute_input_dim(self, feature_columns, include_sparse=True,
                          include_dense=True, feature_group=False):
        """FiBiNET's DNN consumes 2 * F(F-1)/2 bilinear pair vectors.
        (reference parity: fibinet.py:56-74)"""
        sparse_feature_columns = [
            f for f in feature_columns
            if isinstance(f, (SparseFeat, VarLenSparseFeat))]
        dense_feature_columns = [f for f in feature_columns
                                 if isinstance(f, DenseFeat)]
        field_size = len(sparse_feature_columns)
        dense_input_dim = sum(f.dimension for f in dense_feature_columns)
        embedding_size = (sparse_feature_columns[0].embedding_dim
                          if sparse_feature_columns else 0)
        sparse_input_dim = field_size * (field_size - 1) * embedding_size
        input_dim = 0
        if include_sparse:
            input_dim += sparse_input_dim
        if include_dense:
            input_dim += dense_input_dim
        return input_dim
