"""AFM (Xiao et al., 2017): attention-weighted pairwise interactions.

Reference parity: deepctr_torch/models/afm.py:35-66.
"""

import jax.numpy as jnp

from .base_module import BaseModule
from .basemodel import BaseModel
from ..inputs import embedding_size_of
from ..layers import FM, AFMLayer


class AFMModule(BaseModule):
    use_attention: bool = True
    attention_factor: int = 8
    afm_dropout: float = 0.0

    def setup_model(self):
        if self.use_attention:
            self.fm = AFMLayer(
                in_features=embedding_size_of(self.dnn_feature_columns),
                attention_factor=self.attention_factor,
                dropout_rate=self.afm_dropout)
        else:
            self.fm = FM()

    def __call__(self, X, training=False):
        sparse_embedding_list, _ = self.input_from_feature_columns(
            X, self.dnn_feature_columns, support_dense=False)
        logit = self.linear_model(X)
        if len(sparse_embedding_list) > 0:
            fm_input = jnp.concatenate(sparse_embedding_list, axis=1)
            if self.use_attention:
                logit = logit + self.fm(fm_input, training).astype(logit.dtype)
            else:
                logit = logit + self.fm(fm_input).astype(logit.dtype)
        return self.out(logit)


class AFM(BaseModel):
    """AFM (constructor parity: deepctr_torch/models/afm.py:35-38)."""

    def __init__(self, linear_feature_columns, dnn_feature_columns,
                 use_attention=True, attention_factor=8, l2_reg_linear=1e-5,
                 l2_reg_embedding=1e-5, l2_reg_att=1e-5, afm_dropout=0,
                 init_std=1e-4, seed=1024, task="binary", device=None,
                 gpus=None, mesh=None, shard_embeddings=False):
        self._capture_init_args(locals())
        module = AFMModule(
            linear_feature_columns=tuple(linear_feature_columns),
            dnn_feature_columns=tuple(dnn_feature_columns), task=task,
            init_std=init_std, use_attention=use_attention,
            attention_factor=attention_factor, afm_dropout=afm_dropout)
        super().__init__(linear_feature_columns, dnn_feature_columns, module,
                         l2_reg_linear=l2_reg_linear,
                         l2_reg_embedding=l2_reg_embedding, init_std=init_std,
                         seed=seed, task=task, device=device, gpus=gpus,
                         mesh=mesh, shard_embeddings=shard_embeddings)
        self.add_regularization_rule(r"^fm/attention_W$", l2=l2_reg_att)
