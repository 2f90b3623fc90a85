"""Wide & Deep (Cheng et al., 2016): linear wide part + DNN deep part.

Reference parity: deepctr_torch/models/wdl.py:36-75.
"""

from .base_module import BaseModule
from .basemodel import BaseModel
from ..inputs import combined_dnn_input
from ..layers import DNN
from ..layers.core import _dense


class WDLModule(BaseModule):
    dnn_hidden_units: tuple = (256, 128)
    dnn_dropout: float = 0.0
    dnn_activation: str = "relu"
    dnn_use_bn: bool = False

    def setup_model(self):
        self.use_dnn = (len(self.dnn_feature_columns) > 0 and
                        len(self.dnn_hidden_units) > 0)
        if self.use_dnn:
            self.dnn = DNN(self.dnn_hidden_units,
                           activation=self.dnn_activation,
                           dropout_rate=self.dnn_dropout,
                           use_bn=self.dnn_use_bn, init_std=self.init_std)
            self.dnn_linear = _dense(1, use_bias=False, name="dnn_linear")

    def __call__(self, X, training=False):
        sparse_embedding_list, dense_value_list = (
            self.input_from_feature_columns(X, self.dnn_feature_columns))
        logit = self.linear_model(X)
        if self.use_dnn:
            dnn_input = combined_dnn_input(sparse_embedding_list,
                                           dense_value_list)
            dnn_output = self.dnn(dnn_input, training)
            logit = logit + self.dnn_linear(dnn_output).astype(logit.dtype)
        return self.out(logit)


class WDL(BaseModel):
    """Wide & Deep (constructor parity: deepctr_torch/models/wdl.py:36-47)."""

    def __init__(self, linear_feature_columns, dnn_feature_columns,
                 dnn_hidden_units=(256, 128), l2_reg_linear=1e-5,
                 l2_reg_embedding=1e-5, l2_reg_dnn=0, init_std=1e-4,
                 seed=1024, dnn_dropout=0, dnn_activation="relu",
                 dnn_use_bn=False, task="binary", device=None, gpus=None,
                 mesh=None, shard_embeddings=False):
        self._capture_init_args(locals())
        module = WDLModule(
            linear_feature_columns=tuple(linear_feature_columns),
            dnn_feature_columns=tuple(dnn_feature_columns), task=task,
            init_std=init_std, dnn_hidden_units=tuple(dnn_hidden_units),
            dnn_dropout=dnn_dropout, dnn_activation=dnn_activation,
            dnn_use_bn=dnn_use_bn)
        super().__init__(linear_feature_columns, dnn_feature_columns, module,
                         l2_reg_linear=l2_reg_linear,
                         l2_reg_embedding=l2_reg_embedding, init_std=init_std,
                         seed=seed, task=task, device=device, gpus=gpus,
                         mesh=mesh, shard_embeddings=shard_embeddings)
        self.add_regularization_rule(r"^dnn/.*kernel$", l2=l2_reg_dnn)
        self.add_regularization_rule(r"^dnn_linear/kernel$", l2=l2_reg_dnn)
