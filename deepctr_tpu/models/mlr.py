"""MLR / LS-PLM (Gai et al., 2017): mixture of logistic regressions — a
softmax region gate over ``region_num`` linear models times per-region
learner scores, with an optional bias gate.

Reference parity: deepctr_torch/models/mlr.py:39-100.  One deliberate
divergence: the reference's ``get_learner_score`` re-uses the *region*
linear models (mlr.py:85-88), leaving ``base_feature_columns`` without
effect — here the learner score comes from the base linear models as the
LS-PLM paper specifies.  Region gating, bias gate and the ``use_bias=False``
prediction head match the reference.
"""

import flax.linen as nn
import jax
import jax.numpy as jnp

from .basemodel import BaseModel
from .base_module import LinearModel
from ..features import build_input_features
from ..layers.core import PredictionLayer


class MLRModule(nn.Module):
    region_feature_columns: tuple
    base_feature_columns: tuple
    bias_feature_columns: tuple
    feature_index: tuple
    region_num: int = 4
    task: str = "binary"
    init_std: float = 1e-4

    def setup(self):
        self.region_linear_model = [
            LinearModel(self.region_feature_columns, self.feature_index,
                        self.init_std, name="region_linear_%d" % i)
            for i in range(self.region_num)]
        self.base_linear_model = [
            LinearModel(self.base_feature_columns, self.feature_index,
                        self.init_std, name="base_linear_%d" % i)
            for i in range(self.region_num)]
        if len(self.bias_feature_columns) > 0:
            self.bias_linear = LinearModel(self.bias_feature_columns,
                                           self.feature_index, self.init_std,
                                           name="bias_linear")
            self.bias_prediction = PredictionLayer(task="binary",
                                                   use_bias=False)
        self.prediction_layer = PredictionLayer(task=self.task,
                                                use_bias=False)

    def __call__(self, X, training=False):
        region_logit = jnp.concatenate(
            [m(X) for m in self.region_linear_model], axis=-1)
        region_score = jax.nn.softmax(region_logit, axis=-1)
        learner_logit = jnp.concatenate(
            [m(X) for m in self.base_linear_model], axis=-1)
        learner_score = self.prediction_layer(learner_logit)
        final = jnp.sum(region_score * learner_score, axis=-1, keepdims=True)
        if len(self.bias_feature_columns) > 0:
            bias_score = self.bias_prediction(self.bias_linear(X))
            final = final * bias_score
        return final


class MLR(BaseModel):
    """MLR (constructor parity: deepctr_torch/models/mlr.py:35-38)."""

    def __init__(self, region_feature_columns, base_feature_columns=None,
                 bias_feature_columns=None, region_num=4, l2_reg_linear=1e-5,
                 init_std=1e-4, seed=1024, task="binary", device=None,
                 gpus=None, mesh=None, shard_embeddings=False):
        self._capture_init_args(locals())
        if region_num <= 1:
            raise ValueError("region_num must > 1")
        region_feature_columns = list(region_feature_columns)
        if base_feature_columns is None or len(base_feature_columns) == 0:
            base_feature_columns = region_feature_columns
        else:
            base_feature_columns = list(base_feature_columns)
        bias_feature_columns = list(bias_feature_columns or [])

        all_columns = (region_feature_columns + base_feature_columns +
                       bias_feature_columns)
        index = build_input_features(all_columns)
        module = MLRModule(
            region_feature_columns=tuple(region_feature_columns),
            base_feature_columns=tuple(base_feature_columns),
            bias_feature_columns=tuple(bias_feature_columns),
            feature_index=tuple((k, v) for k, v in index.items()),
            region_num=region_num, task=task, init_std=init_std)
        # all columns go through `linear_feature_columns` so the engine's
        # feature_index covers region+base+bias spans
        super().__init__(all_columns, [], module, l2_reg_linear=l2_reg_linear,
                         l2_reg_embedding=0, init_std=init_std, seed=seed,
                         task=task, device=device, gpus=gpus, mesh=mesh,
                         shard_embeddings=shard_embeddings)
        self.region_feature_columns = region_feature_columns
        self.base_feature_columns = base_feature_columns
        self.bias_feature_columns = bias_feature_columns
