"""MMOE (Ma et al., 2018): multi-gate mixture-of-experts.

Reference parity: deepctr_torch/models/multitask/mmoe.py:45-143.  The
reference loops over ``num_experts`` separate DNNs (mmoe.py:115-119); here
the expert tower is ONE ``nn.vmap``-stacked DNN whose parameters carry a
leading expert axis, so every expert layer runs as a single batched einsum
on the MXU instead of K sequential matmuls.
"""

import flax.linen as nn
import jax
import jax.numpy as jnp

from ..base_module import BaseModule
from ..basemodel import BaseModel
from ...inputs import combined_dnn_input
from ...layers import DNN, PredictionLayer
from ...layers.core import _dense
from .utils import validate_tasks


def stacked_dnn(num, **dnn_kwargs):
    """A DNN whose params/stats have a leading ``num`` axis; input is
    broadcast, output gains axis 1: [B, D] -> [B, num, H]."""
    Stacked = nn.vmap(
        DNN,
        variable_axes={"params": 0, "batch_stats": 0},
        split_rngs={"params": True, "dropout": True},
        in_axes=(None, None), out_axes=1, axis_size=num)
    return Stacked(**dnn_kwargs)


class MMOEModule(BaseModule):
    num_experts: int = 3
    expert_dnn_hidden_units: tuple = (256, 128)
    gate_dnn_hidden_units: tuple = (64,)
    tower_dnn_hidden_units: tuple = (64,)
    dnn_dropout: float = 0.0
    dnn_activation: str = "relu"
    dnn_use_bn: bool = False
    task_types: tuple = ("binary", "binary")
    task_names: tuple = ("ctr", "ctcvr")

    def setup_model(self):
        num_tasks = len(self.task_names)
        self.expert_dnn = stacked_dnn(
            self.num_experts, hidden_units=self.expert_dnn_hidden_units,
            activation=self.dnn_activation, dropout_rate=self.dnn_dropout,
            use_bn=self.dnn_use_bn, init_std=self.init_std,
            name="expert_dnn")
        if len(self.gate_dnn_hidden_units) > 0:
            self.gate_dnn = [
                DNN(self.gate_dnn_hidden_units,
                    activation=self.dnn_activation,
                    dropout_rate=self.dnn_dropout, use_bn=self.dnn_use_bn,
                    init_std=self.init_std, name="gate_dnn_%d" % i)
                for i in range(num_tasks)]
        self.gate_dnn_final_layer = [
            _dense(self.num_experts, use_bias=False, name="gate_final_%d" % i)
            for i in range(num_tasks)]
        if len(self.tower_dnn_hidden_units) > 0:
            self.tower_dnn = [
                DNN(self.tower_dnn_hidden_units,
                    activation=self.dnn_activation,
                    dropout_rate=self.dnn_dropout, use_bn=self.dnn_use_bn,
                    init_std=self.init_std, name="tower_dnn_%d" % i)
                for i in range(num_tasks)]
        self.tower_dnn_final_layer = [
            _dense(1, use_bias=False, name="tower_final_%d" % i)
            for i in range(num_tasks)]
        self.task_out = [PredictionLayer(t, name="out_%d" % i)
                         for i, t in enumerate(self.task_types)]

    def __call__(self, X, training=False):
        sparse_embedding_list, dense_value_list = (
            self.input_from_feature_columns(X, self.dnn_feature_columns))
        dnn_input = combined_dnn_input(sparse_embedding_list,
                                      dense_value_list)
        expert_outs = self.expert_dnn(dnn_input, training)  # [B, K, dim]

        task_outs = []
        for i in range(len(self.task_names)):
            gate_in = (self.gate_dnn[i](dnn_input, training)
                       if len(self.gate_dnn_hidden_units) > 0 else dnn_input)
            gate_score = jax.nn.softmax(
                self.gate_dnn_final_layer[i](gate_in), axis=1)   # [B, K]
            mixed = jnp.einsum("bk,bkd->bd",
                               gate_score.astype(expert_outs.dtype),
                               expert_outs)
            h = (self.tower_dnn[i](mixed, training)
                 if len(self.tower_dnn_hidden_units) > 0 else mixed)
            logit = self.tower_dnn_final_layer[i](h).astype(jnp.float32)
            task_outs.append(self.task_out[i](logit))
        return jnp.concatenate(task_outs, axis=-1)


class MMOE(BaseModel):
    """MMOE (constructor parity: mmoe.py:45-49)."""

    def __init__(self, dnn_feature_columns, num_experts=3,
                 expert_dnn_hidden_units=(256, 128),
                 gate_dnn_hidden_units=(64,), tower_dnn_hidden_units=(64,),
                 l2_reg_linear=1e-5, l2_reg_embedding=1e-5, l2_reg_dnn=0,
                 init_std=1e-4, seed=1024, dnn_dropout=0,
                 dnn_activation="relu", dnn_use_bn=False,
                 task_types=("binary", "binary"),
                 task_names=("ctr", "ctcvr"), device=None, gpus=None,
                 mesh=None, shard_embeddings=False):
        self._capture_init_args(locals())
        num_tasks = validate_tasks(task_types, task_names,
                                   dnn_feature_columns)
        if num_experts <= 1:
            raise ValueError("num_experts must be greater than 1")
        module = MMOEModule(
            linear_feature_columns=(),
            dnn_feature_columns=tuple(dnn_feature_columns),
            init_std=init_std, num_experts=num_experts,
            expert_dnn_hidden_units=tuple(expert_dnn_hidden_units),
            gate_dnn_hidden_units=tuple(gate_dnn_hidden_units),
            tower_dnn_hidden_units=tuple(tower_dnn_hidden_units),
            dnn_dropout=dnn_dropout, dnn_activation=dnn_activation,
            dnn_use_bn=dnn_use_bn, task_types=tuple(task_types),
            task_names=tuple(task_names))
        super().__init__([], dnn_feature_columns, module,
                         l2_reg_linear=l2_reg_linear,
                         l2_reg_embedding=l2_reg_embedding, init_std=init_std,
                         seed=seed, task=task_types[0], device=device,
                         gpus=gpus, mesh=mesh,
                         shard_embeddings=shard_embeddings)
        self.num_tasks = num_tasks
        self.task_names = list(task_names)
        self.add_regularization_rule(
            r"^(expert_dnn|gate_dnn_\d+|tower_dnn_\d+)/.*kernel$",
            l2=l2_reg_dnn)
        self.add_regularization_rule(
            r"^(gate_final_\d+|tower_final_\d+)/kernel$", l2=l2_reg_dnn)
