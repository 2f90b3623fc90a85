"""PLE (Tang et al., 2020): progressive layered extraction — multi-level
CGC with task-specific + shared experts and progressive routing.

Reference parity: deepctr_torch/models/multitask/ple.py:44-219.  Expert
groups are ``nn.vmap``-stacked (one batched einsum per group) instead of
the reference's triple-nested ModuleList loops.
"""

import jax
import jax.numpy as jnp

from ..base_module import BaseModule
from ..basemodel import BaseModel
from ...inputs import combined_dnn_input
from ...layers import DNN, PredictionLayer
from ...layers.core import _dense
from .mmoe import stacked_dnn
from .utils import validate_tasks


class PLEModule(BaseModule):
    shared_expert_num: int = 1
    specific_expert_num: int = 1
    num_levels: int = 2
    expert_dnn_hidden_units: tuple = (256, 128)
    gate_dnn_hidden_units: tuple = (64,)
    tower_dnn_hidden_units: tuple = (64,)
    dnn_dropout: float = 0.0
    dnn_activation: str = "relu"
    dnn_use_bn: bool = False
    task_types: tuple = ("binary", "binary")
    task_names: tuple = ("ctr", "ctcvr")

    def setup_model(self):
        T, L = len(self.task_names), self.num_levels
        dnn_kw = dict(hidden_units=self.expert_dnn_hidden_units,
                      activation=self.dnn_activation,
                      dropout_rate=self.dnn_dropout,
                      use_bn=self.dnn_use_bn, init_std=self.init_std)
        # experts: per level, per task one stacked group of specific experts,
        # plus one stacked group of shared experts
        self.specific_experts = [
            [stacked_dnn(self.specific_expert_num,
                         name="specific_expert_l%d_t%d" % (l, t), **dnn_kw)
             for t in range(T)] for l in range(L)]
        self.shared_experts = [
            stacked_dnn(self.shared_expert_num,
                        name="shared_expert_l%d" % l, **dnn_kw)
            for l in range(L)]

        gate_kw = dict(hidden_units=self.gate_dnn_hidden_units,
                       activation=self.dnn_activation,
                       dropout_rate=self.dnn_dropout,
                       use_bn=self.dnn_use_bn, init_std=self.init_std)
        if len(self.gate_dnn_hidden_units) > 0:
            self.specific_gate_dnn = [
                [DNN(name="specific_gate_dnn_l%d_t%d" % (l, t), **gate_kw)
                 for t in range(T)] for l in range(L)]
            self.shared_gate_dnn = [
                DNN(name="shared_gate_dnn_l%d" % l, **gate_kw)
                for l in range(L)]
        specific_gate_dim = self.specific_expert_num + self.shared_expert_num
        shared_gate_dim = (T * self.specific_expert_num +
                           self.shared_expert_num)
        self.specific_gate_final = [
            [_dense(specific_gate_dim, use_bias=False,
                    name="specific_gate_final_l%d_t%d" % (l, t))
             for t in range(T)] for l in range(L)]
        self.shared_gate_final = [
            _dense(shared_gate_dim, use_bias=False,
                   name="shared_gate_final_l%d" % l) for l in range(L)]

        if len(self.tower_dnn_hidden_units) > 0:
            self.tower_dnn = [
                DNN(self.tower_dnn_hidden_units,
                    activation=self.dnn_activation,
                    dropout_rate=self.dnn_dropout, use_bn=self.dnn_use_bn,
                    init_std=self.init_std, name="tower_dnn_%d" % i)
                for i in range(T)]
        self.tower_dnn_final_layer = [
            _dense(1, use_bias=False, name="tower_final_%d" % i)
            for i in range(T)]
        self.task_out = [PredictionLayer(t, name="out_%d" % i)
                         for i, t in enumerate(self.task_types)]

    def _gate_mix(self, gate_in, experts, gate_dnn, gate_final, training):
        """softmax(gate(x)) @ experts  — experts [B, K, dim] -> [B, dim]."""
        h = gate_dnn(gate_in, training) if gate_dnn is not None else gate_in
        score = jax.nn.softmax(gate_final(h), axis=1)
        return jnp.einsum("bk,bkd->bd", score.astype(experts.dtype), experts)

    def _cgc_net(self, inputs, level, training):
        """One CGC layer; inputs = [task_1..task_T, shared].
        (reference parity: ple.py:147-206)"""
        T = len(self.task_names)
        has_gate_dnn = len(self.gate_dnn_hidden_units) > 0
        specific_outs = [
            self.specific_experts[level][t](inputs[t], training)  # [B,Ks,dim]
            for t in range(T)]
        shared_outs = self.shared_experts[level](inputs[-1], training)

        outs = []
        for t in range(T):
            experts = jnp.concatenate([specific_outs[t], shared_outs],
                                      axis=1)
            outs.append(self._gate_mix(
                inputs[t], experts,
                self.specific_gate_dnn[level][t] if has_gate_dnn else None,
                self.specific_gate_final[level][t], training))
        all_experts = jnp.concatenate(specific_outs + [shared_outs], axis=1)
        outs.append(self._gate_mix(
            inputs[-1], all_experts,
            self.shared_gate_dnn[level] if has_gate_dnn else None,
            self.shared_gate_final[level], training))
        return outs

    def __call__(self, X, training=False):
        sparse_embedding_list, dense_value_list = (
            self.input_from_feature_columns(X, self.dnn_feature_columns))
        dnn_input = combined_dnn_input(sparse_embedding_list,
                                      dense_value_list)
        T = len(self.task_names)
        ple_inputs = [dnn_input] * (T + 1)
        for level in range(self.num_levels):
            ple_inputs = self._cgc_net(ple_inputs, level, training)

        task_outs = []
        for i in range(T):
            h = (self.tower_dnn[i](ple_inputs[i], training)
                 if len(self.tower_dnn_hidden_units) > 0 else ple_inputs[i])
            logit = self.tower_dnn_final_layer[i](h).astype(jnp.float32)
            task_outs.append(self.task_out[i](logit))
        return jnp.concatenate(task_outs, axis=-1)


class PLE(BaseModel):
    """PLE (constructor parity: ple.py:44-48)."""

    def __init__(self, dnn_feature_columns, shared_expert_num=1,
                 specific_expert_num=1, num_levels=2,
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
        module = PLEModule(
            linear_feature_columns=(),
            dnn_feature_columns=tuple(dnn_feature_columns),
            init_std=init_std, shared_expert_num=shared_expert_num,
            specific_expert_num=specific_expert_num, num_levels=num_levels,
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
            r"^(specific_expert|shared_expert|specific_gate|shared_gate|"
            r"tower_dnn_\d+|tower_final_\d+).*kernel$", l2=l2_reg_dnn)
