"""Feature-interaction layers — the compute kernels of the framework.

Reference parity: deepctr_torch/layers/interaction.py.  Unlike the
reference (python lists of [B,1,E] tensors, per-pair nn.Linear loops), every
layer here consumes a stacked ``[B, F, E]`` field tensor and expresses the
pairwise math as batched einsums/matmuls so XLA can tile it onto the MXU.
Pair enumeration is done once with static triu indices.

Hot ops (FM, CIN, CrossNet, attention-over-history) also have Pallas TPU
kernels in ``deepctr_tpu.ops.pallas``; layers dispatch through
``deepctr_tpu.ops`` which falls back to these jnp forms off-TPU.
"""

import os as _os

import numpy as np
import flax.linen as nn
import jax
import jax.numpy as jnp

from .. import config
from .activation import activation_layer
from .core import Conv2dSame, _dense
from .sequence import KMaxPooling


def _pair_indices(num_fields):
    rows, cols = np.triu_indices(num_fields, k=1)
    return rows.astype(np.int32), cols.astype(np.int32)


class FM(nn.Module):
    """Factorization-machine pairwise interaction:
    ``0.5 * sum_e((sum_f v)^2 - sum_f v^2)`` over [B,F,E] -> [B,1].
    (reference parity: deepctr_torch/layers/interaction.py:12-34)
    """

    @nn.compact
    def __call__(self, inputs):
        from ..ops import fm_cross
        return fm_cross(inputs)


class BiInteractionPooling(nn.Module):
    """NFM bi-interaction: FM cross term kept as a [B,1,E] vector.
    (reference parity: deepctr_torch/layers/interaction.py:37-61)
    """

    @nn.compact
    def __call__(self, inputs):
        square_of_sum = jnp.sum(inputs, axis=1, keepdims=True) ** 2
        sum_of_square = jnp.sum(inputs * inputs, axis=1, keepdims=True)
        return 0.5 * (square_of_sum - sum_of_square)


class SENETLayer(nn.Module):
    """Squeeze-and-excitation reweighting over fields (FiBiNET).
    (reference parity: deepctr_torch/layers/interaction.py:64-101)
    """
    filed_size: int
    reduction_ratio: int = 3

    @nn.compact
    def __call__(self, inputs, training=False):
        if inputs.ndim != 3:
            raise ValueError("SENETLayer expects [B, F, E] inputs")
        reduction_size = max(1, self.filed_size // self.reduction_ratio)
        z = jnp.mean(inputs, axis=-1)                     # [B, F]
        a = _dense(reduction_size, use_bias=False, name="reduce")(z)
        a = jax.nn.relu(a)
        a = _dense(self.filed_size, use_bias=False, name="expand")(a)
        a = jax.nn.relu(a)
        return inputs * a[:, :, None]


class BilinearInteraction(nn.Module):
    """Pairwise bilinear product ``W v_i * v_j`` with 'all'/'each'/
    'interaction' weight sharing.  Weights for the non-shared modes are
    stacked into one [n, E, E] parameter and applied with a single einsum.
    (reference parity: deepctr_torch/layers/interaction.py:104-156)
    """
    filed_size: int
    embedding_size: int
    bilinear_type: str = "interaction"

    @nn.compact
    def __call__(self, inputs):
        if inputs.ndim != 3:
            raise ValueError("BilinearInteraction expects [B, F, E] inputs")
        F, E = self.filed_size, self.embedding_size
        rows, cols = _pair_indices(F)
        vi = inputs[:, rows]   # [B, P, E]
        vj = inputs[:, cols]   # [B, P, E]
        init = nn.initializers.variance_scaling(1.0 / 3.0, "fan_in", "uniform")
        dtype = config.compute_dtype()
        if self.bilinear_type == "all":
            w = self.param("kernel", init, (E, E))
            p = jnp.einsum("bpe,ef->bpf", vi.astype(dtype),
                           w.astype(dtype)) * vj.astype(dtype)
        elif self.bilinear_type == "each":
            w = self.param("kernel", init, (F, E, E))
            wi = w[rows]       # [P, E, E]
            p = jnp.einsum("bpe,pef->bpf", vi.astype(dtype),
                           wi.astype(dtype)) * vj.astype(dtype)
        elif self.bilinear_type == "interaction":
            w = self.param("kernel", init, (len(rows), E, E))
            p = jnp.einsum("bpe,pef->bpf", vi.astype(dtype),
                           w.astype(dtype)) * vj.astype(dtype)
        else:
            raise NotImplementedError(self.bilinear_type)
        return p


class CIN(nn.Module):
    """Compressed Interaction Network (xDeepFM).

    Per layer k: ``z = einsum('bhd,bmd->bhmd', x_k, x_0)`` reshaped to
    [B, Hk*F, D], then a 1x1 "conv" = channel-mixing matmul -> [B, Hk+1, D];
    optional split-half feeds half forward; sum-pool over D at the end.
    (reference parity: deepctr_torch/layers/interaction.py:159-248)
    """
    field_size: int
    layer_size: tuple = (128, 128)
    activation: str = "relu"
    split_half: bool = True
    init_std: float = 1e-4

    @nn.compact
    def __call__(self, inputs, training=False):
        if inputs.ndim != 3:
            raise ValueError("CIN expects [B, F, E] inputs")
        if len(self.layer_size) == 0:
            raise ValueError("layer_size must be a list(tuple) of length "
                             "greater than 1")
        from ..ops import cin_mix
        dtype = config.compute_dtype()
        # DEEPCTR_CIN_DTYPE under bf16 compute: 'bf16' (default, full
        # MXU rate), 'carry' (bf16 matmul operands, f32 carried hidden
        # maps, -6.7%), 'f32' (whole stack f32, -26.6%).  Default is
        # bf16 because the apparent bf16 quality effect did NOT survive
        # more seeds: a 3-seed check suggested bf16 CIN chains tip
        # seeds into worse optima (causal probe recovered one seed
        # 0.764 -> 0.820), but seeds 3-8 showed f32 itself drawing as
        # low as 0.744 — converged-optimum selection in this config is
        # a +-0.04 seed lottery in BOTH dtypes, with no distinguishable
        # dtype effect at n=9 (BASELINE round-5, full investigation).
        # The knobs keep the perturbation study one env var away.
        mode = _os.environ.get("DEEPCTR_CIN_DTYPE", "bf16")
        if _os.environ.get("DEEPCTR_CIN_F32_CARRY") == "0":
            mode = "bf16"   # back-compat with the earlier carry knob
        if dtype != jnp.bfloat16 or not config.is_training_trace():
            # inference traces keep bf16 ops: no trajectory to corrupt,
            # and the Pallas CIN inference kernel (1.52x) stays live
            mode = "off"
        op_dtype = jnp.float32 if mode == "f32" else dtype
        f32_carry = mode in ("f32", "carry")
        carry_dtype = jnp.float32 if f32_carry else dtype
        F = self.field_size
        field_nums = [F]
        # D-major layout throughout: feature-map axis last so the fused
        # kernel contracts over H*F with MXU-friendly tiling
        x0_t = jnp.transpose(inputs, (0, 2, 1)).astype(carry_dtype)
        hidden = x0_t
        finals = []
        act = activation_layer(self.activation)
        for i, size in enumerate(self.layer_size):
            in_ch = field_nums[-1] * F
            # torch Conv1d default init: kaiming-uniform(a=sqrt(5)) ~= U(+-1/sqrt(in))
            init = nn.initializers.variance_scaling(1.0 / 3.0, "fan_in",
                                                    "uniform")
            w = self.param("conv_w_%d" % i, init, (size, in_ch))
            b = self.param("conv_b_%d" % i, nn.initializers.zeros, (size,))
            w3 = w.astype(op_dtype).reshape(size, field_nums[-1], F)
            x = cin_mix(hidden.astype(op_dtype), x0_t.astype(op_dtype),
                        w3, training=training,
                        out_dtype=carry_dtype if f32_carry else None) \
                + b.astype(carry_dtype)[None, None, :]
            curr_out = act(x)                                   # [B, E, size]
            if self.split_half:
                if i != len(self.layer_size) - 1:
                    if size % 2 > 0:
                        raise ValueError(
                            "layer_size must be even number except for the "
                            "last layer when split_half=True")
                    next_hidden, direct = jnp.split(curr_out, 2, axis=-1)
                    field_nums.append(size // 2)
                else:
                    direct = curr_out
                    next_hidden = None
            else:
                direct = curr_out
                next_hidden = curr_out
                field_nums.append(size)
            finals.append(direct)
            hidden = next_hidden
        result = jnp.concatenate(finals, axis=-1)   # [B, E, total_maps]
        return jnp.sum(result, axis=1)              # [B, featuremap_num]


class AFMLayer(nn.Module):
    """Attentional FM: softmax attention over pairwise element products.
    (reference parity: deepctr_torch/layers/interaction.py:251-325)
    """
    in_features: int            # embedding size
    attention_factor: int = 4
    l2_reg_w: float = 0.0
    dropout_rate: float = 0.0

    @nn.compact
    def __call__(self, inputs, training=False):
        # inputs: [B, F, E] stacked field embeddings
        E = self.in_features
        rows, cols = _pair_indices(inputs.shape[1])
        p = inputs[:, rows]
        q = inputs[:, cols]
        bi = p * q                                        # [B, P, E]
        att_w = self.param("attention_W",
                           nn.initializers.xavier_normal(), (E, self.attention_factor))
        att_b = self.param("attention_b", nn.initializers.zeros,
                           (self.attention_factor,))
        proj_h = self.param("projection_h", nn.initializers.xavier_normal(),
                            (self.attention_factor, 1))
        proj_p = self.param("projection_p", nn.initializers.xavier_normal(),
                            (E, 1))
        att_tmp = jax.nn.relu(jnp.tensordot(bi, att_w, axes=((-1,), (0,))) + att_b)
        score = jax.nn.softmax(jnp.tensordot(att_tmp, proj_h,
                                             axes=((-1,), (0,))), axis=1)
        att_out = jnp.sum(score * bi, axis=1)             # [B, E]
        if self.dropout_rate > 0:
            att_out = nn.Dropout(self.dropout_rate,
                                 deterministic=not training)(att_out)
        return jnp.tensordot(att_out, proj_p, axes=((-1,), (0,)))  # [B, 1]


class InteractingLayer(nn.Module):
    """Multi-head self-attention over fields (AutoInt / DIFM).
    (reference parity: deepctr_torch/layers/interaction.py:328-394)
    """
    embedding_size: int
    head_num: int = 2
    use_res: bool = True
    scaling: bool = False

    @nn.compact
    def __call__(self, inputs):
        if self.head_num <= 0:
            raise ValueError("head_num must be a int > 0")
        if self.embedding_size % self.head_num != 0:
            raise ValueError(
                "embedding_size is not an integer multiple of head_num!")
        if inputs.ndim != 3:
            raise ValueError("InteractingLayer expects [B, F, E] inputs")
        E = self.embedding_size
        H = self.head_num
        d = E // H
        init = nn.initializers.normal(0.05)
        dtype = config.compute_dtype()
        w_q = self.param("W_Query", init, (E, E)).astype(dtype)
        w_k = self.param("W_key", init, (E, E)).astype(dtype)
        w_v = self.param("W_Value", init, (E, E)).astype(dtype)
        x = inputs.astype(dtype)
        B, F = x.shape[0], x.shape[1]

        def heads(t):  # [B,F,E] -> [B,H,F,d]
            return t.reshape(B, F, H, d).transpose(0, 2, 1, 3)

        q = heads(jnp.einsum("bfe,eo->bfo", x, w_q))
        k = heads(jnp.einsum("bfe,eo->bfo", x, w_k))
        v = heads(jnp.einsum("bfe,eo->bfo", x, w_v))
        scores = jnp.einsum("bhik,bhjk->bhij", q, k)
        if self.scaling:
            scores = scores / (d ** 0.5)
        att = jax.nn.softmax(scores, axis=-1)
        out = jnp.einsum("bhij,bhjd->bhid", att, v)       # [B,H,F,d]
        out = out.transpose(0, 2, 1, 3).reshape(B, F, E)
        if self.use_res:
            w_res = self.param("W_Res", init, (E, E)).astype(dtype)
            out = out + jnp.einsum("bfe,eo->bfo", x, w_res)
        return jax.nn.relu(out)


class CrossNet(nn.Module):
    """DCN cross network; 'vector' (DCN) or 'matrix' (DCN-V2) parameterization.
    (reference parity: deepctr_torch/layers/interaction.py:397-453)
    """
    in_features: int
    layer_num: int = 2
    parameterization: str = "vector"

    @nn.compact
    def __call__(self, inputs):
        from ..ops import cross_net
        n = self.in_features
        if self.parameterization == "vector":
            kernels = self.param("kernels", _stacked_xavier_normal,
                                 (self.layer_num, n, 1))
        elif self.parameterization == "matrix":
            kernels = self.param("kernels", _stacked_xavier_normal,
                                 (self.layer_num, n, n))
        else:
            raise ValueError("parameterization should be 'vector' or 'matrix'")
        bias = self.param("bias", nn.initializers.zeros,
                          (self.layer_num, n, 1))
        dtype = config.compute_dtype()
        return cross_net(inputs.astype(dtype), kernels.astype(dtype),
                         bias.astype(dtype), self.parameterization)


class CrossNetMix(nn.Module):
    """DCN-Mix: per-layer mixture of low-rank experts in the cross space.
    (reference parity: deepctr_torch/layers/interaction.py:456-534)

    The reference's per-expert python loop is replaced by einsums over a
    stacked expert axis.
    """
    in_features: int
    low_rank: int = 32
    num_experts: int = 4
    layer_num: int = 2

    @nn.compact
    def __call__(self, inputs):
        n, r, K, L = (self.in_features, self.low_rank, self.num_experts,
                      self.layer_num)
        U = self.param("U_list", _stacked_xavier_normal, (L, K, n, r))
        V = self.param("V_list", _stacked_xavier_normal, (L, K, n, r))
        C = self.param("C_list", _stacked_xavier_normal, (L, K, r, r))
        bias = self.param("bias", nn.initializers.zeros, (L, n, 1))
        gate_init = nn.initializers.variance_scaling(1.0 / 3.0, "fan_in",
                                                     "uniform")
        gates = self.param("gating", gate_init, (K, n, 1))
        dtype = config.compute_dtype()
        x0 = inputs.astype(dtype)                         # [B, n]
        xl = x0
        for i in range(L):
            # gate scores per expert: [B, K]
            g = jnp.einsum("bn,knr->bkr", xl, gates.astype(dtype))[..., 0]
            # low-rank expert path: V^T x -> tanh -> C -> tanh -> U
            vx = jnp.tanh(jnp.einsum("bn,knr->bkr", xl, V[i].astype(dtype)))
            # C v (not C^T v): out_s = sum_r C[s, r] v_r, matching the
            # reference's torch.matmul(C_list[i][k], v_x)
            cx = jnp.tanh(jnp.einsum("bkr,ksr->bks", vx, C[i].astype(dtype)))
            ux = jnp.einsum("bks,kns->bkn", cx, U[i].astype(dtype))
            dot = ux + bias[i].astype(dtype)[None, :, 0][:, None, :]
            expert_out = x0[:, None, :] * dot             # [B, K, n]
            gate_score = jax.nn.softmax(g, axis=1)        # [B, K]
            moe = jnp.einsum("bkn,bk->bn", expert_out, gate_score)
            xl = moe + xl
        return xl


class InnerProductLayer(nn.Module):
    """All-pairs inner (or element-wise) products (PNN).
    (reference parity: deepctr_torch/layers/interaction.py:537-577)
    """
    reduce_sum: bool = True

    @nn.compact
    def __call__(self, inputs):
        # inputs: [B, F, E]
        rows, cols = _pair_indices(inputs.shape[1])
        p = inputs[:, rows]
        q = inputs[:, cols]
        inner = p * q
        if self.reduce_sum:
            inner = jnp.sum(inner, axis=2, keepdims=True)
        return inner


class OutterProductLayer(nn.Module):
    """All-pairs kernel products with 'mat'/'vec'/'num' kernels (PNN).
    (reference parity: deepctr_torch/layers/interaction.py:580-672)
    """
    field_size: int
    embedding_size: int
    kernel_type: str = "mat"

    @nn.compact
    def __call__(self, inputs):
        rows, cols = _pair_indices(self.field_size)
        num_pairs = len(rows)
        E = self.embedding_size
        p = inputs[:, rows]    # [B, P, E]
        q = inputs[:, cols]
        init = nn.initializers.xavier_uniform()
        dtype = config.compute_dtype()
        if self.kernel_type == "mat":
            kernel = self.param("kernel", init, (E, num_pairs, E))
            kp = jnp.einsum("bpj,ipj,bpi->bp", p.astype(dtype),
                            kernel.astype(dtype), q.astype(dtype))
        elif self.kernel_type == "vec":
            kernel = self.param("kernel", init, (num_pairs, E))
            kp = jnp.sum(p * q * kernel[None].astype(p.dtype), axis=-1)
        elif self.kernel_type == "num":
            kernel = self.param("kernel", init, (num_pairs, 1))
            kp = jnp.sum(p * q * kernel[None].astype(p.dtype), axis=-1)
        else:
            raise ValueError("kernel_type must be mat, vec or num")
        return kp              # [B, P]


class ConvLayer(nn.Module):
    """CCPM conv stack: Conv2dSame -> tanh -> KMaxPooling with the shrinking
    k schedule ``max(1, (1 - (i/l)^(l-i)) * n)`` (3 at the last layer).
    (reference parity: deepctr_torch/layers/interaction.py:675-717)
    """
    field_size: int
    conv_kernel_width: tuple
    conv_filters: tuple

    @staticmethod
    def compute_shapes(field_size, conv_filters):
        """Static field-shape schedule; final value sizes the downstream DNN."""
        n = int(field_size)
        l = len(conv_filters)
        shapes = []
        filed_shape = n
        for i in range(1, l + 1):
            k = max(1, int((1 - pow(i / l, l - i)) * n)) if i < l else 3
            filed_shape = min(k, filed_shape)
            shapes.append(filed_shape)
        return shapes

    @nn.compact
    def __call__(self, inputs):
        # inputs: [B, 1, F, E]
        x = inputs
        l = len(self.conv_filters)
        shapes = self.compute_shapes(self.field_size, self.conv_filters)
        for i in range(1, l + 1):
            in_ch = 1 if i == 1 else self.conv_filters[i - 2]
            out_ch = self.conv_filters[i - 1]
            width = self.conv_kernel_width[i - 1]
            x = Conv2dSame(in_ch, out_ch, (width, 1),
                           name="conv_%d" % i)(x)
            x = jnp.tanh(x)
            x = KMaxPooling(k=shapes[i - 1], axis=2)(x)
        return x


class LogTransformLayer(nn.Module):
    """AFN logarithmic transformation layer: learns arbitrary-order crosses
    as linear combinations in log space.
    (reference parity: deepctr_torch/layers/interaction.py:720-757)
    """
    field_size: int
    embedding_size: int
    ltl_hidden_size: int

    @nn.compact
    def __call__(self, inputs, training=False):
        # [B, F, E] -> [B, E, F]
        w = self.param("ltl_weights", nn.initializers.normal(0.1),
                       (self.field_size, self.ltl_hidden_size))
        b = self.param("ltl_biases", nn.initializers.zeros,
                       (self.ltl_hidden_size,))
        x = jnp.clip(jnp.abs(inputs), 1e-7, None)
        x = jnp.transpose(x, (0, 2, 1))
        x = jnp.log(x)
        x = nn.BatchNorm(use_running_average=not training, momentum=0.9,
                         epsilon=1e-5, axis=1, name="bn_0")(x)
        x = jnp.matmul(x, w.astype(x.dtype)) + b.astype(x.dtype)
        x = jnp.exp(x)
        x = nn.BatchNorm(use_running_average=not training, momentum=0.9,
                         epsilon=1e-5, axis=1, name="bn_1")(x)
        return x.reshape(x.shape[0], -1)


def _stacked_xavier_normal(key, shape, dtype=jnp.float32):
    """Xavier-normal applied per leading slice (matches the reference's
    per-layer nn.init.xavier_normal_ over kernels[i])."""
    fan_in, fan_out = shape[-2], shape[-1]
    std = (2.0 / (fan_in + fan_out)) ** 0.5
    return std * jax.random.normal(key, shape, dtype)
