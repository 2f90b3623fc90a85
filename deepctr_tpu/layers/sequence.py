"""Sequence (behavior-history) layers.

Reference parity: deepctr_torch/layers/sequence.py.  The reference's
PackedSequence + python time-step loop (its worst serial bottleneck,
sequence.py:285-320) is replaced by mask-based ``jax.lax.scan`` over a
static ``maxlen`` axis — the idiomatic XLA form: static shapes, no host
sync, rows with length 0 simply never update their carry.
"""

import flax.linen as nn
import jax
import jax.numpy as jnp

from .. import config


def masked_pooling(seq_value_len_list, mode, supports_masking):
    """Masked sum/mean/max pooling over [B, T, E] -> [B, 1, E].

    With ``supports_masking=True`` the second element is a boolean mask
    [B, T]; otherwise it is an explicit length column [B, 1].
    (reference parity: deepctr_torch/layers/sequence.py:9-77)
    """
    if mode not in ("sum", "mean", "max"):
        raise ValueError("parameter mode should in [sum, mean, max]")
    if supports_masking:
        seq, mask = seq_value_len_list          # [B,T,E], [B,T] bool
        mask = mask.astype(seq.dtype)
        length = jnp.sum(mask, axis=-1, keepdims=True)   # [B,1]
        mask = mask[:, :, None]
    else:
        seq, length = seq_value_len_list        # [B,T,E], [B,1]
        T = seq.shape[1]
        pos = jax.lax.broadcasted_iota(jnp.int32, (1, T), 1)
        mask = (pos < length.astype(jnp.int32))[:, :, None].astype(seq.dtype)
    if mode == "max":
        hist = seq - (1.0 - mask) * 1e9
        out = jnp.max(hist, axis=1, keepdims=True)
        # all-padding sequences pool to 0, not -1e9: the reference leaks
        # its mask constant for empty sequences (sequence.py:66-70), which
        # poisons downstream layers (e.g. DIFM's refine weights square it
        # into overflow) — zero matches the sum/mean empty-case semantics
        return jnp.where(length[:, None] > 0, out, 0.0)
    hist = jnp.sum(seq * mask, axis=1, keepdims=False)
    if mode == "mean":
        hist = hist / (length.astype(seq.dtype) + 1e-8)
    return hist[:, None, :]


class SequencePoolingLayer(nn.Module):
    """Module wrapper around :func:`masked_pooling` (API parity with the
    reference layer, deepctr_torch/layers/sequence.py:9-77)."""
    mode: str = "mean"
    supports_masking: bool = False

    @nn.compact
    def __call__(self, seq_value_len_list):
        return masked_pooling(seq_value_len_list, self.mode,
                              self.supports_masking)


class AttentionSequencePoolingLayer(nn.Module):
    """DIN/DIEN attention over history: LocalActivationUnit scores, masked,
    optionally softmax-normalized, then weighted-summed over keys.
    (reference parity: deepctr_torch/layers/sequence.py:80-154)
    """
    att_hidden_units: tuple = (80, 40)
    att_activation: str = "sigmoid"
    weight_normalization: bool = False
    return_score: bool = False
    supports_masking: bool = False

    @nn.compact
    def __call__(self, query, keys, keys_length=None, mask=None,
                 training=False):
        from .core import LocalActivationUnit
        from ..ops import din_attention
        B, T, _ = keys.shape
        if self.supports_masking:
            if mask is None:
                raise ValueError(
                    "When supports_masking=True, input must support masking")
            keys_masks = mask[:, None, :]                       # [B,1,T]
        else:
            pos = jax.lax.broadcasted_iota(jnp.int32, (B, T), 1)
            keys_masks = (pos < keys_length.reshape(-1, 1))[:, None, :]
        scores = LocalActivationUnit(
            hidden_units=self.att_hidden_units,
            activation=self.att_activation,
            name="local_att")(query, keys, training)            # [B,T,1]

        # inference dispatch: the fused Pallas kernel computes the whole
        # readout (MLP scores + mask + softmax + weighted sum) in one
        # pass; the scores computed above are then dead code that XLA
        # eliminates.  Training keeps the jnp composition (autodiff).
        # EXPLICIT opt-in only: the end-to-end A/B on a v5e chip
        # (tools/din_attention_bench.py) measured 0.99x at maxlen 256
        # AND 512 — the per-sample [T,4E] MLP is too small for a
        # one-sample-per-grid-step kernel to beat XLA's batched einsum
        # fusion (negative result recorded in BASELINE.md).
        if (not training and not self.return_score
                and not self.is_initializing()):
            from .. import config
            from ..ops.pallas_attention import (
                din_attention_fused, din_attention_fused_supported)
            if (config.use_pallas_explicit()
                    and din_attention_fused_supported(
                        query, keys, self.att_hidden_units,
                        self.att_activation)):
                p = self.variables["params"]["local_att"]
                layer_params = [
                    (p["dnn"]["dense_%d" % i]["kernel"],
                     p["dnn"]["dense_%d" % i]["bias"])
                    for i in range(len(self.att_hidden_units))]
                layer_params.append(
                    (p["dense"]["kernel"], p["dense"]["bias"]))
                mask2 = keys_masks[:, 0, :]
                return din_attention_fused(
                    query, keys, mask2, layer_params,
                    self.att_activation, self.weight_normalization)

        outputs = jnp.transpose(scores, (0, 2, 1))              # [B,1,T]
        return din_attention(outputs, keys, keys_masks,
                             self.weight_normalization, self.return_score)


class KMaxPooling(nn.Module):
    """Top-k values along an axis, sorted descending.
    (reference parity: deepctr_torch/layers/sequence.py:157-189)
    """
    k: int
    axis: int

    @nn.compact
    def __call__(self, inputs):
        if self.axis < 0 or self.axis >= inputs.ndim:
            raise ValueError("axis must be 0~%d,now is %d"
                             % (inputs.ndim - 1, self.axis))
        if self.k < 1 or self.k > inputs.shape[self.axis]:
            raise ValueError("k must be in 1 ~ %d,now k is %d"
                             % (inputs.shape[self.axis], self.k))
        x = jnp.moveaxis(inputs, self.axis, -1)
        top, _ = jax.lax.top_k(x, self.k)
        return jnp.moveaxis(top, -1, self.axis)


def _gru_params(module, input_size, hidden_size, init_std):
    init = nn.initializers.normal(init_std)
    w_ih = module.param("weight_ih", init, (3 * hidden_size, input_size))
    w_hh = module.param("weight_hh", init, (3 * hidden_size, hidden_size))
    b_ih = module.param("bias_ih", nn.initializers.zeros, (3 * hidden_size,))
    b_hh = module.param("bias_hh", nn.initializers.zeros, (3 * hidden_size,))
    return w_ih, w_hh, b_ih, b_hh


def _gru_gates(x, h, w_ih, w_hh, b_ih, b_hh):
    dtype = x.dtype
    gi = x @ w_ih.T.astype(dtype) + b_ih.astype(dtype)
    gh = h @ w_hh.T.astype(dtype) + b_hh.astype(dtype)
    i_r, i_z, i_n = jnp.split(gi, 3, axis=-1)
    h_r, h_z, h_n = jnp.split(gh, 3, axis=-1)
    return i_r, i_z, i_n, h_r, h_z, h_n


def _scan_unroll():
    """lax.scan unroll factor for the GRU recurrences (DEEPCTR_SCAN_UNROLL).
    Measured a wash at DIEN maxlen 256 (31.9-32.8k ex/s across 1/4/8):
    the long-T cost is not While-iteration overhead."""
    import os
    return int(os.environ.get("DEEPCTR_SCAN_UNROLL", "1"))


def _maybe_remat(step):
    """Rematerialize the scan body (default ON; DEEPCTR_SCAN_REMAT=0
    disables): the backward of a scan otherwise reads every step's
    saved gate intermediates back from HBM; remat recomputes them from
    (h_{t-1}, gi_t) instead — recompute is VPU-cheap, the
    saved-residual traffic is not (micro: MaskedGRU bwd 1.84->1.49ms
    at T=256, tools/gru_scan_micro.py; end-to-end TPU v5e 2026-08-19:
    DIEN +11-15% at every maxlen 50-512, e.g. 512: 20.5k->23.5k
    ex/s/chip).  Numerics are unchanged — recompute is deterministic
    and runs the same bf16 ops the forward ran."""
    import os
    if os.environ.get("DEEPCTR_SCAN_REMAT", "1") == "1":
        return jax.checkpoint(step, prevent_cse=False)
    return step


def _gru_input_gates(inputs, w_ih, b_ih):
    """Hoist the input projection OUT of the scan: the x-side gates of
    every timestep are one [B*T, I] x [I, 3H] matmul — large, batched,
    MXU-shaped — instead of T tiny per-step matmuls that the scan body
    re-dispatches (the cuDNN-style GRU split; XLA cannot hoist it itself
    because x_t is a scan operand).  Returns [T, B, 3H] ready to scan."""
    dtype = inputs.dtype
    gi = inputs @ w_ih.T.astype(dtype) + b_ih.astype(dtype)   # [B, T, 3H]
    return jnp.swapaxes(gi, 0, 1)


def _gru_h_gates(h, w_hh, b_hh):
    gh = h @ w_hh.T.astype(h.dtype) + b_hh.astype(h.dtype)
    return jnp.split(gh, 3, axis=-1)


def _gru_carry_dtype(dtype):
    """Opt-in f32 carry under bf16 compute (DEEPCTR_GRU_F32_CARRY=1):
    the recurrent h rides f32 while the gate matmuls stay on bf16
    operands (full MXU rate).

    DEFAULT OFF — a measured no-win: the CIN's analogous f32-carry fix
    was causally proven (BASELINE round-5), but rerunning the DIEN
    planted-signal bf16 check with the f32 GRU carry left the gap
    UNCHANGED (seed-0: -0.0090 before vs -0.0090 after, 60 epochs) —
    the DIEN bf16 gap, whatever its mechanism, is not the carry — and
    the carry costs 5.6% DIEN-100 training throughput (147.5k vs
    156.2k ex/s/chip, same-session A/B).  Kept as a knob so the
    experiment is one env var away."""
    import os
    if (dtype == jnp.bfloat16
            and os.environ.get("DEEPCTR_GRU_F32_CARRY", "0") == "1"):
        return jnp.float32
    return dtype


def _gru_recurrence(gi, w_hh, b_hh, lengths, att, mode, training=True):
    """Fused-Pallas dispatch for the masked GRU recurrences.

    Returns ``(outputs [B,T,H], final_state [B,H])`` from the fused
    kernel (ops/pallas_gru.py — the whole recurrence in one
    pallas_call) when config.gru_kernel(training, T) is on AND the
    shape gate passes, else ``None`` (caller falls back to the masked
    lax.scan).  Under 'auto' the kernel only dispatches at INFERENCE
    with short history (the measured crossover — see config); the
    training A/B was a recorded negative.  Enforces the
    gru_scan_supported gate here so unsupported shapes (B not a
    multiple of 64, exotic dtypes) silently take the scan.
    """
    T, B, H3 = gi.shape
    kmode = config.gru_kernel(training, T)
    if not kmode:
        return None
    from ..ops.pallas_gru import gru_scan, gru_scan_supported
    H = H3 // 3
    ok, _, _ = gru_scan_supported(B, T, H, gi.dtype)
    if not ok:
        return None
    dtype = gi.dtype
    pos = jax.lax.broadcasted_iota(jnp.int32, (B, T), 1)
    mask = (pos < lengths.astype(jnp.int32).reshape(-1, 1)).astype(dtype)
    att_bt = None if att is None else att.reshape(B, T).astype(dtype)
    outs, h_final = gru_scan(gi, w_hh.T.astype(dtype), b_hh.astype(dtype),
                             mask, att=att_bt, mode=mode,
                             interpret=(kmode == "interpret"))
    return jnp.swapaxes(outs, 0, 1), h_final


class AGRUCell(nn.Module):
    """GRU cell whose update gate is *replaced* by the attention score.
    (reference parity: deepctr_torch/layers/sequence.py:192-235)
    """
    input_size: int
    hidden_size: int
    init_std: float = 1e-3

    @nn.compact
    def __call__(self, x, h, att_score):
        w = _gru_params(self, self.input_size, self.hidden_size, self.init_std)
        i_r, _, i_n, h_r, _, h_n = _gru_gates(x, h, *w)
        reset = jax.nn.sigmoid(i_r + h_r)
        new = jnp.tanh(i_n + reset * h_n)
        a = att_score.reshape(-1, 1).astype(h.dtype)
        return (1.0 - a) * h + a * new


class AUGRUCell(nn.Module):
    """GRU cell with attention-scaled update gate (AUGRU, DIEN).
    (reference parity: deepctr_torch/layers/sequence.py:238-282)
    """
    input_size: int
    hidden_size: int
    init_std: float = 1e-3

    @nn.compact
    def __call__(self, x, h, att_score):
        w = _gru_params(self, self.input_size, self.hidden_size, self.init_std)
        i_r, i_z, i_n, h_r, h_z, h_n = _gru_gates(x, h, *w)
        reset = jax.nn.sigmoid(i_r + h_r)
        update = jax.nn.sigmoid(i_z + h_z)
        new = jnp.tanh(i_n + reset * h_n)
        a = att_score.reshape(-1, 1).astype(h.dtype)
        update = a * update
        return (1.0 - update) * h + update * new


class DynamicGRU(nn.Module):
    """Attention-gated GRU over padded sequences via ``lax.scan``.

    Replaces the reference's python loop over a PackedSequence
    (deepctr_torch/layers/sequence.py:285-320) with a masked scan: carry is
    only updated for steps ``t < length``, so the final carry equals the
    state at each row's true length and padded steps emit zeros.

    Returns ``(outputs [B,T,H] zero-padded, final_state [B,H])``.
    """
    input_size: int
    hidden_size: int
    gru_type: str = "AGRU"
    init_std: float = 1e-3

    @nn.compact
    def __call__(self, inputs, att_scores, lengths, training=True):
        B, T, _ = inputs.shape
        H = self.hidden_size
        w = _gru_params(self, self.input_size, H, self.init_std)
        is_augru = self.gru_type == "AUGRU"
        if self.gru_type not in ("AGRU", "AUGRU"):
            raise NotImplementedError(self.gru_type)
        dtype = inputs.dtype

        gi = _gru_input_gates(inputs, w[0], w[2])
        fused = _gru_recurrence(gi, w[1], w[3], lengths, att_scores,
                                "augru" if is_augru else "agru",
                                training=training)
        if fused is not None:
            return fused

        cdtype = _gru_carry_dtype(dtype)

        def step(h, xs):
            gi_t, a_t, t = xs
            i_r, i_z, i_n = [g.astype(cdtype)
                             for g in jnp.split(gi_t, 3, axis=-1)]
            h_r, h_z, h_n = [g.astype(cdtype) for g in
                             _gru_h_gates(h.astype(dtype), w[1], w[3])]
            reset = jax.nn.sigmoid(i_r + h_r)
            new = jnp.tanh(i_n + reset * h_n)
            a = a_t.reshape(-1, 1).astype(cdtype)
            if is_augru:
                update = a * jax.nn.sigmoid(i_z + h_z)
            else:
                update = a
            h_new = (1.0 - update) * h + update * new
            valid = (t < lengths.astype(jnp.int32)).reshape(-1, 1)
            h_next = jnp.where(valid, h_new, h)
            out_t = jnp.where(valid, h_new,
                              jnp.zeros_like(h_new)).astype(dtype)
            return h_next, out_t

        h0 = jnp.zeros((B, H), cdtype)
        ts = jax.lax.broadcasted_iota(jnp.int32, (T, 1), 0)[:, 0]
        xs = (gi, jnp.swapaxes(att_scores.reshape(B, T), 0, 1), ts)
        h_final, outs = jax.lax.scan(_maybe_remat(step), h0, xs,
                                     unroll=_scan_unroll())
        return jnp.swapaxes(outs, 0, 1), h_final.astype(dtype)


class MaskedGRU(nn.Module):
    """Standard (torch-gate-layout) GRU over padded [B,T,I] sequences with a
    length mask; the TPU replacement for ``nn.GRU(pack_padded_sequence(...))``
    used by DIEN's interest extractor (deepctr_torch/models/dien.py:220-224).

    Returns ``(outputs [B,T,H] zero-padded, final_state [B,H])``.
    """
    input_size: int
    hidden_size: int
    init_std: float = 1e-3

    @nn.compact
    def __call__(self, inputs, lengths, training=True):
        B, T, _ = inputs.shape
        H = self.hidden_size
        w = _gru_params(self, self.input_size, H, self.init_std)
        dtype = inputs.dtype

        gi = _gru_input_gates(inputs, w[0], w[2])
        fused = _gru_recurrence(gi, w[1], w[3], lengths, None, "gru",
                                training=training)
        if fused is not None:
            return fused

        cdtype = _gru_carry_dtype(dtype)

        def step(h, xs):
            gi_t, t = xs
            i_r, i_z, i_n = [g.astype(cdtype)
                             for g in jnp.split(gi_t, 3, axis=-1)]
            h_r, h_z, h_n = [g.astype(cdtype) for g in
                             _gru_h_gates(h.astype(dtype), w[1], w[3])]
            reset = jax.nn.sigmoid(i_r + h_r)
            update = jax.nn.sigmoid(i_z + h_z)
            new = jnp.tanh(i_n + reset * h_n)
            h_new = (1.0 - update) * new + update * h
            valid = (t < lengths.astype(jnp.int32)).reshape(-1, 1)
            h_next = jnp.where(valid, h_new, h)
            out_t = jnp.where(valid, h_new,
                              jnp.zeros_like(h_new)).astype(dtype)
            return h_next, out_t

        h0 = jnp.zeros((B, H), cdtype)
        ts = jax.lax.broadcasted_iota(jnp.int32, (T, 1), 0)[:, 0]
        h_final, outs = jax.lax.scan(_maybe_remat(step), h0, (gi, ts),
                                     unroll=_scan_unroll())
        return jnp.swapaxes(outs, 0, 1), h_final.astype(dtype)
