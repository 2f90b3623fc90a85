"""Numeric layer parity vs DeepCTR-Torch: identical weights in, outputs
compared within float tolerance.  Skipped when the reference checkout is
not mounted."""

import os
import sys

import numpy as np
import jax
import jax.numpy as jnp
import pytest

if not os.path.isdir("/root/reference/deepctr_torch"):
    pytest.skip("reference checkout not available", allow_module_level=True)
sys.path.insert(0, "/root/reference")

import torch  # noqa: E402

B, F, E = 8, 5, 4


def _x():
    return np.random.default_rng(0).normal(size=(B, F, E)).astype(
        np.float32)


def test_fm_parity():
    from deepctr_torch.layers import FM as TorchFM
    from deepctr_tpu.ops.reference import fm_cross_ref
    x = _x()
    ref = TorchFM()(torch.from_numpy(x)).detach().numpy()
    got = np.asarray(fm_cross_ref(jnp.asarray(x)))
    np.testing.assert_allclose(got, ref, rtol=1e-5, atol=1e-5)


def test_crossnet_parity():
    from deepctr_torch.layers import CrossNet as TorchCrossNet
    from deepctr_tpu.ops.reference import cross_net_ref
    n = 12
    x = np.random.default_rng(1).normal(size=(B, n)).astype(np.float32)
    for param in ("vector", "matrix"):
        t = TorchCrossNet(in_features=n, layer_num=2,
                          parameterization=param)
        kernels = t.kernels.detach().numpy()
        bias = t.bias.detach().numpy()
        ref = t(torch.from_numpy(x)).detach().numpy()
        got = np.asarray(cross_net_ref(jnp.asarray(x),
                                       jnp.asarray(kernels),
                                       jnp.asarray(bias), param))
        np.testing.assert_allclose(got, ref, rtol=1e-4, atol=1e-5)


def test_cin_parity():
    from deepctr_torch.layers import CIN as TorchCIN
    from deepctr_tpu.layers import CIN
    x = _x()
    t = TorchCIN(field_size=F, layer_size=(6, 4), activation="relu",
                 split_half=True)
    ref = t(torch.from_numpy(x)).detach().numpy()

    ours = CIN(field_size=F, layer_size=(6, 4), activation="relu",
               split_half=True)
    variables = ours.init(jax.random.PRNGKey(0), jnp.asarray(x))
    params = dict(variables["params"])
    for i, conv in enumerate(t.conv1ds):
        w = conv.weight.detach().numpy()[:, :, 0]       # [out, in]
        b = conv.bias.detach().numpy()
        params["conv_w_%d" % i] = jnp.asarray(w)
        params["conv_b_%d" % i] = jnp.asarray(b)
    got = np.asarray(ours.apply({"params": params}, jnp.asarray(x)))
    np.testing.assert_allclose(got, ref, rtol=1e-4, atol=1e-4)


def test_senet_parity():
    from deepctr_torch.layers import SENETLayer as TorchSENET
    from deepctr_tpu.layers import SENETLayer
    x = _x()
    t = TorchSENET(filed_size=F, reduction_ratio=2)
    ref = t(torch.from_numpy(x)).detach().numpy()
    w1, w2 = [m.weight.detach().numpy() for m in t.excitation
              if isinstance(m, torch.nn.Linear)]
    ours = SENETLayer(filed_size=F, reduction_ratio=2)
    variables = ours.init(jax.random.PRNGKey(0), jnp.asarray(x))
    params = {"reduce": {"kernel": jnp.asarray(w1.T)},
              "expand": {"kernel": jnp.asarray(w2.T)}}
    got = np.asarray(ours.apply({"params": params}, jnp.asarray(x)))
    np.testing.assert_allclose(got, ref, rtol=1e-5, atol=1e-5)


def test_interacting_layer_parity():
    from deepctr_torch.layers import InteractingLayer as TorchIL
    from deepctr_tpu.layers import InteractingLayer
    x = _x()
    t = TorchIL(embedding_size=E, head_num=2, use_res=True)
    ref = t(torch.from_numpy(x)).detach().numpy()
    ours = InteractingLayer(embedding_size=E, head_num=2, use_res=True)
    variables = ours.init(jax.random.PRNGKey(0), jnp.asarray(x))
    params = {
        "W_Query": jnp.asarray(t.W_Query.detach().numpy()),
        "W_key": jnp.asarray(t.W_key.detach().numpy()),
        "W_Value": jnp.asarray(t.W_Value.detach().numpy()),
        "W_Res": jnp.asarray(t.W_Res.detach().numpy()),
    }
    got = np.asarray(ours.apply({"params": params}, jnp.asarray(x)))
    np.testing.assert_allclose(got, ref, rtol=1e-4, atol=1e-5)


def test_bilinear_parity():
    from deepctr_torch.layers import BilinearInteraction as TorchBI
    from deepctr_tpu.layers import BilinearInteraction
    x = _x()
    t = TorchBI(filed_size=F, embedding_size=E, bilinear_type="all")
    ref = torch.cat(t(torch.from_numpy(x)) if isinstance(
        t(torch.from_numpy(x)), list) else [t(torch.from_numpy(x))],
        dim=1).detach().numpy()
    w = t.bilinear.weight.detach().numpy()
    ours = BilinearInteraction(filed_size=F, embedding_size=E,
                               bilinear_type="all")
    variables = ours.init(jax.random.PRNGKey(0), jnp.asarray(x))
    got = np.asarray(ours.apply(
        {"params": {"kernel": jnp.asarray(w.T)}}, jnp.asarray(x)))
    np.testing.assert_allclose(got.reshape(ref.shape), ref,
                               rtol=1e-4, atol=1e-5)


def test_dice_parity():
    from deepctr_torch.layers.activation import Dice as TorchDice
    from deepctr_tpu.layers import Dice
    x = np.random.default_rng(3).normal(size=(B, E)).astype(np.float32)
    t = TorchDice(E)
    t.eval()
    ref = t(torch.from_numpy(x)).detach().numpy()
    ours = Dice()
    variables = ours.init(jax.random.PRNGKey(0), jnp.asarray(x),
                          training=False)
    params = {"alpha": jnp.asarray(t.alpha.detach().numpy().reshape(-1))}
    got = np.asarray(ours.apply(
        {"params": params, "batch_stats": variables["batch_stats"]},
        jnp.asarray(x), training=False))
    np.testing.assert_allclose(got, ref, rtol=1e-4, atol=1e-4)


def test_sequence_pooling_parity():
    from deepctr_torch.layers import SequencePoolingLayer as TorchSPL
    from deepctr_tpu.layers.sequence import masked_pooling
    T = 6
    seq = np.random.default_rng(4).normal(size=(B, T, E)).astype(
        np.float32)
    lengths = np.random.default_rng(5).integers(1, T + 1, (B, 1))
    # 'max' omitted: the reference layer itself crashes on torch 2.x
    # (`1 - mask` on a bool tensor, deepctr_torch/layers/sequence.py:66)
    for mode in ("sum", "mean"):
        t = TorchSPL(mode=mode, supports_masking=False)
        ref = t([torch.from_numpy(seq),
                 torch.from_numpy(lengths)]).detach().numpy()
        got = np.asarray(masked_pooling(
            [jnp.asarray(seq), jnp.asarray(lengths.astype(np.float32))],
            mode, supports_masking=False))
        np.testing.assert_allclose(got.reshape(ref.shape), ref,
                                   rtol=1e-4, atol=1e-5)


def test_augru_cell_parity():
    from deepctr_torch.layers.sequence import AUGRUCell as TorchAUGRU
    from deepctr_tpu.layers.sequence import AUGRUCell
    I = H = E
    x = np.random.default_rng(6).normal(size=(B, I)).astype(np.float32)
    h = np.random.default_rng(7).normal(size=(B, H)).astype(np.float32)
    att = np.random.default_rng(8).random((B, 1)).astype(np.float32)
    t = TorchAUGRU(I, H, bias=True)
    for p in t.parameters():
        torch.nn.init.normal_(p, std=0.3)
    ref = t(torch.from_numpy(x), torch.from_numpy(h),
            torch.from_numpy(att)).detach().numpy()
    ours = AUGRUCell(input_size=I, hidden_size=H)
    variables = ours.init(jax.random.PRNGKey(0), jnp.asarray(x),
                          jnp.asarray(h), jnp.asarray(att))
    # note: the reference registers bias_hh under the name 'bias_ih'
    # twice (its own bug, sequence.py:262) — read attributes directly
    params = {
        "weight_ih": jnp.asarray(t.weight_ih.detach().numpy()),
        "weight_hh": jnp.asarray(t.weight_hh.detach().numpy()),
        "bias_ih": jnp.asarray(t.bias_ih.detach().numpy()),
        "bias_hh": jnp.asarray(t.bias_hh.detach().numpy()),
    }
    got = np.asarray(ours.apply({"params": params}, jnp.asarray(x),
                                jnp.asarray(h), jnp.asarray(att)))
    np.testing.assert_allclose(got, ref, rtol=1e-4, atol=1e-5)


def test_attention_sequence_pooling_parity():
    from deepctr_torch.layers import (
        AttentionSequencePoolingLayer as TorchASPL)
    from deepctr_tpu.layers import AttentionSequencePoolingLayer
    T = 6
    q = np.random.default_rng(9).normal(size=(B, 1, E)).astype(np.float32)
    keys = np.random.default_rng(10).normal(size=(B, T, E)).astype(
        np.float32)
    lengths = np.random.default_rng(11).integers(1, T + 1, (B, 1))
    t = TorchASPL(att_hidden_units=(8,), att_activation="sigmoid",
                  weight_normalization=True, embedding_dim=E)
    t.eval()
    ref = t(torch.from_numpy(q), torch.from_numpy(keys),
            torch.from_numpy(lengths)).detach().numpy()
    ours = AttentionSequencePoolingLayer(
        att_hidden_units=(8,), att_activation="sigmoid",
        weight_normalization=True)
    variables = ours.init(jax.random.PRNGKey(0), jnp.asarray(q),
                          jnp.asarray(keys),
                          jnp.asarray(lengths[:, 0].astype(np.int32)))
    lau = t.local_att
    dense0 = lau.dnn.linears[0]
    params = {"local_att": {
        "dnn": {"dense_0": {
            "kernel": jnp.asarray(dense0.weight.detach().numpy().T),
            "bias": jnp.asarray(dense0.bias.detach().numpy())}},
        "dense": {
            "kernel": jnp.asarray(lau.dense.weight.detach().numpy().T),
            "bias": jnp.asarray(lau.dense.bias.detach().numpy())}}}
    got = np.asarray(ours.apply(
        {"params": params}, jnp.asarray(q), jnp.asarray(keys),
        jnp.asarray(lengths[:, 0].astype(np.int32))))
    np.testing.assert_allclose(got, ref, rtol=1e-4, atol=1e-4)


def test_inner_product_parity():
    from deepctr_torch.layers import InnerProductLayer as TorchIPL
    from deepctr_tpu.layers import InnerProductLayer
    x = _x()
    emb_list = [torch.from_numpy(x[:, i:i + 1]) for i in range(F)]
    ref = TorchIPL()(emb_list).detach().numpy()
    ours = InnerProductLayer()
    variables = ours.init(jax.random.PRNGKey(0), jnp.asarray(x))
    got = np.asarray(ours.apply(variables, jnp.asarray(x)))
    np.testing.assert_allclose(got.reshape(ref.shape), ref,
                               rtol=1e-5, atol=1e-5)


def test_logtransform_parity():
    from deepctr_torch.layers import LogTransformLayer as TorchLTL
    from deepctr_tpu.layers import LogTransformLayer
    x = np.abs(_x()) + 0.1
    t = TorchLTL(field_size=F, embedding_size=E, ltl_hidden_size=3)
    t.eval()
    ref = t(torch.from_numpy(x)).detach().numpy()
    ours = LogTransformLayer(field_size=F, embedding_size=E,
                             ltl_hidden_size=3)
    variables = ours.init(jax.random.PRNGKey(0), jnp.asarray(x),
                          training=False)
    params = {
        "ltl_weights": jnp.asarray(t.ltl_weights.detach().numpy().reshape(5, 3)),
        "ltl_biases": jnp.asarray(t.ltl_biases.detach().numpy().reshape(-1)),
    }
    # copy BN affine+stats (both BNs start at identity stats in eval after
    # construction: running_mean 0, var 1, weight 1, bias 0)
    got = np.asarray(ours.apply(
        {"params": {**variables["params"], **params},
         "batch_stats": variables["batch_stats"]},
        jnp.asarray(x), training=False))
    np.testing.assert_allclose(got, ref, rtol=1e-4, atol=1e-4)


def test_kmax_pooling_parity():
    from deepctr_torch.layers import KMaxPooling as TorchKMP
    from deepctr_tpu.layers import KMaxPooling
    x = _x()
    t = TorchKMP(k=3, axis=1, device="cpu")
    ref = t(torch.from_numpy(x)).detach().numpy()
    ours = KMaxPooling(k=3, axis=1)
    variables = ours.init(jax.random.PRNGKey(0), jnp.asarray(x))
    got = np.asarray(ours.apply(variables, jnp.asarray(x)))
    np.testing.assert_allclose(got, ref, rtol=1e-6)


def test_afm_layer_parity():
    from deepctr_torch.layers import AFMLayer as TorchAFM
    from deepctr_tpu.layers import AFMLayer
    x = _x()
    xt = [torch.from_numpy(x[:, i:i + 1, :]) for i in range(F)]
    t = TorchAFM(in_features=E, attention_factor=3, dropout_rate=0)
    ref = t(xt).detach().numpy()
    ours = AFMLayer(in_features=E, attention_factor=3)
    params = {
        "attention_W": jnp.asarray(t.attention_W.detach().numpy()),
        "attention_b": jnp.asarray(t.attention_b.detach().numpy()),
        "projection_h": jnp.asarray(t.projection_h.detach().numpy()),
        "projection_p": jnp.asarray(t.projection_p.detach().numpy()),
    }
    got = np.asarray(ours.apply({"params": params}, jnp.asarray(x)))
    np.testing.assert_allclose(got, ref, rtol=1e-5, atol=1e-5)


def test_crossnetmix_parity():
    from deepctr_torch.layers import CrossNetMix as TorchCNM
    from deepctr_tpu.layers import CrossNetMix
    n, lr, K, L = 12, 5, 3, 2
    x = np.random.default_rng(3).normal(size=(B, n)).astype(np.float32)
    t = TorchCNM(in_features=n, low_rank=lr, num_experts=K, layer_num=L)
    ref = t(torch.from_numpy(x)).detach().numpy()
    ours = CrossNetMix(in_features=n, low_rank=lr, num_experts=K,
                       layer_num=L)
    params = {
        "U_list": jnp.asarray(np.stack(
            [p.detach().numpy() for p in t.U_list])),      # [L, K, n, r]
        "V_list": jnp.asarray(np.stack(
            [p.detach().numpy() for p in t.V_list])),
        "C_list": jnp.asarray(np.stack(
            [p.detach().numpy() for p in t.C_list])),
        "bias": jnp.asarray(np.stack(
            [p.detach().numpy() for p in t.bias])),        # [L, n, 1]
        "gating": jnp.asarray(np.stack(
            [g.weight.detach().numpy().T for g in t.gating])),  # [K, n, 1]
    }
    got = np.asarray(ours.apply({"params": params}, jnp.asarray(x)))
    np.testing.assert_allclose(got, ref, rtol=1e-4, atol=1e-5)


def test_outter_product_parity():
    from deepctr_torch.layers import OutterProductLayer as TorchOPL
    from deepctr_tpu.layers import OutterProductLayer
    x = _x()
    xt = [torch.from_numpy(x[:, i:i + 1, :]) for i in range(F)]
    for ktype in ("mat", "vec", "num"):
        t = TorchOPL(field_size=F, embedding_size=E, kernel_type=ktype)
        ref = t(xt).detach().numpy()
        ours = OutterProductLayer(field_size=F, embedding_size=E,
                                  kernel_type=ktype)
        params = {"kernel": jnp.asarray(t.kernel.detach().numpy())}
        got = np.asarray(ours.apply({"params": params}, jnp.asarray(x)))
        np.testing.assert_allclose(got, ref, rtol=1e-4, atol=1e-5,
                                   err_msg=ktype)


def test_conv2d_same_parity():
    from deepctr_torch.layers.core import Conv2dSame as TorchConv
    from deepctr_tpu.layers import Conv2dSame
    rng = np.random.default_rng(4)
    x = rng.normal(size=(B, 2, 7, 5)).astype(np.float32)  # NCHW
    t = TorchConv(2, 3, kernel_size=(4, 1), stride=(2, 1))
    ref = t(torch.from_numpy(x)).detach().numpy()
    ours = Conv2dSame(in_channels=2, out_channels=3, kernel_size=(4, 1),
                      stride=(2, 1))
    params = {"kernel": jnp.asarray(t.weight.detach().numpy()),
              "bias": jnp.asarray(t.bias.detach().numpy())}
    got = np.asarray(ours.apply({"params": params}, jnp.asarray(x)))
    np.testing.assert_allclose(got, ref, rtol=1e-4, atol=1e-5)


def test_agru_cell_parity():
    from deepctr_torch.layers.sequence import AGRUCell as TorchAGRU
    from deepctr_tpu.layers.sequence import AGRUCell
    I = H = E
    x = np.random.default_rng(9).normal(size=(B, I)).astype(np.float32)
    h = np.random.default_rng(10).normal(size=(B, H)).astype(np.float32)
    att = np.random.default_rng(11).random((B, 1)).astype(np.float32)
    t = TorchAGRU(I, H, bias=True)
    for p in t.parameters():
        torch.nn.init.normal_(p, std=0.3)
    ref = t(torch.from_numpy(x), torch.from_numpy(h),
            torch.from_numpy(att)).detach().numpy()
    ours = AGRUCell(input_size=I, hidden_size=H)
    ours.init(jax.random.PRNGKey(0), jnp.asarray(x), jnp.asarray(h),
              jnp.asarray(att))
    params = {
        "weight_ih": jnp.asarray(t.weight_ih.detach().numpy()),
        "weight_hh": jnp.asarray(t.weight_hh.detach().numpy()),
        "bias_ih": jnp.asarray(t.bias_ih.detach().numpy()),
        "bias_hh": jnp.asarray(t.bias_hh.detach().numpy()),
    }
    got = np.asarray(ours.apply({"params": params}, jnp.asarray(x),
                                jnp.asarray(h), jnp.asarray(att)))
    np.testing.assert_allclose(got, ref, rtol=1e-4, atol=1e-5)


def test_masked_gru_parity_vs_packed_sequence():
    """MaskedGRU (lax.scan + length mask) vs torch nn.GRU over a
    pack_padded_sequence — the exact construct DIEN's interest extractor
    uses (reference dien.py:220-224).  Outputs at valid positions and
    the final state must match; padded positions must be zero."""
    from deepctr_tpu.layers.sequence import MaskedGRU
    I, H, T = 3, 6, 5
    rng = np.random.default_rng(12)
    x = rng.normal(size=(B, T, I)).astype(np.float32)
    lengths = np.array([5, 3, 1, 4, 2, 5, 3, 2][:B])
    x[np.arange(T)[None, :] >= lengths[:, None]] = 0.0

    t = torch.nn.GRU(I, H, batch_first=True)
    for p in t.parameters():
        torch.nn.init.normal_(p, std=0.3)
    packed = torch.nn.utils.rnn.pack_padded_sequence(
        torch.from_numpy(x), torch.from_numpy(lengths),
        batch_first=True, enforce_sorted=False)
    out_packed, h_n = t(packed)
    ref_out, _ = torch.nn.utils.rnn.pad_packed_sequence(
        out_packed, batch_first=True, total_length=T)
    ref_out = ref_out.detach().numpy()
    ref_h = h_n[0].detach().numpy()

    ours = MaskedGRU(input_size=I, hidden_size=H)
    ours.init(jax.random.PRNGKey(0), jnp.asarray(x), jnp.asarray(lengths))
    params = {
        "weight_ih": jnp.asarray(t.weight_ih_l0.detach().numpy()),
        "weight_hh": jnp.asarray(t.weight_hh_l0.detach().numpy()),
        "bias_ih": jnp.asarray(t.bias_ih_l0.detach().numpy()),
        "bias_hh": jnp.asarray(t.bias_hh_l0.detach().numpy()),
    }
    got_out, got_h = ours.apply({"params": params}, jnp.asarray(x),
                                jnp.asarray(lengths))
    np.testing.assert_allclose(np.asarray(got_out), ref_out,
                               rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(got_h), ref_h,
                               rtol=1e-4, atol=1e-5)
    # padded tail is exactly zero (what downstream masked ops rely on)
    pad_mask = np.arange(T)[None, :] >= lengths[:, None]
    assert (np.asarray(got_out)[pad_mask] == 0).all()


@pytest.mark.parametrize("gru_type", ["AGRU", "AUGRU"])
def test_dynamic_gru_parity_vs_packed(gru_type):
    """DynamicGRU (masked scan) vs the reference's python loop over a
    PackedSequence (sequence.py:285-320), per gru_type."""
    from deepctr_torch.layers.sequence import DynamicGRU as TorchDynGRU
    from deepctr_tpu.layers.sequence import DynamicGRU
    I, H, T = 3, 6, 5
    rng = np.random.default_rng(13)
    x = rng.normal(size=(B, T, I)).astype(np.float32)
    att = rng.random((B, T, 1)).astype(np.float32)
    lengths = np.array([5, 3, 1, 4, 2, 5, 3, 2][:B])
    pad = np.arange(T)[None, :] >= lengths[:, None]
    x[pad] = 0.0
    att[pad] = 0.0

    t = TorchDynGRU(I, H, gru_type=gru_type)
    for p in t.parameters():
        torch.nn.init.normal_(p, std=0.3)
    packed_x = torch.nn.utils.rnn.pack_padded_sequence(
        torch.from_numpy(x), torch.from_numpy(lengths),
        batch_first=True, enforce_sorted=False)
    packed_att = torch.nn.utils.rnn.pack_padded_sequence(
        torch.from_numpy(att), torch.from_numpy(lengths),
        batch_first=True, enforce_sorted=False)
    out_packed = t(packed_x, packed_att)
    ref_out, _ = torch.nn.utils.rnn.pad_packed_sequence(
        out_packed, batch_first=True, total_length=T)
    ref_out = ref_out.detach().numpy()

    ours = DynamicGRU(input_size=I, hidden_size=H, gru_type=gru_type)
    ours.init(jax.random.PRNGKey(0), jnp.asarray(x), jnp.asarray(att),
              jnp.asarray(lengths))
    cell = t.rnn
    params = {
        "weight_ih": jnp.asarray(cell.weight_ih.detach().numpy()),
        "weight_hh": jnp.asarray(cell.weight_hh.detach().numpy()),
        "bias_ih": jnp.asarray(cell.bias_ih.detach().numpy()),
        "bias_hh": jnp.asarray(cell.bias_hh.detach().numpy()),
    }
    got_out, _ = ours.apply({"params": params}, jnp.asarray(x),
                            jnp.asarray(att), jnp.asarray(lengths))
    np.testing.assert_allclose(np.asarray(got_out), ref_out,
                               rtol=1e-4, atol=1e-5)
