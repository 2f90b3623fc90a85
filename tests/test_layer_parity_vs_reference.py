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
