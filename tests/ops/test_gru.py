"""Golden tests: fused Pallas (AU)GRU scan kernel vs a lax.scan oracle
(interpret mode on CPU) — forward AND gradients, all three modes,
masked/zero-length rows, non-multiple-of-Tc T, plus the module-level
dispatch (MaskedGRU / DynamicGRU with config.set_gru_kernel).
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from deepctr_tpu.ops.pallas_gru import gru_scan, gru_scan_supported


def oracle(gi, whh_t, bhh, mask, att, mode):
    """Reference masked recurrence with the kernel's exact gate math."""
    T, B, H3 = gi.shape
    H = H3 // 3

    def step(h, xs):
        gi_t, m_t, a_t = xs
        gh = h @ whh_t + bhh
        r = jax.nn.sigmoid(gi_t[:, :H] + gh[:, :H])
        z = jax.nn.sigmoid(gi_t[:, H:2 * H] + gh[:, H:2 * H])
        n = jnp.tanh(gi_t[:, 2 * H:] + r * gh[:, 2 * H:])
        if mode == "gru":
            h_new = (1.0 - z) * n + z * h
        else:
            a = a_t[:, None]
            u = a * z if mode == "augru" else a
            h_new = (1.0 - u) * h + u * n
        m = m_t[:, None]
        return h + m * (h_new - h), m * h_new

    a_seq = (jnp.swapaxes(att, 0, 1) if att is not None
             else jnp.zeros((T, B), gi.dtype))
    h0 = jnp.zeros((B, H), gi.dtype)
    hlast, outs = jax.lax.scan(step, h0, (gi, jnp.swapaxes(mask, 0, 1),
                                          a_seq))
    return outs, hlast


def _setup(B=64, T=20, H=8, mode="gru", seed=0, dtype=jnp.float32):
    rng = np.random.default_rng(seed)
    gi = jnp.asarray(rng.normal(size=(T, B, 3 * H)), dtype)
    whh_t = jnp.asarray(rng.normal(size=(H, 3 * H)) * 0.3, dtype)
    bhh = jnp.asarray(rng.normal(size=(3 * H,)) * 0.1, dtype)
    # lengths cover 0 (never updates), T (full), and everything between
    lengths = rng.integers(0, T + 1, B)
    lengths[0], lengths[1] = 0, T
    pos = np.arange(T)[None, :]
    mask = jnp.asarray((pos < lengths[:, None]).astype(np.float32), dtype)
    att = (jnp.asarray(rng.random((B, T)), dtype)
           if mode != "gru" else None)
    return gi, whh_t, bhh, mask, att


@pytest.mark.parametrize("mode", ["gru", "agru", "augru"])
@pytest.mark.parametrize("T", [20, 64])  # 20: pads to Tc internally
def test_forward_matches_oracle(mode, T):
    gi, whh_t, bhh, mask, att = _setup(T=T, mode=mode)
    ok, _, _ = gru_scan_supported(64, T, 8, gi.dtype)
    assert ok
    outs, hlast = gru_scan(gi, whh_t, bhh, mask, att=att, mode=mode,
                           interpret=True)
    ref_outs, ref_hlast = oracle(gi, whh_t, bhh, mask, att, mode)
    np.testing.assert_allclose(np.asarray(outs), np.asarray(ref_outs),
                               rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(np.asarray(hlast), np.asarray(ref_hlast),
                               rtol=1e-5, atol=1e-5)


@pytest.mark.parametrize("mode", ["gru", "agru", "augru"])
def test_gradients_match_oracle(mode):
    gi, whh_t, bhh, mask, att = _setup(T=20, mode=mode, seed=1)
    rng = np.random.default_rng(2)
    w_outs = jnp.asarray(rng.normal(size=(20, 64, 8)), jnp.float32)
    w_last = jnp.asarray(rng.normal(size=(64, 8)), jnp.float32)

    def loss(fn, gi, whh_t, bhh, att):
        outs, hlast = fn(gi, whh_t, bhh, att)
        return jnp.sum(outs * w_outs) + jnp.sum(hlast * w_last)

    kern = lambda gi, w, b, a: gru_scan(gi, w, b, mask, att=a, mode=mode,
                                        interpret=True)
    orac = lambda gi, w, b, a: oracle(gi, w, b, mask, a, mode)
    argnums = (1, 2, 3) if mode == "gru" else (1, 2, 3, 4)
    g_k = jax.grad(loss, argnums=argnums)(kern, gi, whh_t, bhh, att)
    g_o = jax.grad(loss, argnums=argnums)(orac, gi, whh_t, bhh, att)
    names = ["gi", "whh_t", "bhh", "att"]
    for name, a, b in zip(names, g_k, g_o):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=2e-4, atol=2e-5, err_msg=name)


def test_unsupported_shapes_gated():
    # B not a multiple of 64 -> gate says no, gru_scan raises
    ok, _, _ = gru_scan_supported(50, 16, 8, jnp.float32)
    assert not ok
    ok, _, _ = gru_scan_supported(64, 16, 8, jnp.int32)
    assert not ok
    gi, whh_t, bhh, mask, _ = _setup(B=64, T=20)
    with pytest.raises(ValueError):
        gru_scan(gi[:, :50], whh_t, bhh, mask[:50], mode="gru",
                 interpret=True)


@pytest.mark.parametrize("gru_type", ["AGRU", "AUGRU"])
def test_dynamic_gru_dispatch_matches_scan(gru_type):
    """Module-level: DynamicGRU with the kernel (interpret) vs the
    lax.scan path — proves the dispatch wiring (mask construction,
    weight transpose, att plumbing) on the real module."""
    from deepctr_tpu import config
    from deepctr_tpu.layers.sequence import DynamicGRU
    rng = np.random.default_rng(3)
    B, T, H = 64, 12, 8
    x = jnp.asarray(rng.normal(size=(B, T, H)), jnp.float32)
    att = jnp.asarray(rng.random((B, T)), jnp.float32)
    lengths = jnp.asarray(rng.integers(0, T + 1, B), jnp.float32)
    m = DynamicGRU(input_size=H, hidden_size=H, gru_type=gru_type,
                   init_std=0.1)
    params = m.init(jax.random.PRNGKey(0), x, att, lengths)
    try:
        config.set_gru_kernel(False)
        outs_scan, h_scan = m.apply(params, x, att, lengths)
        config.set_gru_kernel("interpret")
        outs_kern, h_kern = m.apply(params, x, att, lengths)
    finally:
        config.set_gru_kernel("auto")
    np.testing.assert_allclose(np.asarray(outs_kern), np.asarray(outs_scan),
                               rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(np.asarray(h_kern), np.asarray(h_scan),
                               rtol=1e-5, atol=1e-5)


def test_masked_gru_dispatch_matches_scan():
    from deepctr_tpu import config
    from deepctr_tpu.layers.sequence import MaskedGRU
    rng = np.random.default_rng(4)
    B, T, H = 64, 12, 8
    x = jnp.asarray(rng.normal(size=(B, T, H)), jnp.float32)
    lengths = jnp.asarray(rng.integers(0, T + 1, B), jnp.float32)
    m = MaskedGRU(input_size=H, hidden_size=H, init_std=0.1)
    params = m.init(jax.random.PRNGKey(0), x, lengths)
    try:
        config.set_gru_kernel(False)
        outs_scan, h_scan = m.apply(params, x, lengths)
        config.set_gru_kernel("interpret")
        outs_kern, h_kern = m.apply(params, x, lengths)
    finally:
        config.set_gru_kernel("auto")
    np.testing.assert_allclose(np.asarray(outs_kern), np.asarray(outs_scan),
                               rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(np.asarray(h_kern), np.asarray(h_scan),
                               rtol=1e-5, atol=1e-5)


def test_masked_gru_dispatch_grads_match_scan():
    """Training-path check through the module: grads wrt params match
    between the kernel VJP and the scan autodiff."""
    from deepctr_tpu import config
    from deepctr_tpu.layers.sequence import MaskedGRU
    rng = np.random.default_rng(5)
    B, T, H = 64, 12, 8
    x = jnp.asarray(rng.normal(size=(B, T, H)), jnp.float32)
    lengths = jnp.asarray(rng.integers(0, T + 1, B), jnp.float32)
    m = MaskedGRU(input_size=H, hidden_size=H, init_std=0.1)
    params = m.init(jax.random.PRNGKey(0), x, lengths)

    def loss(p, xx):
        outs, h = m.apply(p, xx, lengths)
        return jnp.sum(outs ** 2) + jnp.sum(h ** 2)

    try:
        config.set_gru_kernel(False)
        g_scan = jax.grad(loss, argnums=(0, 1))(params, x)
        config.set_gru_kernel("interpret")
        g_kern = jax.grad(loss, argnums=(0, 1))(params, x)
    finally:
        config.set_gru_kernel("auto")
    flat_s, _ = jax.tree_util.tree_flatten(g_scan)
    flat_k, _ = jax.tree_util.tree_flatten(g_kern)
    for a, b in zip(flat_k, flat_s):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=2e-4, atol=2e-5)


def test_gru_kernel_policy():
    """Dispatch policy: training 'auto' is always the scan (recorded
    negative, BASELINE round-4); inference 'auto' is T-gated and
    backend-gated; forced modes apply regardless."""
    from deepctr_tpu import config
    try:
        config.set_gru_kernel("auto")
        assert config.gru_kernel(training=True, T=16) is False
        assert config.gru_kernel(training=False, T=None) is False
        # T above the crossover: scan even at inference
        big = config._GRU_INFER_MAX_T + 1
        assert config.gru_kernel(training=False, T=big) is False
        # CPU backend (tests): inference auto stays off even at short T
        assert config.gru_kernel(training=False, T=16) is False
        config.set_gru_kernel(True)
        # forced-on degrades to the interpreter off TPU (Mosaic would
        # fail opaquely at compile time on the CPU backend)
        want = ("interpret" if jax.default_backend() in ("cpu", "gpu")
                else "compiled")
        assert config.gru_kernel(training=True, T=1024) == want
        config.set_gru_kernel("interpret")
        assert config.gru_kernel(training=True) == "interpret"
    finally:
        config.set_gru_kernel("auto")


def test_masked_gru_inference_arg_matches_training_path():
    """training=False with the kernel forced off must equal the default
    path bit-for-bit (the flag only routes dispatch, never math)."""
    from deepctr_tpu import config
    from deepctr_tpu.layers.sequence import MaskedGRU
    rng = np.random.default_rng(6)
    B, T, H = 64, 12, 8
    x = jnp.asarray(rng.normal(size=(B, T, H)), jnp.float32)
    lengths = jnp.asarray(rng.integers(0, T + 1, B), jnp.float32)
    m = MaskedGRU(input_size=H, hidden_size=H, init_std=0.1)
    params = m.init(jax.random.PRNGKey(0), x, lengths)
    o1, h1 = m.apply(params, x, lengths)
    o2, h2 = m.apply(params, x, lengths, training=False)
    np.testing.assert_array_equal(np.asarray(o1), np.asarray(o2))
    np.testing.assert_array_equal(np.asarray(h1), np.asarray(h2))


def test_dien_fit_through_interpret_kernel():
    """ENGINE-level composition through the fused kernel: a short DIEN
    fit with DEEPCTR_GRU_KERNEL=interpret must produce the same loss
    trajectory as the scan path (same weights, same batches) — pins the
    dispatch inside the real train step (aux loss, attention, masking),
    not just the module call."""
    import os
    from deepctr_tpu.features import (SparseFeat, DenseFeat,
                                      VarLenSparseFeat)
    from deepctr_tpu.models import DIEN
    rng = np.random.default_rng(0)
    N, V, T = 256, 30, 6
    x = {"item": rng.integers(1, V, N),
         "seq_length": rng.integers(1, T + 1, N)}
    mask = np.arange(T)[None, :] < x["seq_length"][:, None]
    x["hist_item"] = np.where(mask, rng.integers(1, V, (N, T)), 0)
    x["neg_hist_item"] = np.where(mask, rng.integers(1, V, (N, T)), 0)
    y = (x["item"] % 2).astype(np.float32)
    cols = [SparseFeat("item", V, 8),
            VarLenSparseFeat(SparseFeat("hist_item", V, 8,
                                        embedding_name="item"), T,
                             length_name="seq_length"),
            VarLenSparseFeat(SparseFeat("neg_hist_item", V, 8,
                                        embedding_name="item"), T,
                             length_name="seq_length")]

    def run(env):
        os.environ["DEEPCTR_GRU_KERNEL"] = env
        try:
            m = DIEN(cols, ["item"], gru_type="AUGRU",
                     use_negsampling=True, dnn_hidden_units=(8,),
                     seed=7)
            m.compile("sgd", "binary_crossentropy", metrics=[])
            h = m.fit(x, y, batch_size=128, epochs=2, verbose=0,
                      shuffle=False)
            return h.history["loss"], m.predict(x, 128)
        finally:
            del os.environ["DEEPCTR_GRU_KERNEL"]

    l_scan, p_scan = run("0")
    l_kern, p_kern = run("interpret")
    np.testing.assert_allclose(l_kern, l_scan, rtol=2e-5, atol=1e-6)
    np.testing.assert_allclose(p_kern, p_scan, rtol=1e-4, atol=1e-5)


def test_gru_kernel_env_validation():
    import os
    from deepctr_tpu import config
    os.environ["DEEPCTR_GRU_KERNEL"] = "bogus"
    try:
        with pytest.raises(ValueError):
            config.gru_kernel()
    finally:
        del os.environ["DEEPCTR_GRU_KERNEL"]
