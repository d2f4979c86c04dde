"""Op-level parity tests against scipy / torch CPU references.

These pin the numerical contracts of the TPU primitives to the library
behaviors the reference pipeline relies on (conv/LSTM/interpolate semantics,
wrap filtering), without importing any reference code.
"""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from horizonnet_tpu.ops import (
    wrap_pad_width,
    bilinear_wrap_sample,
    circular_max_filter_1d,
    find_peaks_np,
    find_peaks_device,
    resize_width_bilinear,
    wrap_resize_width,
    bilstm,
    lstm_params_init,
    torch_lstm_state_to_params,
)


def test_wrap_pad_width():
    x = jnp.arange(12.0).reshape(1, 3, 4)
    y = wrap_pad_width(x, 1)
    assert y.shape == (1, 3, 6)
    np.testing.assert_array_equal(np.array(y[0, 0]), [3, 0, 1, 2, 3, 0])


def test_bilinear_wrap_sample_vs_scipy_gridwrap():
    scipy_nd = pytest.importorskip("scipy.ndimage")
    rng = np.random.default_rng(0)
    img = rng.normal(size=(32, 64)).astype(np.float32)
    ys = rng.uniform(-5, 40, size=(20, 30))
    xs = rng.uniform(-5, 70, size=(20, 30))
    ref = scipy_nd.map_coordinates(img, [ys, xs], order=1, mode='grid-wrap')
    got = np.array(bilinear_wrap_sample(jnp.asarray(img), jnp.asarray(ys), jnp.asarray(xs)))
    np.testing.assert_allclose(got, ref, rtol=1e-5, atol=1e-5)


def test_bilinear_wrap_sample_multichannel():
    rng = np.random.default_rng(1)
    img = rng.normal(size=(16, 16, 3)).astype(np.float32)
    ys = rng.uniform(0, 15, size=(8,))
    xs = rng.uniform(0, 15, size=(8,))
    got = np.array(bilinear_wrap_sample(jnp.asarray(img), jnp.asarray(ys), jnp.asarray(xs)))
    for c in range(3):
        single = np.array(bilinear_wrap_sample(jnp.asarray(img[..., c]),
                                               jnp.asarray(ys), jnp.asarray(xs)))
        np.testing.assert_allclose(got[..., c], single, rtol=1e-6)


def test_circular_max_filter_vs_scipy():
    scipy_nd = pytest.importorskip("scipy.ndimage")
    rng = np.random.default_rng(2)
    sig = rng.normal(size=256).astype(np.float32)
    for size in (5, 26, 29):
        ref = scipy_nd.maximum_filter(sig, size=size, mode='wrap')
        got = np.array(circular_max_filter_1d(jnp.asarray(sig), size))
        np.testing.assert_array_equal(got, ref)


def test_find_peaks_np_matches_reference_semantics():
    scipy_nd = pytest.importorskip("scipy.ndimage")
    rng = np.random.default_rng(3)
    sig = np.zeros(1024, np.float32)
    # Plant peaks
    for loc, v in [(10, 0.9), (300, 0.8), (600, 0.7), (900, 0.6), (50, 0.04)]:
        sig[loc] = v
    sig += rng.uniform(0, 0.01, 1024).astype(np.float32)

    # Reference algorithm, written with scipy directly
    max_v = scipy_nd.maximum_filter(sig, size=26, mode='wrap')
    ref_loc = np.where(max_v == sig)[0]
    ref_loc = ref_loc[sig[ref_loc] > 0.05]
    got_loc, got_val = find_peaks_np(sig, r=26, min_v=0.05)
    np.testing.assert_array_equal(got_loc, ref_loc)

    # Top-N selection
    got4, _ = find_peaks_np(sig, r=26, min_v=0.05, N=4)
    assert set(got4) == {10, 300, 600, 900}
    assert np.all(np.diff(got4) > 0)


def test_find_peaks_device_matches_host():
    rng = np.random.default_rng(4)
    sig = rng.uniform(0, 1, 1024).astype(np.float32) * 0.04
    for loc, v in [(17, 0.95), (400, 0.85), (890, 0.75)]:
        sig[loc] = v
    h_loc, h_val = find_peaks_np(sig, r=26, min_v=0.05)
    d_loc, d_val, valid = jax.jit(
        lambda s: find_peaks_device(s, r=26, min_v=0.05, max_peaks=8))(jnp.asarray(sig))
    d_loc = np.array(d_loc)[np.array(valid)]
    np.testing.assert_array_equal(d_loc, h_loc)


def test_resize_width_matches_torch_interpolate():
    torch = pytest.importorskip("torch")
    rng = np.random.default_rng(5)
    x = rng.normal(size=(2, 8, 4, 34)).astype(np.float32)
    out = torch.nn.functional.interpolate(
        torch.from_numpy(x), size=(4, 260), mode='bilinear', align_corners=False)
    got = np.array(resize_width_bilinear(jnp.asarray(x), 260))
    np.testing.assert_allclose(got, out.numpy(), rtol=1e-4, atol=1e-5)


def test_wrap_resize_width_matches_torch_pattern():
    """Reproduce GlobalHeightConv's pad+resize+trim (model.py:151-156)."""
    torch = pytest.importorskip("torch")
    import torch.nn.functional as F
    rng = np.random.default_rng(6)
    for w, out_w in [(256, 256), (128, 256), (64, 256), (32, 256)]:
        x = rng.normal(size=(2, 4, 3, w)).astype(np.float32)
        t = torch.from_numpy(x)
        factor = out_w // w
        t = torch.cat([t[..., -1:], t, t[..., :1]], 3)
        t = F.interpolate(t, size=(3, out_w + 2 * factor), mode='bilinear',
                          align_corners=False)
        ref = t[..., factor:-factor].numpy()
        got = np.array(wrap_resize_width(jnp.asarray(x), out_w))
        np.testing.assert_allclose(got, ref, rtol=1e-4, atol=1e-5)


@pytest.mark.parametrize("num_layers,bidirectional", [(1, True), (2, True), (2, False)])
def test_bilstm_matches_torch(num_layers, bidirectional):
    torch = pytest.importorskip("torch")
    T, B, I, H = 16, 3, 12, 20
    tl = torch.nn.LSTM(input_size=I, hidden_size=H, num_layers=num_layers,
                       bidirectional=bidirectional, batch_first=False)
    x = torch.randn(T, B, I)
    with torch.no_grad():
        ref, _ = tl(x)
    params = torch_lstm_state_to_params(
        {k: v.detach().numpy() for k, v in tl.state_dict().items()},
        prefix="", num_layers=num_layers, bidirectional=bidirectional)
    got = np.array(bilstm(jnp.asarray(x.numpy()), params, hidden_size=H))
    np.testing.assert_allclose(got, ref.numpy(), rtol=1e-4, atol=1e-5)


def test_bilstm_init_shapes_and_jit():
    key = jax.random.PRNGKey(0)
    params = lstm_params_init(key, input_size=1024, hidden_size=512)
    assert params[0]["w_ih"].shape == (2, 2048, 1024)
    assert params[1]["w_ih"].shape == (2, 2048, 1024)
    x = jnp.zeros((8, 2, 1024))
    y = jax.jit(lambda x: bilstm(x, params, 512))(x)
    assert y.shape == (8, 2, 1024)


def test_pallas_lstm_recurrence_matches_scan():
    """The fused Pallas recurrence (interpret mode on CPU) is bit-exact
    with the lax.scan path at f32, through the public bilstm API."""
    from horizonnet_tpu.ops.lstm import lstm_params_init, bilstm

    params = lstm_params_init(jax.random.PRNGKey(0), 48, 32, num_layers=2)
    x = jax.random.normal(jax.random.PRNGKey(1), (16, 4, 48), jnp.float32)
    y_scan = bilstm(x, params, 32)
    y_pal = bilstm(x, params, 32, impl="pallas_interpret")
    np.testing.assert_allclose(np.asarray(y_scan), np.asarray(y_pal),
                               rtol=0, atol=1e-6)


def test_pallas_train_lstm_forward_and_grads_match_scan():
    """The differentiable fused recurrence (custom VJP, forward + reverse
    Pallas kernels, interpret mode on CPU): forward matches scan bit-for-bit
    at f32 and gradients w.r.t. inputs AND all LSTM params match the scan
    path's autodiff."""
    from horizonnet_tpu.ops.lstm import lstm_params_init, bilstm

    params = lstm_params_init(jax.random.PRNGKey(0), 48, 32, num_layers=2)
    x = jax.random.normal(jax.random.PRNGKey(1), (16, 4, 48), jnp.float32)
    y_scan = bilstm(x, params, 32)
    y_tr = bilstm(x, params, 32, impl="pallas_train_interpret")
    np.testing.assert_allclose(np.asarray(y_scan), np.asarray(y_tr),
                               rtol=0, atol=1e-6)

    # A non-trivially-weighted scalar so every output column contributes
    w = jax.random.normal(jax.random.PRNGKey(2), y_scan.shape)

    def loss(impl):
        def f(x, params):
            return (bilstm(x, params, 32, impl=impl) * w).sum()
        return f

    gx_s, gp_s = jax.grad(loss("scan"), argnums=(0, 1))(x, params)
    gx_t, gp_t = jax.grad(loss("pallas_train_interpret"),
                          argnums=(0, 1))(x, params)
    np.testing.assert_allclose(np.asarray(gx_s), np.asarray(gx_t),
                               rtol=1e-5, atol=1e-5)
    for ls, lt in zip(jax.tree.leaves(gp_s), jax.tree.leaves(gp_t)):
        np.testing.assert_allclose(np.asarray(ls), np.asarray(lt),
                                   rtol=1e-5, atol=1e-5)


@pytest.mark.heavy
def test_pallas_train_lstm_through_model():
    """HorizonNet(lstm_impl=pallas_train_interpret): the train step takes
    the fused differentiable path; eval degrades to the serving kernel;
    both agree with the scan model."""
    from horizonnet_tpu.models import build_model
    from horizonnet_tpu.models.registry import init_model

    m_scan = build_model("resnet18", use_rnn=True)
    m_tr = build_model("resnet18", use_rnn=True,
                       lstm_impl="pallas_train_interpret")
    v = init_model(m_scan, jax.random.PRNGKey(0), (1, 64, 128, 3))
    x = jax.random.uniform(jax.random.PRNGKey(1), (1, 64, 128, 3))
    out_s = m_scan.apply(v, x, train=False)
    out_t = m_tr.apply(v, x, train=False)
    for a, b in zip(out_s, out_t):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=0, atol=1e-5)

    def loss(model):
        def f(params):
            out, _ = model.apply({"params": params,
                                  "batch_stats": v["batch_stats"]},
                                 x, train=True,
                                 rngs={"dropout": jax.random.PRNGKey(2)},
                                 mutable=["batch_stats"])
            return (out[0] ** 2).mean() + (out[1] ** 2).mean()
        return f

    g_s = jax.grad(loss(m_scan))(v["params"])
    g_t = jax.grad(loss(m_tr))(v["params"])
    for ls, lt in zip(jax.tree.leaves(g_s), jax.tree.leaves(g_t)):
        np.testing.assert_allclose(np.asarray(ls), np.asarray(lt),
                                   rtol=2e-4, atol=2e-5)


def test_pallas_lstm_through_model():
    """HorizonNet(lstm_impl=pallas_interpret) forward == scan forward; the
    train path must fall back to scan (the kernel has no VJP)."""
    from horizonnet_tpu.models import build_model
    from horizonnet_tpu.models.registry import init_model

    m_scan = build_model("resnet18", use_rnn=True)
    m_pal = build_model("resnet18", use_rnn=True,
                        lstm_impl="pallas_interpret")
    v = init_model(m_scan, jax.random.PRNGKey(0), (1, 64, 128, 3))
    x = jax.random.uniform(jax.random.PRNGKey(1), (1, 64, 128, 3))
    out_s = m_scan.apply(v, x, train=False)
    out_p = m_pal.apply(v, x, train=False)
    for a, b in zip(out_s, out_p):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=0, atol=1e-5)
    # train=True on the pallas model must be differentiable (scan fallback)
    def loss(params):
        out, _ = m_pal.apply({"params": params,
                              "batch_stats": v["batch_stats"]},
                             x, train=True,
                             rngs={"dropout": jax.random.PRNGKey(2)},
                             mutable=["batch_stats"])
        return (out[0] ** 2).mean()
    g = jax.grad(loss)(v["params"])
    assert all(np.isfinite(np.asarray(l)).all()
               for l in jax.tree.leaves(g))
