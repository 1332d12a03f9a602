"""Post-chain tests — golden values from color_processing.hpp / bloom.hpp
formulas, plus differentiability checks (the S4 requirement)."""

import jax
import jax.numpy as jnp
import numpy as np

from raytracer_project_tpu.core import colorspace
from raytracer_project_tpu.ops import post


def _img(vals):
    return jnp.asarray(vals, jnp.float32)


def test_contrast_pivot():
    c = _img([[[0.18, 0.18, 0.18], [0.5, 0.5, 0.5]]])
    out = post.apply_contrast(c, 2.0)
    np.testing.assert_allclose(out[0, 0], 0.18, atol=1e-6)  # pivot fixed
    np.testing.assert_allclose(out[0, 1], (0.5 - 0.18) * 2 + 0.18, atol=1e-6)
    # Negative results clamp to zero.
    out2 = post.apply_contrast(_img([[[0.0, 0.0, 0.0]]]), 3.0)
    assert np.all(np.asarray(out2) >= 0.0)


def test_hsv_roundtrip():
    rng = np.random.default_rng(5)
    c = _img(rng.random((4, 4, 3)))
    rt = post.hsv_to_rgb(post.rgb_to_hsv(c))
    np.testing.assert_allclose(np.asarray(rt), np.asarray(c), atol=1e-5)


def test_hue_shift_rotates_channels():
    red = _img([[[1.0, 0.0, 0.0]]])
    hsv = post.rgb_to_hsv(red)
    shifted = post.hsv_to_rgb(
        jnp.stack([hsv[..., 0] + 120.0, hsv[..., 1], hsv[..., 2]], axis=-1)
    )
    np.testing.assert_allclose(np.asarray(shifted)[0, 0], [0.0, 1.0, 0.0], atol=1e-5)


def test_statistics():
    img = _img(np.full((4, 8, 3), 0.5))
    stats = post.analyze_framebuffer(img)
    assert np.isclose(float(stats.average_luminance), 0.5, rtol=1e-5)
    assert np.isclose(float(stats.max_luminance), 0.5, rtol=1e-5)
    assert int(stats.histogram.sum()) == 32
    # All pixels identical -> single occupied bin.
    assert int((np.asarray(stats.histogram) > 0).sum()) == 1


def test_auto_exposure():
    params = post.make_post_params(target_luminance=0.12)
    cfg_on = post.PostConfig(use_auto_exposure=True)
    cfg_off = post.PostConfig(use_auto_exposure=False)
    stats = post.analyze_framebuffer(_img(np.full((4, 4, 3), 0.24)))
    # on: target / avg = 0.12 / 0.24 = 0.5
    assert np.isclose(float(post.auto_exposure(params, stats, cfg_on)), 0.5,
                      rtol=1e-4)
    # off: raw exposure clamped
    assert np.isclose(float(post.auto_exposure(params, stats, cfg_off)), 0.5)
    # dark image: safe luminance floor 0.02 -> 0.12/0.02 = 6 -> clamp 4.
    dark = post.analyze_framebuffer(_img(np.full((4, 4, 3), 1e-6)))
    assert np.isclose(float(post.auto_exposure(params, dark, cfg_on)), 4.0)


def test_process_data_pass_is_gamma_only():
    img = _img(np.random.default_rng(0).random((3, 5, 3)) * 2.0)
    out = post.process(img, post.make_post_params(), post.PostConfig(),
                       current_pass=post.PASS_Z_DEPTH)
    expected = colorspace.linear_to_gamma(jnp.clip(img, 0.0, 1.0))
    np.testing.assert_allclose(np.asarray(out), np.asarray(expected), atol=1e-6)


def test_vignette_darkens_corners():
    img = _img(np.full((9, 9, 3), 0.5))
    params = post.make_post_params(exposure=1.0, vignette_intensity=1.0)
    out = np.asarray(post.process(img, params, post.PostConfig()))
    assert out[4, 4, 0] > out[0, 0, 0]


def test_debug_channel_isolation():
    img = _img([[[0.2, 0.4, 0.6]]])
    cfg = post.PostConfig(debug_red=True)
    params = post.make_post_params(exposure=1.0, vignette_intensity=0.0)
    out = np.asarray(post.process(img, params, cfg))
    assert out[0, 0, 1] == 0.0 and out[0, 0, 2] == 0.0 and out[0, 0, 0] > 0.0


def test_luminance_false_color():
    cfg = post.PostConfig(debug_luminance=True)
    params = post.make_post_params(exposure=1.0, vignette_intensity=0.0)
    bright = np.asarray(post.process(_img([[[2.0, 2.0, 2.0]]]), params, cfg))
    np.testing.assert_allclose(bright[0, 0], [1.0, 1.0, 1.0])
    dark = np.asarray(post.process(_img([[[0.001, 0.001, 0.001]]]), params, cfg))
    np.testing.assert_allclose(
        dark[0, 0], colorspace.linear_to_gamma(jnp.asarray([0.1, 0.0, 0.2])),
        atol=1e-5,
    )


def test_bloom_spreads_bright_pixel():
    img = np.zeros((9, 9, 3), np.float32)
    img[4, 4] = 10.0
    params = post.make_post_params(bloom_threshold=1.0, bloom_intensity=0.5)
    cfg = post.PostConfig(use_bloom=True, bloom_radius=3)
    overlay = np.asarray(post.bloom_overlay(_img(img), params, cfg))
    assert overlay[4, 4, 0] > 0.0
    assert overlay[4, 6, 0] > 0.0        # spread within radius
    assert overlay[4, 8, 0] == 0.0       # beyond radius
    # Dark pixels contribute nothing.
    assert np.asarray(post.bloom_overlay(_img(np.full((4, 4, 3), 0.5)),
                                         params, cfg)).max() == 0.0


def test_sharpening_preserves_flat_and_borders():
    flat = _img(np.full((6, 6, 3), 0.3))
    out = np.asarray(post.apply_sharpening(flat, 0.3))
    np.testing.assert_allclose(out, 0.3, atol=1e-6)
    img = np.full((6, 6, 3), 0.3, np.float32)
    img[3, 3] = 1.0
    out2 = np.asarray(post.apply_sharpening(_img(img), 0.3))
    assert out2[3, 3, 0] > 1.0           # edge enhanced
    np.testing.assert_allclose(out2[0, :, :], img[0, :, :])  # border untouched


def test_full_pipeline_differentiable():
    """Gradient flows from final pixels to radiance AND grade params."""
    img = _img(np.random.default_rng(1).random((8, 8, 3)) * 2.0)
    params = post.make_post_params()
    cfg = post.PostConfig(use_aces=True, use_bloom=True, bloom_radius=2,
                          use_sharpening=True)

    def loss_wrt_img(x):
        return jnp.sum(post.update_post_processing(x, params, cfg) ** 2)

    g = jax.grad(loss_wrt_img)(img)
    assert np.isfinite(np.asarray(g)).all()
    assert np.abs(np.asarray(g)).max() > 0.0

    def loss_wrt_params(p):
        return jnp.sum(post.update_post_processing(img, p, cfg) ** 2)

    gp = jax.grad(loss_wrt_params)(params)
    assert np.isfinite(float(gp.exposure))
    assert abs(float(gp.exposure)) > 0.0
    assert np.isfinite(np.asarray(gp.color_balance)).all()


def test_soft_histogram_differentiable():
    img = _img(np.random.default_rng(2).random((8, 8, 3)))

    def loss(x):
        h = post.soft_histogram(x, bins=64)
        return jnp.sum(h * jnp.arange(64))

    g = jax.grad(loss)(img)
    assert np.isfinite(np.asarray(g)).all()
    assert np.abs(np.asarray(g)).max() > 0.0