"""Visualization parity tests: plot_J percentile normalization against a
numpy oracle of the reference formula (sucre.py:84-94), reconstruction
and vignetting renders."""

import numpy as np

from sucre_tpu.models.sucre import init_params
from sucre_tpu.utils.viz import plot_J, render_reconstruction, render_vignetting, save_plots


def _plot_J_oracle(J, valid):
    """Reference formula: per-channel clip to [p1, p99] over valid pixels,
    then min-max normalize; invalid pixels black (sucre.py:84-94)."""
    J = np.asarray(J, np.float64).copy()
    J_valid = J[valid]
    J_valid = np.clip(J_valid, np.percentile(J_valid, 1, axis=0),
                      np.percentile(J_valid, 99, axis=0))
    J_valid = J_valid - np.min(J_valid, axis=0)
    J_valid = J_valid / np.max(J_valid, axis=0)
    J[~valid] = 0.0
    J[valid] = J_valid
    return np.uint8(J * 255)


def test_plot_J_matches_reference_formula(rng):
    J = rng.uniform(-0.2, 1.4, (20, 30, 3))
    valid = rng.uniform(size=(20, 30)) < 0.8
    img = np.asarray(plot_J(J, valid))
    np.testing.assert_array_equal(img, _plot_J_oracle(J, valid))
    assert np.all(img[~valid] == 0)


def test_plot_J_all_invalid():
    img = np.asarray(plot_J(np.ones((4, 5, 3)), np.zeros((4, 5), bool)))
    assert np.all(img == 0)


def test_render_reconstruction_inverts_restore(rng):
    # With true J and params, the reconstruction must reproduce the
    # formation model's rendered image.
    H, W = 12, 16
    intr = np.array([20.0, 20.0, W / 2, H / 2], np.float32)
    depth = rng.uniform(2.0, 4.0, (H, W)).astype(np.float32)
    depth[0, :3] = 0.0
    J = rng.uniform(0, 1, (H, W, 3)).astype(np.float32)
    params = init_params(image=J)._replace(
        B=np.array([0.2, 0.2, 0.2], np.float32),
        beta=np.array([0.1, 0.1, 0.1], np.float32),
        gamma=np.array([0.3, 0.3, 0.3], np.float32),
    )
    rec = render_reconstruction(params, J, intr, depth)
    # manual oracle at one pixel
    v, u = 5, 7
    x = (u + 0.5 - intr[2]) / intr[0] * depth[v, u]
    y = (v + 0.5 - intr[3]) / intr[1] * depth[v, u]
    z = np.sqrt(x * x + y * y + depth[v, u] ** 2)
    expect = J[v, u] * np.exp(-0.1 * z) + 0.2 * (1 - np.exp(-0.3 * z))
    # the render is quantized to 8 bits on device (PNG output precision)
    np.testing.assert_allclose(rec[v, u], np.clip(expect, 0, 1), atol=1.01 / 255)
    assert np.all(rec[0, :3] == 0)  # invalid depth -> black


def test_render_vignetting(rng):
    H, W = 8, 10
    intr = np.array([10.0, 10.0, W / 2, H / 2], np.float32)
    depth = np.full((H, W), 3.0, np.float32)
    params = init_params(light_model=True, use_closed_form=True)
    l_map = render_vignetting(params, intr, depth)
    # identity light pose + identity sigma: l = exp(-|lp|^2/2) in (0, 1]
    assert l_map.shape == (H, W)
    assert np.all(l_map > 0) and np.all(l_map <= 1.0)
    # center pixel brightest
    assert l_map[H // 2, W // 2] == l_map.max()


def test_save_plots_filenames(tmp_path, rng):
    H, W = 6, 8
    J = rng.uniform(0, 1, (H, W, 3)).astype(np.float32)
    depth = np.full((H, W), 2.0, np.float32)
    valid = np.ones((H, W), bool)
    intr = np.array([10.0, 10.0, 4.0, 3.0], np.float32)
    params = init_params(image=J, light_model=True)
    written = save_plots(tmp_path, "photo.png", params, J, valid, intr, depth, iteration=7)
    names = {p.name for p in written}
    assert names == {
        "photo_rgb_0007.png",
        "photo_reconstruction_0007.png",
        "photo_vignetting_0007.png",
    }


def test_plot_matches(rng):
    from sucre_tpu.utils.viz import plot_matches

    rgb1 = rng.uniform(0, 1, (10, 12, 3)).astype(np.float32)
    rgb2 = rng.uniform(0, 1, (8, 14, 3)).astype(np.float32)
    u1 = np.array([1, 5]); v1 = np.array([2, 6])
    u2 = np.array([3, 7]); v2 = np.array([1, 4])
    img = plot_matches(rgb1, rgb2, u1, v1, u2, v2, step=1)
    assert img.size == (12 + 14, 10)


def test_host_reconstruction_matches_device(rng):
    """The exporter-thread host render equals the device render (up to
    rare exp-ULP floor flips of 1 LSB)."""
    import jax
    import jax.numpy as jnp

    from sucre_tpu.models.sucre import SucreParams
    from sucre_tpu.utils.viz import (
        render_reconstruction_batch_device,
        render_reconstruction_host,
    )

    H, W = 20, 31
    depth = (rng.uniform(1.0, 4.0, (H, W)) * (rng.uniform(size=(H, W)) < 0.9)).astype(
        np.float32
    )
    J = rng.uniform(0, 1.2, (H, W, 3)).astype(np.float32)
    intr = np.array([25.0, 26.0, W / 2, H / 2], np.float32)
    params = SucreParams(
        B=jnp.asarray([0.12, 0.1, 0.08], jnp.float32),
        beta=jnp.asarray([0.2, 0.15, 0.1], jnp.float32),
        gamma=jnp.asarray([0.3, 0.25, 0.2], jnp.float32),
        J=None,
    )
    dev = np.asarray(
        render_reconstruction_batch_device(
            jax.tree.map(lambda x: x[None], params),
            jnp.asarray(J)[None], jnp.asarray(intr)[None],
            jnp.asarray(depth)[None],
        )[0]
    )
    host = render_reconstruction_host(params, J, intr, depth)
    assert host.dtype == np.uint8 and host.shape == dev.shape
    diff = np.abs(host.astype(int) - dev.astype(int))
    assert diff.max() <= 1
    assert (diff > 0).mean() < 0.01
