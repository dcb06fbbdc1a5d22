"""Sliding-window inference tests."""

import jax.numpy as jnp
import numpy as np

from tfpose_tpu.pipeline import multiscale as ms


def test_window_coverage():
    grid = ms.generate_windows(104, 200, 48, 48, overlap=0.2)
    cover = np.zeros((104, 200), bool)
    for y0, x0 in grid.origins:
        cover[y0:y0 + 48, x0:x0 + 48] = True
    assert cover.all()
    # origins snap to the network stride
    assert (grid.origins % 8 == 0).all()


def test_non_stride_image_padded():
    def apply_fn(wins):
        n, h, w, c = wins.shape
        return wins.reshape(n, h // 8, 8, w // 8, 8, c).mean((2, 4))

    img = jnp.ones((100, 99, 3))
    out = ms.windowed_forward(apply_fn, img, 64, 64)
    assert out.shape == (13, 13, 3)  # padded to 104x104 -> /8


def test_single_window_when_smaller():
    grid = ms.generate_windows(40, 40, 48, 64)
    assert grid.origins.shape[0] == 1


def test_merge_weights_sum_to_one():
    grid = ms.generate_windows(64, 96, 32, 32)
    key = (tuple(map(tuple, grid.origins.tolist())), 32, 32, 64, 96)
    w = ms._merge_weights(key)
    np.testing.assert_allclose(w.sum(axis=0), 1.0, atol=1e-5)


def test_merge_constant_field_is_identity():
    """Merging windows of a constant map must reproduce the constant."""
    grid = ms.generate_windows(64, 96, 32, 32)
    n = grid.origins.shape[0]
    maps = jnp.ones((n, 32, 32, 5)) * 3.0
    merged = ms.merge_maps(maps, grid, out_scale=1.0)
    np.testing.assert_allclose(np.asarray(merged), 3.0, atol=1e-4)


def test_windowed_forward_identity_net():
    """With an 'identity' network (stride-8 average pool), windowed
    inference of a smooth field approximates direct downsampling."""
    import jax

    rng = np.random.default_rng(0)
    # smooth field via broadcast of a coarse grid
    coarse = rng.normal(size=(8, 12, 3)).astype(np.float32)
    img = np.kron(coarse, np.ones((16, 16, 1))).astype(np.float32)

    def apply_fn(wins):
        n, h, w, c = wins.shape
        pooled = wins.reshape(n, h // 8, 8, w // 8, 8, c).mean((2, 4))
        return pooled

    out = ms.windowed_forward(apply_fn, jnp.asarray(img), 64, 64)
    direct = apply_fn(jnp.asarray(img)[None])[0]
    np.testing.assert_allclose(np.asarray(out), np.asarray(direct),
                               atol=1e-3)


def test_multiscale_forward_scale_one_equals_windowed():
    """scales=(1.0,) must reduce exactly to windowed_forward."""
    rng = np.random.default_rng(1)
    img = rng.normal(size=(96, 128, 3)).astype(np.float32)

    def apply_fn(wins):
        n, h, w, c = wins.shape
        return wins.reshape(n, h // 8, 8, w // 8, 8, c).mean((2, 4))

    a = ms.multiscale_forward(apply_fn, jnp.asarray(img), 64, 64,
                              scales=(1.0,))
    b = ms.windowed_forward(apply_fn, jnp.asarray(img), 64, 64)
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-6)


def test_multiscale_golden_double_resolution():
    """Golden scale-search check (reference _get_scaled_img float
    scales): a 2x-upsampled image evaluated at scale 0.5 must produce
    (nearly) the same stride-8 map as the native-resolution run."""
    from tfpose_tpu.ops.resize import resize_bilinear

    rng = np.random.default_rng(2)
    coarse = rng.normal(size=(6, 8, 3)).astype(np.float32)
    img = np.kron(coarse, np.ones((16, 16, 1))).astype(np.float32)

    def apply_fn(wins):
        n, h, w, c = wins.shape
        return wins.reshape(n, h // 8, 8, w // 8, 8, c).mean((2, 4))

    native = ms.multiscale_forward(apply_fn, jnp.asarray(img), 64, 64,
                                   scales=(1.0,))
    img2 = resize_bilinear(jnp.asarray(img), img.shape[0] * 2,
                           img.shape[1] * 2)
    halved = ms.multiscale_forward(apply_fn, img2, 64, 64,
                                   scales=(0.5,))
    # the 2x image's native grid is 2x finer; its scale-0.5 pass is
    # computed on the original grid and area-upsampled (exact repeat),
    # so area-downsampling recovers the original-grid map
    from tfpose_tpu.ops.resize import resize_area
    halved = resize_area(halved, native.shape[0], native.shape[1])
    assert halved.shape == native.shape
    # resampling (bilinear up + area down) adds bounded blur; require
    # tight absolute agreement AND near-perfect structural correlation
    na = np.asarray(native)[1:-1, 1:-1]
    ha = np.asarray(halved)[1:-1, 1:-1]
    np.testing.assert_allclose(ha, na, atol=0.15)
    corr = np.corrcoef(ha.ravel(), na.ravel())[0, 1]
    assert corr > 0.995, corr


def test_multiscale_average_of_scales():
    """Averaging across scales keeps a constant field constant."""
    def apply_fn(wins):
        n, h, w, c = wins.shape
        pooled = wins.reshape(n, h // 8, 8, w // 8, 8, c).mean((2, 4))
        return pooled

    img = jnp.ones((96, 96, 3)) * 2.0
    out = ms.multiscale_forward(apply_fn, img, 64, 64,
                                scales=(1.0, 1.5, 0.75))
    np.testing.assert_allclose(np.asarray(out), 2.0, atol=1e-3)
