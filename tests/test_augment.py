"""Augmentation tests vs NumPy oracles (SURVEY.md §7.6 parity tests).

The oracle implements the cv2/MXNet bilinear convention
(s_i = start + (i+0.5)*size/out - 0.5, clamped) that
mxnet src/io/image_aug_default.cc uses via cv::resize(INTER_LINEAR).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from resnet_tpu.config import DataConfig
from resnet_tpu.ops import augment


def oracle_crop_resize(img, y0, x0, ch, cw, oh, ow, flip=False):
    """NumPy bilinear crop-resize, cv2 coordinate convention."""
    sh, sw, c = img.shape
    out = np.zeros((oh, ow, c), np.float32)
    for i in range(oh):
        sy = np.clip(y0 + (i + 0.5) * ch / oh - 0.5, 0, sh - 1)
        yy0 = int(np.floor(sy))
        yy1 = min(yy0 + 1, sh - 1)
        wy = sy - yy0
        for j in range(ow):
            jj = ow - 1 - j if flip else j
            sx = np.clip(x0 + (jj + 0.5) * cw / ow - 0.5, 0, sw - 1)
            xx0 = int(np.floor(sx))
            xx1 = min(xx0 + 1, sw - 1)
            wx = sx - xx0
            v0 = img[yy0, xx0] * (1 - wx) + img[yy0, xx1] * wx
            v1 = img[yy1, xx0] * (1 - wx) + img[yy1, xx1] * wx
            out[i, j] = v0 * (1 - wy) + v1 * wy
    return out


class TestCropResize:
    def test_matches_oracle(self):
        rng = np.random.default_rng(0)
        imgs = rng.integers(0, 256, (3, 24, 20, 3), np.uint8)
        y0 = np.array([1.5, 0.0, 3.2], np.float32)
        x0 = np.array([2.0, 0.5, 0.0], np.float32)
        ch = np.array([16.0, 24.0, 10.7], np.float32)
        cw = np.array([12.0, 20.0, 15.0], np.float32)
        got = augment.crop_resize_bilinear(
            jnp.asarray(imgs), (jnp.asarray(y0), jnp.asarray(x0),
                                jnp.asarray(ch), jnp.asarray(cw)),
            (8, 8))
        for k in range(3):
            want = oracle_crop_resize(
                imgs[k].astype(np.float32), y0[k], x0[k], ch[k], cw[k], 8, 8)
            np.testing.assert_allclose(np.asarray(got[k]), want,
                                       atol=1e-3, rtol=1e-5)

    def test_flip_folded_into_weights(self):
        rng = np.random.default_rng(1)
        imgs = rng.integers(0, 256, (2, 16, 16, 3), np.uint8)
        boxes = (jnp.zeros(2), jnp.zeros(2),
                 jnp.full((2,), 16.0), jnp.full((2,), 16.0))
        flip = jnp.asarray([True, False])
        got = augment.crop_resize_bilinear(jnp.asarray(imgs), boxes,
                                           (16, 16), flip=flip)
        noflip = augment.crop_resize_bilinear(jnp.asarray(imgs), boxes,
                                              (16, 16))
        np.testing.assert_allclose(np.asarray(got[0]),
                                   np.asarray(noflip[0])[:, ::-1], atol=1e-3)
        np.testing.assert_allclose(np.asarray(got[1]),
                                   np.asarray(noflip[1]), atol=1e-3)

    def test_identity(self):
        rng = np.random.default_rng(2)
        imgs = rng.integers(0, 256, (1, 12, 12, 3), np.uint8)
        boxes = (jnp.zeros(1), jnp.zeros(1),
                 jnp.full((1,), 12.0), jnp.full((1,), 12.0))
        got = augment.crop_resize_bilinear(jnp.asarray(imgs), boxes, (12, 12))
        np.testing.assert_allclose(np.asarray(got[0]),
                                   imgs[0].astype(np.float32), atol=1e-3)


def oracle_rrc_boxes(u_area, u_ratio, u_y, u_x, src_h, src_w,
                     min_area, max_area, lo, hi):
    """Independent NumPy oracle of MXNet's random_resized_crop sampling
    (mxnet src/io/image_aug_default.cc): per attempt area ~ U * H*W,
    ratio ~ U[lo, hi], ROUNDED integer crop dims, first fitting attempt
    wins, INTEGER uniform origins; fallback center short-side square."""
    n, attempts = u_area.shape
    y0 = np.empty(n)
    x0 = np.empty(n)
    ch = np.empty(n)
    cw = np.empty(n)
    for i in range(n):
        H, W = float(src_h[i]), float(src_w[i])
        for t in range(attempts):
            area = (min_area + u_area[i, t] * (max_area - min_area)) * H * W
            ratio = lo + u_ratio[i, t] * (hi - lo)
            w = np.round(np.sqrt(area * ratio))
            h = np.round(np.sqrt(area / ratio))
            if 1 <= w <= W and 1 <= h <= H:
                ch[i], cw[i] = h, w
                y0[i] = min(np.floor(u_y[i, t] * (H - h + 1)), H - h)
                x0[i] = min(np.floor(u_x[i, t] * (W - w + 1)), W - w)
                break
        else:
            c = min(H, W)
            ch[i] = cw[i] = c
            y0[i] = np.floor((H - c) / 2)
            x0[i] = np.floor((W - c) / 2)
    return y0, x0, ch, cw


class TestCropSampling:
    def test_matches_mxnet_oracle(self):
        """boxes_from_uniforms == the independent NumPy encoding of the
        MXNet sampling rules, given identical uniform draws."""
        rng = np.random.default_rng(0)
        n, attempts = 256, 10
        u = [rng.random((n, attempts)).astype(np.float32) for _ in range(4)]
        # varied per-image dims, including extreme aspect ratios that
        # force fallback
        src_h = rng.integers(40, 600, n).astype(np.float32)
        src_w = rng.integers(40, 600, n).astype(np.float32)
        lo, hi = augment.aspect_range(0.25)
        assert (lo, hi) == (0.75, 1.25)
        got = augment.boxes_from_uniforms(
            *(jnp.asarray(x) for x in u),
            jnp.asarray(src_h), jnp.asarray(src_w), 0.08, 1.0, lo, hi)
        want = oracle_rrc_boxes(*u, src_h, src_w, 0.08, 1.0, lo, hi)
        for g, w in zip(got, want):
            np.testing.assert_allclose(np.asarray(g), w, atol=1e-3)

    def test_bounds_and_integrality(self):
        src_h = jnp.full((512,), 300.0)
        src_w = jnp.full((512,), 400.0)
        y0, x0, ch, cw = augment.sample_crop_boxes(
            jax.random.key(0), src_h, src_w, 0.08, 1.0, 0.25)
        y0, x0, ch, cw = map(np.asarray, (y0, x0, ch, cw))
        # integer dims and origins (MXNet crops whole pixels)
        for v in (y0, x0, ch, cw):
            np.testing.assert_array_equal(v, np.round(v))
        area = ch * cw / (300.0 * 400.0)
        assert area.min() >= 0.06 and area.max() <= 1.01
        aspect = cw / ch
        assert aspect.min() >= 0.7 and aspect.max() <= 1.3
        assert (y0 >= 0).all() and (y0 + ch <= 300).all()
        assert (x0 >= 0).all() and (x0 + cw <= 400).all()
        # full-image domain: crops reach both borders of the long axis
        assert x0.min() < 40 and (x0 + cw).max() > 360

    def test_degenerate_full_crop(self):
        """min_area=max_area=1, aspect jitter 0 -> the full square."""
        s = jnp.full((16,), 32.0)
        y0, x0, ch, cw = augment.sample_crop_boxes(
            jax.random.key(1), s, s, 1.0, 1.0, 0.0)
        np.testing.assert_allclose(np.asarray(ch), 32.0, atol=1e-4)
        np.testing.assert_allclose(np.asarray(cw), 32.0, atol=1e-4)

    def test_scale_crop_semantics(self):
        """Classic path: scale=1, no aspect -> short-side square crop at a
        random integer position (resize-short-to-224 + rand-crop 224)."""
        src_h = jnp.full((64,), 300.0)
        src_w = jnp.full((64,), 400.0)
        y0, x0, ch, cw = augment.sample_scale_crop_boxes(
            jax.random.key(2), src_h, src_w, 1.0, 1.0, 0.0)
        np.testing.assert_allclose(np.asarray(ch), 300.0)
        np.testing.assert_allclose(np.asarray(cw), 300.0)
        x0 = np.asarray(x0)
        np.testing.assert_array_equal(x0, np.round(x0))
        assert x0.min() >= 0 and (x0 + 300).max() <= 400
        assert len(np.unique(x0)) > 10  # actually random

    def test_aspect_range_conventions(self):
        assert augment.aspect_range(0.25) == (0.75, 1.25)
        assert augment.aspect_range(0.0) == (1.0, 1.0)
        lo, hi = augment.aspect_range(4.0 / 3.0)   # legacy multiplicative
        np.testing.assert_allclose((lo, hi), (0.75, 4.0 / 3.0))
        assert augment.aspect_range(2.0, 0.5) == (0.5, 2.0)
        with pytest.raises(ValueError):
            augment.aspect_range(-0.1)
        with pytest.raises(ValueError):
            augment.aspect_range(0.5, 0.8)

    def test_letterbox_dims_mapping(self):
        """Boxes sampled in original space map onto the letterboxed canvas
        by the per-image eff/orig scale (never exceeding the content)."""
        cfg = DataConfig()
        # image 400x600 letterboxed into 256: eff = (171, 256)
        dims = jnp.asarray([[400, 600, 171, 256]] * 32, jnp.int32)
        y0, x0, ch, cw = augment.sample_boxes_canvas(
            jax.random.key(3), cfg, 32, 256, 256, (224, 224), dims)
        y0, x0, ch, cw = map(np.asarray, (y0, x0, ch, cw))
        assert (y0 >= 0).all() and (y0 + ch <= 171 + 1e-3).all()
        assert (x0 >= 0).all() and (x0 + cw <= 256 + 1e-3).all()
        # crops use the FULL content width, not a center square
        assert (x0 + cw).max() > 200 and x0.min() < 30


class TestHSL:
    def test_zero_jitter_identity(self):
        rng = np.random.default_rng(3)
        imgs = rng.integers(0, 256, (2, 8, 8, 3)).astype(np.float32)
        out = augment._rgb_to_hsl_adjust(
            jnp.asarray(imgs), jax.random.key(0), 0.0, 0.0, 0.0)
        np.testing.assert_allclose(np.asarray(out), imgs, atol=0.51)

    def test_range_preserved(self):
        rng = np.random.default_rng(4)
        imgs = rng.integers(0, 256, (2, 8, 8, 3)).astype(np.float32)
        out = np.asarray(augment._rgb_to_hsl_adjust(
            jnp.asarray(imgs), jax.random.key(1), 36.0, 50.0, 50.0))
        assert out.min() >= 0.0 and out.max() <= 255.0
        assert not np.allclose(out, imgs)  # jitter actually does something


class TestRotation:
    def test_matches_scipy(self):
        import scipy.ndimage as ndi
        rng = np.random.default_rng(5)
        img = rng.integers(0, 256, (1, 16, 16, 3)).astype(np.float32)
        # reach into the implementation's own angle draw for the oracle
        # (rotate_images splits rng into (angle, shear) keys)
        key = jax.random.key(11)
        r_a, _ = jax.random.split(key)
        angle = float(jax.random.uniform(r_a, (1,), minval=-30.0,
                                         maxval=30.0)[0])
        got = np.asarray(augment.rotate_images(jnp.asarray(img), key, 30.0))
        # scipy rotates counterclockwise w/ the same center convention;
        # our sampling matrix maps output->source with +angle, which is a
        # clockwise image rotation == scipy rotate by -angle
        want = np.stack([
            ndi.rotate(img[0, ..., c], -angle, reshape=False, order=1,
                       mode="constant") for c in range(3)], axis=-1)
        # interiors match; borders differ by interpolation policy
        np.testing.assert_allclose(got[0, 4:12, 4:12], want[4:12, 4:12],
                                   atol=2.0)

    def test_zero_angle_identity(self):
        rng = np.random.default_rng(6)
        img = rng.integers(0, 256, (2, 8, 8, 3)).astype(np.float32)
        got = augment.rotate_images(jnp.asarray(img), jax.random.key(0),
                                    0.0)
        np.testing.assert_allclose(np.asarray(got), img, atol=1e-3)

    def test_shear_matches_affine_oracle(self):
        """Shear-only warp vs scipy affine_transform with the same inverse
        map: src_x = cx + (x - cx) - s*(y - cy), src_y = y (ref:
        max_shear_ratio; horizontal shear about the center)."""
        import scipy.ndimage as ndi
        rng = np.random.default_rng(7)
        img = rng.integers(0, 256, (1, 16, 16, 3)).astype(np.float32)
        key = jax.random.key(3)
        _, r_s = jax.random.split(key)
        s = float(jax.random.uniform(r_s, (1,), minval=-0.3,
                                     maxval=0.3)[0])
        got = np.asarray(augment.rotate_images(jnp.asarray(img), key, 0.0,
                                               max_shear_ratio=0.3))
        cy = cx = (16 - 1) / 2.0
        # affine_transform: src = M @ dst + offset, coords (y, x)
        # src_x = cx + (x - cx) - s*(y - cy) = x - s*y + s*cy
        m = np.array([[1.0, 0.0], [-s, 1.0]])
        offset = np.array([0.0, s * cy])
        want = np.stack([
            ndi.affine_transform(img[0, ..., c], m, offset=offset,
                                 order=1, mode="constant")
            for c in range(3)], axis=-1)
        np.testing.assert_allclose(got[0, 4:12, 4:12], want[4:12, 4:12],
                                   atol=2.0)

    def test_shear_zero_identity(self):
        img = np.random.default_rng(8).integers(
            0, 256, (2, 8, 8, 3)).astype(np.float32)
        got = augment.rotate_images(jnp.asarray(img), jax.random.key(1),
                                    0.0, max_shear_ratio=0.0)
        np.testing.assert_allclose(np.asarray(got), img, atol=1e-3)


class TestPipelines:
    def test_cifar_augment_shapes_and_range(self):
        cfg = DataConfig(mean_rgb=(125.3, 123.0, 113.9),
                         std_rgb=(63.0, 62.1, 66.7))
        imgs = np.random.default_rng(0).integers(
            0, 256, (4, 32, 32, 3), np.uint8)
        out = augment.augment_cifar(jnp.asarray(imgs), jax.random.key(0),
                                    cfg, jnp.float32)
        assert out.shape == (4, 32, 32, 3) and out.dtype == jnp.float32
        assert np.abs(np.asarray(out)).max() < 5.0  # normalized range

    def test_imagenet_augment(self):
        cfg = DataConfig(random_h=36, random_s=50, random_l=50)
        imgs = np.random.default_rng(0).integers(
            0, 256, (2, 64, 64, 3), np.uint8)
        out = augment.augment_imagenet(jnp.asarray(imgs), jax.random.key(0),
                                       cfg, (56, 56), jnp.bfloat16)
        assert out.shape == (2, 56, 56, 3) and out.dtype == jnp.bfloat16

    def test_eval_center_crop(self):
        cfg = DataConfig(mean_rgb=(0, 0, 0), std_rgb=(1, 1, 1))
        imgs = np.arange(8 * 8 * 3, dtype=np.uint8).reshape(1, 8, 8, 3)
        out = augment.eval_center_crop(jnp.asarray(imgs), cfg, (4, 4))
        np.testing.assert_allclose(
            np.asarray(out[0]), imgs[0, 2:6, 2:6].astype(np.float32))

    def test_rand_crop_false_is_center_crop(self):
        """rand_crop=False, no scale jitter: MXNet resizes the short side
        to data_shape and center-crops — i.e. the short-side square box,
        resized. For a square source that is the WHOLE image."""
        cfg = DataConfig(rand_crop=False, rand_mirror=False,
                         random_h=0, random_s=0, random_l=0,
                         mean_rgb=(0, 0, 0), std_rgb=(1, 1, 1))
        imgs = np.arange(2 * 8 * 8 * 3, dtype=np.uint8).reshape(2, 8, 8, 3)
        out = augment.augment_imagenet(jnp.asarray(imgs), jax.random.key(0),
                                       cfg, (4, 4))
        want = oracle_crop_resize(imgs[0].astype(np.float32),
                                  0.0, 0.0, 8.0, 8.0, 4, 4)
        np.testing.assert_allclose(np.asarray(out[0]), want, atol=1e-2)
        # non-square source: center short-side square
        dims = jnp.asarray([[8, 16, 8, 16], [8, 16, 8, 16]], jnp.int32)
        wide = np.arange(2 * 8 * 16 * 3, dtype=np.uint8).reshape(2, 8, 16, 3)
        out = augment.augment_imagenet(jnp.asarray(wide), jax.random.key(0),
                                       cfg, (4, 4), dims=dims)
        want = oracle_crop_resize(wide[0].astype(np.float32),
                                  0.0, 4.0, 8.0, 8.0, 4, 4)
        np.testing.assert_allclose(np.asarray(out[0]), want, atol=1e-2)

    def test_rotation_in_pipeline(self):
        cfg = DataConfig(max_rotate_angle=15.0)
        imgs = np.random.default_rng(1).integers(
            0, 256, (2, 48, 48, 3), np.uint8)
        out = augment.augment_imagenet(jnp.asarray(imgs), jax.random.key(2),
                                       cfg, (32, 32))
        assert out.shape == (2, 32, 32, 3)

    def test_determinism(self):
        cfg = DataConfig()
        imgs = np.random.default_rng(0).integers(
            0, 256, (2, 48, 48, 3), np.uint8)
        a = augment.augment_imagenet(jnp.asarray(imgs), jax.random.key(5),
                                     cfg, (32, 32))
        b = augment.augment_imagenet(jnp.asarray(imgs), jax.random.key(5),
                                     cfg, (32, 32))
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


class TestLetterboxEdgeClamp:
    """Edge-touching crops on a letterboxed canvas must clamp sampling to
    the image's effective extent, not bilinearly blend the zero padding
    into the border (reference parity: MXNet samples the original image,
    which has no padding)."""

    def _canvas(self):
        # all-white 100x80 image letterboxed onto a 64x64 canvas:
        # eff = (64, 51); columns 51..63 are zero padding
        canvas = np.zeros((1, 64, 64, 3), np.uint8)
        canvas[:, :64, :51] = 255
        dims = np.array([[100, 80, 64, 51]], np.int32)
        return jnp.asarray(canvas), jnp.asarray(dims)

    def _boxes(self):
        # crop = the full effective region (edge-touching on the right)
        return (jnp.array([0.0]), jnp.array([0.0]),
                jnp.array([64.0]), jnp.array([51.0]))

    def test_xla_path_no_padding_bleed(self):
        canvas, dims = self._canvas()
        out = augment.crop_resize_bilinear(
            canvas, self._boxes(), (32, 32), jnp.float32,
            valid_hw=(dims[:, 2], dims[:, 3]))
        out = np.asarray(out)
        # without the clamp the last column blends ~40% zeros (~150)
        assert out[0, :, -1].min() > 250, out[0, :, -1].min()
        assert out[0, -1, :].min() > 250

    def test_pallas_path_no_padding_bleed(self):
        from resnet_tpu.ops.augment_pallas import fused_crop_mirror_normalize
        canvas, dims = self._canvas()
        out = fused_crop_mirror_normalize(
            canvas, self._boxes(), None, (32, 32), (0.0, 0.0, 0.0),
            (1.0, 1.0, 1.0), jnp.float32, interpret=True,
            valid_hw=(dims[:, 2], dims[:, 3]))
        out = np.asarray(out)
        assert out[0, :, -1].min() > 250
        assert out[0, -1, :].min() > 250

    def test_without_valid_hw_unchanged(self):
        """No dims (in-memory pipelines): the canvas IS the image and the
        old clip applies — full-canvas crops keep exact pixels."""
        img = np.random.default_rng(0).integers(
            0, 255, (1, 16, 16, 3)).astype(np.uint8)
        out = augment.crop_resize_bilinear(
            jnp.asarray(img), (jnp.array([0.0]), jnp.array([0.0]),
                               jnp.array([16.0]), jnp.array([16.0])),
            (16, 16), jnp.float32)
        np.testing.assert_allclose(np.asarray(out)[0], img[0], atol=1e-3)
