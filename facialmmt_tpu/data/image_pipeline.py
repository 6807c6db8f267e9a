"""Device-resident, batched image preprocessing/augmentation.

The reference preprocesses faces one at a time on the host with cv2/PIL/
torchvision inside DataLoader workers (reference utils/dataset.py:47-69 and the
Aff-Wild2 transform stack utils/util.py:43-60, utils/random_erasing.py:9-81) —
the hot loop of its eval path (SURVEY.md §3.1).  Here every op is a vectorized
jax program over (N, H, W, C) uint8/float batches with per-image PRNG, so the
whole augmentation stack fuses into the forward program on device and the host
only decodes bytes.

Semantics per op (deviations documented):
  * resize: cv2 INTER_AREA (downscale) / INTER_CUBIC (upscale) become
    jax.image.resize 'linear' + antialias / 'cubic' — the standard TPU
    equivalents (identical at integer scale factors for area; Catmull-Rom
    matches cv2's bicubic kernel a=-0.5... cv2 uses a=-0.75; delta is sub-LSB
    on 8-bit inputs);
  * ColorJitter(brightness, contrast, saturation, hue): torchvision semantics —
    factors sampled uniformly, the four adjustments applied in RANDOM ORDER
    per image (torchvision ColorJitter.get_params);
  * Grayscale(3): ITU-R 601 luma, replicated to 3 channels (PIL convert('L'));
  * GaussianBlur: sigma ~ U[min, max], separable gaussian (reference wraps PIL's
    approximate gaussian, utils/util.py:32-40);
  * RandomErasing: timm 'pixel' mode — up to 10 area/aspect attempts, erased
    region filled with per-pixel normal noise (reference utils/random_erasing.py);
  * normalize: (x - mean) / std with mean = std = 0.5 (reference utils/dataset.py:18-19).

Channel-order note: the reference reads frames with cv2 (BGR) and feeds the
array as-is into the 'RGB' pipeline (utils/dataset.py:59), so released
checkpoints expect BGR-ordered channels.  The host decoder preserves that
behavior; see data/meld.py.
"""

from __future__ import annotations

import math
from functools import partial

import jax
import jax.numpy as jnp


# ------------------------------------------------------------------ resize --

def resize_batch(images: jnp.ndarray, size: int) -> jnp.ndarray:
    """(N, H, W, C) -> (N, size, size, C).  Antialiased linear when shrinking
    (INTER_AREA equivalent), cubic when enlarging (INTER_CUBIC equivalent)."""
    n, h, w, c = images.shape
    x = images.astype(jnp.float32)
    if h == size and w == size:
        return x
    method = "cubic" if size > h else "linear"
    return jax.image.resize(x, (n, size, size, c), method=method,
                            antialias=(size < h))


# ------------------------------------------------------------- color space --

_LUMA = jnp.asarray([0.299, 0.587, 0.114])


def grayscale(images: jnp.ndarray) -> jnp.ndarray:
    """ITU-R 601 luma replicated to 3 channels.  images float in [0, 255]."""
    l = jnp.einsum("...c,c->...", images, _LUMA.astype(images.dtype))
    return jnp.repeat(l[..., None], 3, axis=-1)


def _rgb_to_hsv(rgb):
    r, g, b = rgb[..., 0], rgb[..., 1], rgb[..., 2]
    maxc = jnp.max(rgb, axis=-1)
    minc = jnp.min(rgb, axis=-1)
    v = maxc
    delta = maxc - minc
    s = jnp.where(maxc > 0, delta / jnp.maximum(maxc, 1e-12), 0.0)
    safe = jnp.maximum(delta, 1e-12)
    rc = (maxc - r) / safe
    gc = (maxc - g) / safe
    bc = (maxc - b) / safe
    h = jnp.where(r == maxc, bc - gc,
                  jnp.where(g == maxc, 2.0 + rc - bc, 4.0 + gc - rc))
    h = (h / 6.0) % 1.0
    h = jnp.where(delta == 0, 0.0, h)
    return jnp.stack([h, s, v], axis=-1)


def _hsv_to_rgb(hsv):
    h, s, v = hsv[..., 0], hsv[..., 1], hsv[..., 2]
    i = jnp.floor(h * 6.0)
    f = h * 6.0 - i
    p = v * (1.0 - s)
    q = v * (1.0 - s * f)
    t = v * (1.0 - s * (1.0 - f))
    i = i.astype(jnp.int32) % 6
    r = jnp.select([i == 0, i == 1, i == 2, i == 3, i == 4, i == 5],
                   [v, q, p, p, t, v])
    g = jnp.select([i == 0, i == 1, i == 2, i == 3, i == 4, i == 5],
                   [t, v, v, q, p, p])
    b = jnp.select([i == 0, i == 1, i == 2, i == 3, i == 4, i == 5],
                   [p, p, t, v, v, q])
    return jnp.stack([r, g, b], axis=-1)


# ------------------------------------------------------------ color jitter --

def _adjust_brightness(img, factor):
    return img * factor


def _adjust_contrast(img, factor):
    mean = jnp.mean(grayscale(img)[..., 0], axis=(-2, -1), keepdims=True)[..., None]
    return (img - mean) * factor + mean


def _adjust_saturation(img, factor):
    gray = grayscale(img)
    return (img - gray) * factor + gray


def _adjust_hue(img, shift):
    # img in [0, 255]; hue shift in turns (torchvision hue factor)
    hsv = _rgb_to_hsv(img / 255.0)
    h = (hsv[..., 0] + shift) % 1.0
    out = _hsv_to_rgb(jnp.stack([h, hsv[..., 1], hsv[..., 2]], axis=-1))
    return out * 255.0


def color_jitter(key, images: jnp.ndarray, brightness: float, contrast: float,
                 saturation: float, hue: float) -> jnp.ndarray:
    """torchvision ColorJitter over a batch: per-image factors AND per-image
    random application order.  images float (N, H, W, 3) in [0, 255]."""

    def one(img, key):
        ks = jax.random.split(key, 5)
        bf = jax.random.uniform(ks[0], (), minval=max(0.0, 1 - brightness),
                                maxval=1 + brightness)
        cf = jax.random.uniform(ks[1], (), minval=max(0.0, 1 - contrast),
                                maxval=1 + contrast)
        sf = jax.random.uniform(ks[2], (), minval=max(0.0, 1 - saturation),
                                maxval=1 + saturation)
        hf = jax.random.uniform(ks[3], (), minval=-hue, maxval=hue)
        order = jax.random.permutation(ks[4], 4)

        def apply_op(img, op_idx):
            return jax.lax.switch(op_idx, [
                lambda x: _adjust_brightness(x, bf),
                lambda x: _adjust_contrast(x, cf),
                lambda x: _adjust_saturation(x, sf),
                lambda x: _adjust_hue(x, hf),
            ], img), None

        img, _ = jax.lax.scan(apply_op, img, order)
        return jnp.clip(img, 0.0, 255.0)

    keys = jax.random.split(key, images.shape[0])
    return jax.vmap(one)(images, keys)


# ------------------------------------------------------------ gaussian blur --

def gaussian_blur(key, images: jnp.ndarray, sigma_min: float = 0.1,
                  sigma_max: float = 2.0, kernel_size: int = 13) -> jnp.ndarray:
    """Separable gaussian blur with per-image sigma ~ U[min, max]."""

    half = kernel_size // 2
    offsets = jnp.arange(-half, half + 1, dtype=jnp.float32)

    def one(img, key):
        sigma = jax.random.uniform(key, (), minval=sigma_min, maxval=sigma_max)
        k = jnp.exp(-0.5 * (offsets / sigma) ** 2)
        k = k / jnp.sum(k)
        # edge-replicate padding (PIL semantics), then VALID separable conv
        x = jnp.pad(img, ((half, half), (half, half), (0, 0)), mode="edge")
        x = x[None]  # (1, H+2p, W+2p, C)
        kh = jnp.tile(k.reshape(1, kernel_size, 1, 1), (1, 1, 1, x.shape[-1]))
        kv = jnp.tile(k.reshape(kernel_size, 1, 1, 1), (1, 1, 1, x.shape[-1]))
        dn = jax.lax.conv_dimension_numbers(x.shape, kh.shape,
                                            ("NHWC", "HWIO", "NHWC"))
        x = jax.lax.conv_general_dilated(
            x, kh, (1, 1), "VALID", dimension_numbers=dn,
            feature_group_count=x.shape[-1])
        x = jax.lax.conv_general_dilated(
            x, kv, (1, 1), "VALID", dimension_numbers=dn,
            feature_group_count=x.shape[-1])
        return x[0]

    keys = jax.random.split(key, images.shape[0])
    return jax.vmap(one)(images, keys)


# ----------------------------------------------------------- random erasing --

def random_erasing(key, images: jnp.ndarray, prob: float = 0.25,
                   min_area: float = 0.02, max_area: float = 1 / 3,
                   min_aspect: float = 0.3, attempts: int = 10) -> jnp.ndarray:
    """timm-style RandomErasing, 'pixel' mode (reference utils/random_erasing.py:9-81):
    with probability `prob`, erase one region (first geometrically-valid of 10
    area/aspect attempts) with per-pixel standard-normal noise.

    Operates on NORMALIZED images (the reference applies it after Normalize)."""
    n, h, w, c = images.shape
    log_ratio = (math.log(min_aspect), math.log(1 / min_aspect))

    def one(img, key):
        ks = jax.random.split(key, 5)
        do_erase = jax.random.uniform(ks[0], ()) < prob
        areas = jax.random.uniform(ks[1], (attempts,), minval=min_area,
                                   maxval=max_area) * (h * w)
        ratios = jnp.exp(jax.random.uniform(ks[2], (attempts,),
                                            minval=log_ratio[0],
                                            maxval=log_ratio[1]))
        eh = jnp.round(jnp.sqrt(areas * ratios)).astype(jnp.int32)
        ew = jnp.round(jnp.sqrt(areas / ratios)).astype(jnp.int32)
        valid = (eh < h) & (ew < w)
        # first valid attempt (argmax over bool picks first True)
        idx = jnp.argmax(valid)
        ok = valid[idx] & do_erase
        eh_i = jnp.clip(eh[idx], 1, h - 1)
        ew_i = jnp.clip(ew[idx], 1, w - 1)
        top = jax.random.randint(ks[3], (), 0, h)  # then clipped into range
        left = jax.random.randint(ks[4], (), 0, w)
        top = jnp.clip(top, 0, h - eh_i)
        left = jnp.clip(left, 0, w - ew_i)
        rows = jnp.arange(h)[:, None]
        cols = jnp.arange(w)[None, :]
        inside = ((rows >= top) & (rows < top + eh_i) &
                  (cols >= left) & (cols < left + ew_i))
        noise = jax.random.normal(jax.random.fold_in(key, 7), img.shape,
                                  img.dtype)
        return jnp.where((inside[..., None] & ok), noise, img)

    keys = jax.random.split(key, n)
    return jax.vmap(one)(images, keys)


# ------------------------------------------------------------- composition --

def normalize_images(images: jnp.ndarray, mean=(0.5, 0.5, 0.5),
                     std=(0.5, 0.5, 0.5)) -> jnp.ndarray:
    """uint8-range [0,255] float -> normalized ((x/255) - mean) / std."""
    m = jnp.asarray(mean, images.dtype)
    s = jnp.asarray(std, images.dtype)
    return (images / 255.0 - m) / s


def _random_apply(key, images, fn, prob):
    """Reference RandomApply quirk: applies when random() > prob — i.e. with
    probability (1 - prob) (reference utils/util.py:22-30).  Preserved."""
    n = images.shape[0]
    apply_mask = jax.random.uniform(key, (n,)) > prob
    transformed = fn(images)
    return jnp.where(apply_mask[:, None, None, None], transformed, images)


@partial(jax.jit, static_argnames=("img_size",))
def affwild2_train_augment(key, images: jnp.ndarray, img_size: int = 224):
    """Full Aff-Wild2 train transform stack (reference utils/util.py:43-60):
    Resize(bicubic) -> RandomApply(Grayscale, .2) -> RandomApply(ColorJitter(.4), .8)
    -> RandomApply(GaussianBlur, .5) -> Normalize -> RandomErasing(pixel, .25).

    images: (N, H, W, 3) uint8 or float [0,255].  Returns normalized float32.
    """
    ks = jax.random.split(key, 6)
    x = resize_batch(images, img_size)
    x = _random_apply(ks[0], x, grayscale, prob=0.2)
    x = _random_apply(
        ks[1], x, lambda im: color_jitter(ks[4], im, 0.4, 0.4, 0.4, 0.4),
        prob=0.8)
    x = _random_apply(ks[2], x, lambda im: gaussian_blur(ks[5], im), prob=0.5)
    x = normalize_images(x)
    x = random_erasing(ks[3], x, prob=0.25)
    return x


@partial(jax.jit, static_argnames=("img_size",))
def meld_face_train_augment(key, images: jnp.ndarray, img_size: int = 224):
    """MELD face train transform (reference utils/dataset.py:35-39):
    resize (area/cubic) -> ColorJitter(0.5, 0.5, 0.5, 0.5) -> Normalize."""
    x = resize_batch(images, img_size)
    x = color_jitter(key, x, 0.5, 0.5, 0.5, 0.5)
    return normalize_images(x)


@partial(jax.jit, static_argnames=("img_size",))
def meld_face_eval_transform(images: jnp.ndarray, img_size: int = 224):
    """MELD face eval transform (reference utils/dataset.py:41-44):
    resize -> Normalize only."""
    return normalize_images(resize_batch(images, img_size))
