"""Image corruptions for the robustness benchmark
(counterpart of the ``imagecorruptions`` package the reference's Corrupt
transform wraps — ref: mmdet/datasets/pipelines/transforms.py:692-711 and
tools/test_robustness.py).

numpy/cv2 reimplementations of the ImageNet-C corruption set with the
published severity parameterizations. ``frost`` uses a procedural plasma
texture instead of the original photographed frost assets (zero-egress
environment) — severities keep the same alpha mixing.
"""
from __future__ import annotations

import numpy as np

try:
    import cv2
except ImportError:  # pragma: no cover
    cv2 = None


def _rng(seed=None):
    return np.random.RandomState(seed)


def _as_float(x):
    return x.astype(np.float32) / 255.0


def _to_uint8(x):
    return np.uint8(np.clip(x, 0, 1) * 255)


def gaussian_noise(x, severity=1, seed=None):
    c = [.08, .12, .18, .26, .38][severity - 1]
    x = _as_float(x)
    return _to_uint8(x + _rng(seed).normal(size=x.shape, scale=c))


def shot_noise(x, severity=1, seed=None):
    c = [60, 25, 12, 5, 3][severity - 1]
    x = _as_float(x)
    return _to_uint8(_rng(seed).poisson(x * c) / float(c))


def impulse_noise(x, severity=1, seed=None):
    c = [.03, .06, .09, .17, .27][severity - 1]
    x = _as_float(x)
    rng = _rng(seed)
    mask = rng.rand(*x.shape[:2])
    out = x.copy()
    out[mask < c / 2] = 0.0
    out[mask > 1 - c / 2] = 1.0
    return _to_uint8(out)


def speckle_noise(x, severity=1, seed=None):
    c = [.15, .2, 0.35, 0.45, 0.6][severity - 1]
    x = _as_float(x)
    return _to_uint8(x + x * _rng(seed).normal(size=x.shape, scale=c))


def gaussian_blur(x, severity=1, seed=None):
    c = [1, 2, 3, 4, 6][severity - 1]
    return _to_uint8(cv2.GaussianBlur(_as_float(x), (0, 0), c))


def _disk(radius, alias_blur=0.1, dtype=np.float32):
    if radius <= 8:
        size = np.arange(-8, 8 + 1)
        ksize = (3, 3)
    else:
        size = np.arange(-radius, radius + 1)
        ksize = (5, 5)
    xs, ys = np.meshgrid(size, size)
    aliased = np.array((xs ** 2 + ys ** 2) <= radius ** 2, dtype=dtype)
    aliased /= aliased.sum()
    return cv2.GaussianBlur(aliased, ksize=ksize, sigmaX=alias_blur)


def defocus_blur(x, severity=1, seed=None):
    c = [(3, 0.1), (4, 0.5), (6, 0.5), (8, 0.5), (10, 0.5)][severity - 1]
    x = _as_float(x)
    kernel = _disk(radius=c[0], alias_blur=c[1])
    chans = [cv2.filter2D(x[..., d], -1, kernel) for d in range(3)]
    return _to_uint8(np.stack(chans, -1))


def glass_blur(x, severity=1, seed=None):
    c = [(0.7, 1, 2), (0.9, 2, 1), (1, 2, 3), (1.1, 3, 2),
         (1.5, 4, 2)][severity - 1]
    sigma, max_delta, iters = c
    rng = _rng(seed)
    out = _to_uint8(cv2.GaussianBlur(_as_float(x), (0, 0), sigma))
    h, w = out.shape[:2]
    ys, xs = np.mgrid[0:h, 0:w]
    for _ in range(iters):
        dy = rng.randint(-max_delta, max_delta + 1, size=(h, w))
        dx = rng.randint(-max_delta, max_delta + 1, size=(h, w))
        ny = np.clip(ys + dy, 0, h - 1)
        nx = np.clip(xs + dx, 0, w - 1)
        out = out[ny, nx]
    return _to_uint8(cv2.GaussianBlur(_as_float(out), (0, 0), sigma))


def _motion_kernel(length, sigma, angle):
    k = np.zeros((length, length), np.float32)
    c = length // 2
    rad = np.deg2rad(angle)
    dx, dy = np.cos(rad), np.sin(rad)
    ts = np.arange(-c, c + 1, dtype=np.float32)
    xs = np.clip(np.round(c + ts * dx).astype(int), 0, length - 1)
    ys = np.clip(np.round(c + ts * dy).astype(int), 0, length - 1)
    weights = np.exp(-(ts ** 2) / (2 * sigma ** 2))
    for xx, yy, wgt in zip(xs, ys, weights):
        k[yy, xx] += wgt
    return k / k.sum()


def motion_blur(x, severity=1, seed=None):
    c = [(10, 3), (15, 5), (15, 8), (15, 12), (20, 15)][severity - 1]
    angle = _rng(seed).uniform(-45, 45)
    kernel = _motion_kernel(2 * c[0] + 1, c[1], angle)
    return _to_uint8(cv2.filter2D(_as_float(x), -1, kernel))


def _clipped_zoom(img, zoom):
    h, w = img.shape[:2]
    ch, cw = int(np.ceil(h / zoom)), int(np.ceil(w / zoom))
    top = (h - ch) // 2
    left = (w - cw) // 2
    crop = img[top:top + ch, left:left + cw]
    return cv2.resize(crop, (w, h), interpolation=cv2.INTER_LINEAR)


def zoom_blur(x, severity=1, seed=None):
    c = [np.arange(1, 1.11, 0.01), np.arange(1, 1.16, 0.01),
         np.arange(1, 1.21, 0.02), np.arange(1, 1.26, 0.02),
         np.arange(1, 1.31, 0.03)][severity - 1]
    x = _as_float(x)
    out = np.zeros_like(x)
    for zoom in c:
        out += _clipped_zoom(x, zoom)
    return _to_uint8((x + out) / (len(c) + 1))


def _plasma_fractal(mapsize=256, wibbledecay=3.0, rng=None):
    """Diamond-square heightmap in [0, 1] (the ImageNet-C fog base)."""
    rng = rng or _rng()
    maparray = np.empty((mapsize, mapsize), dtype=np.float64)
    maparray[0, 0] = 0
    stepsize = mapsize
    wibble = 100.0

    def wibbledmean(array):
        return array / 4 + wibble * rng.uniform(-wibble, wibble,
                                                array.shape) / float(wibble)

    def fillsquares():
        cornerref = maparray[0:mapsize:stepsize, 0:mapsize:stepsize]
        squareaccum = cornerref + np.roll(cornerref, 1, axis=0)
        squareaccum += np.roll(squareaccum, 1, axis=1)
        maparray[stepsize // 2:mapsize:stepsize,
                 stepsize // 2:mapsize:stepsize] = wibbledmean(squareaccum)

    def filldiamonds():
        drgrid = maparray[stepsize // 2:mapsize:stepsize,
                          stepsize // 2:mapsize:stepsize]
        ulgrid = maparray[0:mapsize:stepsize, 0:mapsize:stepsize]
        ldrsum = drgrid + np.roll(drgrid, 1, axis=0)
        lulsum = ulgrid + np.roll(ulgrid, -1, axis=1)
        ltsum = ldrsum + lulsum
        maparray[0:mapsize:stepsize,
                 stepsize // 2:mapsize:stepsize] = wibbledmean(ltsum)
        tdrsum = drgrid + np.roll(drgrid, 1, axis=1)
        tulsum = ulgrid + np.roll(ulgrid, -1, axis=0)
        ttsum = tdrsum + tulsum
        maparray[stepsize // 2:mapsize:stepsize,
                 0:mapsize:stepsize] = wibbledmean(ttsum)

    while stepsize >= 2:
        fillsquares()
        filldiamonds()
        stepsize //= 2
        wibble /= wibbledecay
    maparray -= maparray.min()
    return maparray / maparray.max()


def fog(x, severity=1, seed=None):
    c = [(1.5, 2), (2., 2), (2.5, 1.7), (2.5, 1.5), (3., 1.4)][severity - 1]
    x = _as_float(x)
    h, w = x.shape[:2]
    mapsize = int(2 ** np.ceil(np.log2(max(h, w))))
    plasma = _plasma_fractal(mapsize=max(mapsize, 256), wibbledecay=c[1],
                             rng=_rng(seed))[:h, :w]
    max_val = x.max()
    x = x + c[0] * plasma[..., None]
    return _to_uint8(x * max_val / (max_val + c[0]))


def frost(x, severity=1, seed=None):
    """Procedural frost (the original uses photographed frost textures,
    unavailable offline): a sharpened plasma texture stands in."""
    c = [(1, 0.4), (0.8, 0.6), (0.7, 0.7), (0.65, 0.7),
         (0.6, 0.75)][severity - 1]
    x = _as_float(x)
    h, w = x.shape[:2]
    rng = _rng(seed)
    mapsize = max(int(2 ** np.ceil(np.log2(max(h, w)))), 256)
    tex = _plasma_fractal(mapsize=mapsize, wibbledecay=2.0, rng=rng)[:h, :w]
    tex = np.clip((tex - 0.6) * 4, 0, 1)           # sparse icy patches
    frost_tex = np.stack([tex] * 3, -1)
    return _to_uint8(c[0] * x + c[1] * frost_tex)


def snow(x, severity=1, seed=None):
    c = [(0.1, 0.3, 3, 0.5, 10, 4, 0.8),
         (0.2, 0.3, 2, 0.5, 12, 4, 0.7),
         (0.55, 0.3, 4, 0.9, 12, 8, 0.7),
         (0.55, 0.3, 4.5, 0.85, 12, 8, 0.65),
         (0.55, 0.3, 2.5, 0.85, 12, 12, 0.55)][severity - 1]
    x = _as_float(x)
    rng = _rng(seed)
    h, w = x.shape[:2]
    layer = rng.normal(size=(h, w), loc=c[0], scale=c[1])
    layer = _clipped_zoom(layer.astype(np.float32), c[2])
    layer[layer < c[3]] = 0
    kernel = _motion_kernel(2 * c[4] + 1, c[5], rng.uniform(-135, -45))
    layer = cv2.filter2D(layer, -1, kernel)[..., None]
    gray = cv2.cvtColor(np.uint8(x * 255), cv2.COLOR_BGR2GRAY) / 255.
    base = c[6] * x + (1 - c[6]) * np.maximum(
        x, gray[..., None] * 1.5 + 0.5)
    return _to_uint8(base + layer + np.rot90(layer, k=2))


def brightness(x, severity=1, seed=None):
    c = [.1, .2, .3, .4, .5][severity - 1]
    x = _as_float(x)
    hsv = cv2.cvtColor(np.uint8(x * 255), cv2.COLOR_BGR2HSV).astype(
        np.float32)
    hsv[..., 2] = np.clip(hsv[..., 2] + c * 255, 0, 255)
    return cv2.cvtColor(hsv.astype(np.uint8), cv2.COLOR_HSV2BGR)


def contrast(x, severity=1, seed=None):
    c = [0.4, .3, .2, .1, .05][severity - 1]
    x = _as_float(x)
    means = x.mean(axis=(0, 1), keepdims=True)
    return _to_uint8((x - means) * c + means)


def saturate(x, severity=1, seed=None):
    c = [(0.3, 0), (0.1, 0), (2, 0), (5, 0.1), (20, 0.2)][severity - 1]
    hsv = cv2.cvtColor(x, cv2.COLOR_BGR2HSV).astype(np.float32)
    hsv[..., 1] = np.clip(hsv[..., 1] * c[0] + c[1] * 255, 0, 255)
    return cv2.cvtColor(hsv.astype(np.uint8), cv2.COLOR_HSV2BGR)


def elastic_transform(x, severity=1, seed=None):
    c = [(2, 0.7, 0.1), (2, 0.08, 0.2), (0.05, 0.01, 0.02),
         (0.07, 0.01, 0.02), (0.12, 0.01, 0.04)][severity - 1]
    rng = _rng(seed)
    x = _as_float(x)
    h, w = x.shape[:2]
    shape_size = min(h, w)
    sigma = c[1] * shape_size
    alpha = c[0] * shape_size
    dx = cv2.GaussianBlur(
        (rng.rand(h, w).astype(np.float32) * 2 - 1), (0, 0),
        max(sigma, 1e-3)) * alpha
    dy = cv2.GaussianBlur(
        (rng.rand(h, w).astype(np.float32) * 2 - 1), (0, 0),
        max(sigma, 1e-3)) * alpha
    xs, ys = np.meshgrid(np.arange(w), np.arange(h))
    mapx = (xs + dx).astype(np.float32)
    mapy = (ys + dy).astype(np.float32)
    out = cv2.remap(x, mapx, mapy, interpolation=cv2.INTER_LINEAR,
                    borderMode=cv2.BORDER_REFLECT)
    return _to_uint8(out)


def pixelate(x, severity=1, seed=None):
    c = [0.6, 0.5, 0.4, 0.3, 0.25][severity - 1]
    h, w = x.shape[:2]
    small = cv2.resize(x, (int(w * c), int(h * c)),
                       interpolation=cv2.INTER_AREA)
    return cv2.resize(small, (w, h), interpolation=cv2.INTER_NEAREST)


def jpeg_compression(x, severity=1, seed=None):
    c = [25, 18, 15, 10, 7][severity - 1]
    ok, enc = cv2.imencode('.jpg', x,
                           [int(cv2.IMWRITE_JPEG_QUALITY), c])
    return cv2.imdecode(enc, cv2.IMREAD_COLOR)


CORRUPTIONS = {
    'gaussian_noise': gaussian_noise,
    'shot_noise': shot_noise,
    'impulse_noise': impulse_noise,
    'speckle_noise': speckle_noise,
    'gaussian_blur': gaussian_blur,
    'defocus_blur': defocus_blur,
    'glass_blur': glass_blur,
    'motion_blur': motion_blur,
    'zoom_blur': zoom_blur,
    'fog': fog,
    'frost': frost,
    'snow': snow,
    'brightness': brightness,
    'contrast': contrast,
    'saturate': saturate,
    'elastic_transform': elastic_transform,
    'pixelate': pixelate,
    'jpeg_compression': jpeg_compression,
}

# the 15-corruption benchmark aggregate (ref: tools/test_robustness.py)
BENCHMARK_CORRUPTIONS = [
    'gaussian_noise', 'shot_noise', 'impulse_noise', 'defocus_blur',
    'glass_blur', 'motion_blur', 'zoom_blur', 'snow', 'frost', 'fog',
    'brightness', 'contrast', 'elastic_transform', 'pixelate',
    'jpeg_compression',
]


def corrupt(image, corruption_name, severity=1, seed=None):
    """Apply a named corruption to a uint8 BGR image."""
    if corruption_name not in CORRUPTIONS:
        raise KeyError(f'unknown corruption {corruption_name!r}; choose '
                       f'from {sorted(CORRUPTIONS)}')
    if not 1 <= severity <= 5:
        raise ValueError('severity must be in [1, 5]')
    return CORRUPTIONS[corruption_name](image, severity, seed=seed)
