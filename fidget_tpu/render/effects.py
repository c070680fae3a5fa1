"""Post-processing effects: normal denoising, SSAO, blur, shading.

Vectorized jnp re-implementations of the reference's per-pixel CPU
effects (fidget-raster/src/effects.rs:16-114 and the per-pixel helpers
at effects.rs:116-395): every effect is one fused XLA computation over
the whole image instead of a rayon per-pixel map.

Frame convention: this module consumes the world-frame normals produced
by `render3d` (+y up, +z toward the viewer), so normalized positions
use y-up too; the reference's y-down light rig (effects.rs:133-137) is
mirrored accordingly.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

#: reference light rig (effects.rs:133-137), mirrored to y-up:
#: (x, y, z, weight)
LIGHTS = np.array(
    [
        [5.0, 5.0, 10.0, 0.5],
        [-5.0, 0.0, 10.0, 0.15],
        [0.0, 5.0, 10.0, 0.15],
    ],
    dtype=np.float32,
)

SSAO_RADIUS = 0.1  # effects.rs:225


@functools.lru_cache(maxsize=4)
def ssao_kernel(n: int = 64, seed: int = 0) -> np.ndarray:
    """Hemisphere sample kernel (effects.rs:403-431): unit-ball
    rejection sampling with z >= 0, normalized, then scaled by
    (i / (n-1))^2 * 0.9 + 0.1 to concentrate samples near the origin.
    Deterministic (seeded) unlike the reference's thread_rng."""
    rng = np.random.RandomState(seed)
    out = np.zeros((n, 3), np.float32)
    for i in range(n):
        while True:
            v = np.array(
                [
                    rng.uniform(-1.0, 1.0),
                    rng.uniform(-1.0, 1.0),
                    rng.uniform(0.0, 1.0),
                ]
            )
            r = np.linalg.norm(v)
            if np.finfo(np.float32).eps < r < 1.0:
                scale = (i / (n - 1)) ** 2 * 0.9 + 0.1
                out[i] = v * scale / r
                break
    return out


@functools.lru_cache(maxsize=4)
def ssao_noise(n: int = 256, seed: int = 1) -> np.ndarray:
    """Random XY rotation vectors (effects.rs:436-447)."""
    rng = np.random.RandomState(seed)
    return rng.uniform(-1.0, 1.0, size=(n, 2)).astype(np.float32)


def _pcg2d(x, y):
    """Jarzynski & Olano 2020 2D hash (effects.rs:157-172), vectorized
    over uint32 arrays."""
    M = np.uint32(1664525)
    A = np.uint32(1013904223)
    x = x.astype(jnp.uint32) * M + A
    y = y.astype(jnp.uint32) * M + A
    x = x + y * M
    y = y + x * M
    x = x ^ (x >> 16)
    y = y ^ (y >> 16)
    x = x + y * M
    x = x ^ (x >> 16)
    return x


def _window_sums(a, r, anchors):
    """For each anchor (xmin, ymin), the (r+1)^2 box sum
    sum_{i,j in [0,r]} a[y+ymin+j, x+xmin+i] with zero padding.

    a: [..., H, W] (leading dims broadcast). Returns list of arrays."""
    H, W = a.shape[-2], a.shape[-1]
    pad = [(0, 0)] * (a.ndim - 2) + [(r, r), (r, r)]
    ap = jnp.pad(a, pad)
    sums = []
    for xmin, ymin in anchors:
        s = 0.0
        for j in range(r + 1):
            for i in range(r + 1):
                y0 = r + ymin + j
                x0 = r + xmin + i
                s = s + ap[..., y0 : y0 + H, x0 : x0 + W]
        sums.append(s)
    return sums


_ANCHORS2 = ((0, 0), (-2, 0), (0, -2), (-2, -2))


@jax.jit
def denoise_normals(depth, normal):
    """Replaces back-facing normals with the best neighbor average
    (effects.rs:16-35, denoise_pixel at :266-331): among 4 overlapping
    3x3 windows, take the mean of forward-facing neighbor normals from
    the window maximizing sum of dot(neighbor, mean)."""
    depth = jnp.asarray(depth)
    normal = jnp.asarray(normal, jnp.float32)
    filled = depth > 0
    forward = filled & (normal[..., 2] > 0.0)
    fwd_n = jnp.where(forward[..., None], normal, 0.0)
    # per-window mean of forward-facing normals
    cnt = _window_sums(forward.astype(jnp.float32), 2, _ANCHORS2)
    sums = _window_sums(jnp.moveaxis(fwd_n, -1, 0), 2, _ANCHORS2)
    fill_n = jnp.where(filled[..., None], normal, 0.0)
    fill_sums = _window_sums(jnp.moveaxis(fill_n, -1, 0), 2, _ANCHORS2)
    best_score = jnp.full(depth.shape, -jnp.inf, jnp.float32)
    best_mean = normal
    for c, s, fs in zip(cnt, sums, fill_sums):
        mean = jnp.moveaxis(s, 0, -1) / jnp.maximum(c, 1.0)[..., None]
        # score = sum over *filled* neighbors of dot(n_i, mean)
        score = jnp.sum(jnp.moveaxis(fs, 0, -1) * mean, axis=-1)
        ok = c > 0
        take = ok & (score > best_score)
        best_score = jnp.where(take, score, best_score)
        best_mean = jnp.where(take[..., None], mean, best_mean)
    out = jnp.where(
        (normal[..., 2] > 0.0)[..., None], normal, best_mean
    )
    return jnp.where(filled[..., None], out, 0.0)


@functools.partial(jax.jit, static_argnames=("vdepth",))
def _compute_ssao(depth, normal, kernel, noise, *, vdepth: int):
    H, W = depth.shape
    filled = depth > 0
    scale_min = min(W, H, vdepth)
    sx, sy, sz = scale_min / W, scale_min / H, scale_min / vdepth

    ys, xs = jnp.meshgrid(
        jnp.arange(H, dtype=jnp.float32),
        jnp.arange(W, dtype=jnp.float32),
        indexing="ij",
    )
    # normalized world-ish position, y-up (half-pixel offset per
    # effects.rs:203-210 to avoid quadrant bias)
    px = ((xs + 0.5) / W - 0.5) * 2.0
    py = -(((ys + 0.5) / H - 0.5) * 2.0)
    pz = (depth.astype(jnp.float32) / vdepth - 0.5) * 2.0

    n = normal / jnp.maximum(
        jnp.linalg.norm(normal, axis=-1, keepdims=True), 1e-20
    )
    h = _pcg2d(
        ys.astype(jnp.uint32), xs.astype(jnp.uint32)
    ) % jnp.uint32(noise.shape[0])
    rv = noise[h]  # [H, W, 2]
    rvec = jnp.concatenate([rv, jnp.zeros_like(rv[..., :1])], axis=-1)
    # Gram-Schmidt TBN basis (effects.rs:219-222)
    tangent = rvec - n * jnp.sum(rvec * n, axis=-1, keepdims=True)
    tangent = tangent / jnp.maximum(
        jnp.linalg.norm(tangent, axis=-1, keepdims=True), 1e-20
    )
    bitangent = jnp.cross(n, tangent)

    occ = jnp.zeros((H, W), jnp.float32)
    for i in range(kernel.shape[0]):
        k = kernel[i]
        off = (
            tangent * k[0] + bitangent * k[1] + n * k[2]
        ) * SSAO_RADIUS
        ox = off[..., 0] * sx
        oy = off[..., 1] * sy
        oz = off[..., 2] * sz
        sxp, syp, szp = px + ox, py + oy, pz + oz
        # back to pixel coordinates (y-up flip mirrored)
        ix = (sxp / 2.0 + 0.5) * W
        iy = (-syp / 2.0 + 0.5) * H
        in_bounds = (ix > 0.0) & (ix < W) & (iy > 0.0) & (iy < H)
        gx = jnp.clip(ix.astype(jnp.int32), 0, W - 1)
        gy = jnp.clip(iy.astype(jnp.int32), 0, H - 1)
        actual_h = jnp.where(in_bounds, depth[gy, gx], 0)
        actual_z = (actual_h.astype(jnp.float32) / vdepth - 0.5) * 2.0
        occ = occ + (szp <= actual_z).astype(jnp.float32)
    out = 1.0 - occ / kernel.shape[0]
    return jnp.where(filled, out, jnp.nan)


def compute_ssao(depth, normal, *, vdepth: int, kernel=None, noise=None):
    """Screen-space ambient occlusion (effects.rs:70-93, :176-264).
    Returns f32 [H, W], NaN where empty. `vdepth` is the volume's voxel
    depth (VoxelSize.depth)."""
    if kernel is None:
        kernel = ssao_kernel()
    if noise is None:
        noise = ssao_noise()
    return _compute_ssao(
        jnp.asarray(depth),
        jnp.asarray(normal, jnp.float32),
        jnp.asarray(kernel),
        jnp.asarray(noise),
        vdepth=vdepth,
    )


@jax.jit
def blur_ssao(ssao):
    """Edge-aware SSAO blur (effects.rs:96-114, :334-395): among 4
    overlapping 3x3 windows, the non-NaN mean from the window with the
    smallest variance; pixels with no valid window keep their value."""
    ssao = jnp.asarray(ssao, jnp.float32)
    valid = ~jnp.isnan(ssao)
    v = jnp.where(valid, ssao, 0.0)
    cnt = _window_sums(valid.astype(jnp.float32), 2, _ANCHORS2)
    sums = _window_sums(v, 2, _ANCHORS2)
    sq = _window_sums(v * v, 2, _ANCHORS2)
    best_var = jnp.full(ssao.shape, jnp.inf, jnp.float32)
    best_mean = ssao
    for c, s, q in zip(cnt, sums, sq):
        mean = s / jnp.maximum(c, 1.0)
        # stdev accumulates (mean - s_i)^2 over valid neighbors
        var = (q - 2.0 * mean * s + mean * mean * c) / jnp.maximum(c, 1.0)
        ok = c > 0
        take = ok & (var < best_var)
        best_var = jnp.where(take, var, best_var)
        best_mean = jnp.where(take, mean, best_mean)
    return jnp.where(jnp.isnan(ssao), jnp.nan, best_mean)


@functools.partial(jax.jit, static_argnames=("vdepth",))
def _shade(depth, normal, ssao, *, vdepth: int):
    H, W = depth.shape
    filled = depth > 0
    n = normal / jnp.maximum(
        jnp.linalg.norm(normal, axis=-1, keepdims=True), 1e-20
    )
    ys, xs = jnp.meshgrid(
        jnp.arange(H, dtype=jnp.float32),
        jnp.arange(W, dtype=jnp.float32),
        indexing="ij",
    )
    p = jnp.stack(
        [
            2.0 * (xs / W - 0.5),
            -2.0 * (ys / H - 0.5),
            2.0 * (depth.astype(jnp.float32) / vdepth - 0.5),
        ],
        axis=-1,
    )
    accum = jnp.full((H, W), 0.2, jnp.float32)  # ambient
    for light in LIGHTS:
        ld = jnp.asarray(light[:3]) - p
        ld = ld / jnp.maximum(jnp.linalg.norm(ld, axis=-1, keepdims=True), 1e-20)
        accum = accum + jnp.maximum(jnp.sum(ld * n, axis=-1), 0.0) * light[3]
    if ssao is not None:
        s = jnp.where(jnp.isnan(ssao), 1.0, ssao)
        accum = accum * (s * 0.6 + 0.4)
    accum = jnp.clip(accum, 0.0, 1.0)
    c = (accum * 255.0).astype(jnp.uint8)
    c = jnp.where(filled, c, 0)
    return jnp.stack([c, c, c], axis=-1)


def apply_shading(depth, normal, *, vdepth: int, ssao: bool = False):
    """Phong-ish grayscale shading (effects.rs:40-64, shade_pixel at
    :116-152), optionally modulated by blurred SSAO. Returns u8
    [H, W, 3]."""
    depth = jnp.asarray(depth)
    normal = jnp.asarray(normal, jnp.float32)
    s = None
    if ssao:
        s = blur_ssao(compute_ssao(depth, normal, vdepth=vdepth))
    return np.asarray(_shade(depth, normal, s, vdepth=vdepth))
