"""JAX software rasterizer: z-buffered triangle rendering for the synthetic
data generator.

Replaces the reference's pyrender/EGL offscreen passes (SURVEY.md §2.4 N5:
``SegmentationRenderer``/``RGBDRenderer``, ``HandSimulator/utils.py:255-432``)
with a device-side renderer so the whole frame->events pipeline runs on TPU
without native GL. Produces per-pixel class ids (background=0, left=1,
right=2), flat-shaded intensity, and depth. pyrender, when installed, remains
available for prettier demo renders (``demo.py``).

Implementation: perspective-project vertices, compute edge functions per
triangle per pixel row (scanned over rows to bound memory at
[T, W] instead of [T, H*W]), take the nearest front-facing covered triangle
per pixel via a z-buffer min.
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp
import numpy as np


class RasterOutput(NamedTuple):
    class_id: jax.Array   # [H, W] int32: 0 bg, else material id
    intensity: jax.Array  # [H, W] float32 flat-shaded in [0, 1]
    depth: jax.Array      # [H, W] float32 (0 where background)


def project_vertices(
    vertices: jax.Array,       # [V, 3] camera-space, -z forward (OpenGL)
    projection: jax.Array,     # [4, 4] OpenGL projection matrix
    width: int,
    height: int,
) -> Tuple[jax.Array, jax.Array]:
    """-> (screen_xy [V, 2] pixels, depth [V] positive distances)."""
    ones = jnp.ones((vertices.shape[0], 1), vertices.dtype)
    h = jnp.concatenate([vertices, ones], -1) @ projection.T
    w = jnp.where(jnp.abs(h[:, 3:4]) < 1e-9, 1e-9, h[:, 3:4])
    ndc = h[:, :3] / w
    x = (ndc[:, 0] + 1.0) * 0.5 * width
    y = (1.0 - ndc[:, 1]) * 0.5 * height
    return jnp.stack([x, y], -1), -vertices[:, 2]


@partial(jax.jit, static_argnames=("width", "height"))
def rasterize_mesh(
    vertices: jax.Array,   # [V, 3] camera-space
    faces: jax.Array,      # [T, 3] int32
    materials: jax.Array,  # [T] int32 per-triangle class id (>0)
    projection: jax.Array,  # [4, 4]
    width: int,
    height: int,
    light_dir=(0.0, 0.0, 1.0),
) -> RasterOutput:
    xy, z = project_vertices(vertices, projection, width, height)
    tri_xy = xy[faces]  # [T, 3, 2]
    tri_z = z[faces]    # [T, 3]

    # flat shading from camera-space normals
    v3 = vertices[faces]
    n = jnp.cross(v3[:, 1] - v3[:, 0], v3[:, 2] - v3[:, 0])
    n = n / jnp.maximum(jnp.linalg.norm(n, axis=-1, keepdims=True), 1e-12)
    light = jnp.asarray(light_dir, jnp.float32)
    shade = 0.2 + 0.8 * jnp.abs(n @ light)  # two-sided

    a, b, c = tri_xy[:, 0], tri_xy[:, 1], tri_xy[:, 2]
    area = (b[:, 0] - a[:, 0]) * (c[:, 1] - a[:, 1]) - (
        b[:, 1] - a[:, 1]
    ) * (c[:, 0] - a[:, 0])
    safe_area = jnp.where(jnp.abs(area) < 1e-9, 1e-9, area)
    zmean = jnp.mean(tri_z, axis=-1)
    visible = zmean > 1e-6  # in front of the camera

    xs = jnp.arange(width, dtype=jnp.float32) + 0.5

    def edge(p0, p1, px, py):
        # [T, W]: cross((p1-p0), (p - p0))
        return (p1[:, 0, None] - p0[:, 0, None]) * (py - p0[:, 1, None]) - (
            p1[:, 1, None] - p0[:, 1, None]
        ) * (px - p0[:, 0, None])

    def row(y):
        py = jnp.float32(y) + 0.5
        w0 = edge(b, c, xs[None, :], py)
        w1 = edge(c, a, xs[None, :], py)
        w2 = edge(a, b, xs[None, :], py)
        s = jnp.sign(safe_area)[:, None]
        inside = (w0 * s >= 0) & (w1 * s >= 0) & (w2 * s >= 0)
        # barycentric depth
        l0 = w0 / safe_area[:, None]
        l1 = w1 / safe_area[:, None]
        l2 = w2 / safe_area[:, None]
        zpix = l0 * tri_z[:, 0:1] + l1 * tri_z[:, 1:2] + l2 * tri_z[:, 2:3]
        covered = inside & visible[:, None] & (zpix > 1e-6)
        zbuf = jnp.where(covered, zpix, jnp.inf)
        best = jnp.argmin(zbuf, axis=0)  # [W]
        hit = jnp.isfinite(zbuf[best, jnp.arange(width)])
        cls = jnp.where(hit, materials[best], 0)
        inten = jnp.where(hit, shade[best], 0.0)
        dep = jnp.where(hit, zbuf[best, jnp.arange(width)], 0.0)
        return cls.astype(jnp.int32), inten, dep

    class_rows, inten_rows, depth_rows = jax.lax.map(
        row, jnp.arange(height, dtype=jnp.int32)
    )
    return RasterOutput(class_id=class_rows, intensity=inten_rows, depth=depth_rows)


class ShadedRasterOutput(NamedTuple):
    class_id: jax.Array  # [H, W] int32: 0 bg, else material id
    rgb: jax.Array       # [H, W, 3] float32 in [0, 1] (black where background)
    depth: jax.Array     # [H, W] float32 (0 where background)


def sample_train_lights(key: jax.Array) -> Tuple[jax.Array, jax.Array]:
    """Per-frame randomized point lights, mirroring the reference's
    ``generate_train_lights`` (``HandSimulator/utils.py:286-313``): three
    anchored positions ([0,-1,1], [0,1,1], [1,1,2]) with U[0,1)/10 jitter plus
    two fully random in [-2,2]^3, each with integer intensity in {1..4}
    (``random.randrange(1, 5)``).  Returns (positions [5,3], intensities [5])."""
    k_j, k_r, k_i = jax.random.split(key, 3)
    anchors = jnp.asarray(
        [[0.0, -1.0, 1.0], [0.0, 1.0, 1.0], [1.0, 1.0, 2.0]], jnp.float32
    )
    jit3 = jax.random.uniform(k_j, (3, 3)) / 10.0
    rnd2 = (2.0 * jax.random.uniform(k_r, (2, 3)) - 1.0) * 2.0
    positions = jnp.concatenate([anchors + jit3, rnd2], axis=0)
    intensities = jax.random.randint(k_i, (5,), 1, 5).astype(jnp.float32)
    return positions, intensities


@partial(jax.jit, static_argnames=("height", "width", "cells"))
def random_background(
    key: jax.Array, height: int, width: int, cells: int = 8
) -> jax.Array:
    """Procedural random background tile [H, W, 3] in [0, 1]: a low-frequency
    color field (bilinear-upsampled random grid) plus fine noise.  Stands in
    for the reference's random background *images*
    (``HandSimulator/utils.py:256-262,264-284`` — a licensed/downloaded image
    directory we do not ship); same role: static scene clutter behind the
    hands so silhouette motion produces realistic boundary events."""
    k_grid, k_noise = jax.random.split(key)
    grid = jax.random.uniform(k_grid, (cells, cells, 3))
    smooth = jax.image.resize(grid, (height, width, 3), method="bilinear")
    fine = jax.random.uniform(k_noise, (height, width, 1)) * 0.05
    return jnp.clip(smooth + fine, 0.0, 1.0)


@partial(jax.jit, static_argnames=("width", "height"))
def rasterize_scene(
    vertices: jax.Array,       # [V, 3] camera-space
    faces: jax.Array,          # [T, 3] int32
    materials: jax.Array,      # [T] int32 per-triangle class id (>0)
    vertex_colors: jax.Array,  # [V, 3] float32 in [0, 1]
    light_pos: jax.Array,      # [L, 3] point-light positions (camera space)
    light_int: jax.Array,      # [L] intensities
    projection: jax.Array,     # [4, 4]
    width: int,
    height: int,
    ambient: float = 0.1,
) -> ShadedRasterOutput:
    """Gouraud-shaded z-buffered render: per-pixel barycentric interpolation
    of per-vertex colors, lit per-triangle by point lights with inverse-square
    falloff (pyrender ``PointLight`` semantics) over an ambient term
    (``utils.py:323`` ambient_light=0.1).  Replaces the reference's EGL
    ``RGBDRenderer`` with a pure-XLA program so the frame never leaves the
    device."""
    xy, z = project_vertices(vertices, projection, width, height)
    tri_xy = xy[faces]
    tri_z = z[faces]

    v3 = vertices[faces]
    n = jnp.cross(v3[:, 1] - v3[:, 0], v3[:, 2] - v3[:, 0])
    n = n / jnp.maximum(jnp.linalg.norm(n, axis=-1, keepdims=True), 1e-12)
    centroid = jnp.mean(v3, axis=1)                       # [T, 3]
    to_l = light_pos[None, :, :] - centroid[:, None, :]   # [T, L, 3]
    d2 = jnp.sum(to_l * to_l, axis=-1)                    # [T, L]
    ldir = to_l / jnp.sqrt(jnp.maximum(d2, 1e-12))[..., None]
    lam = jnp.abs(jnp.einsum("tlk,tk->tl", ldir, n))      # two-sided lambert
    # Lambertian 1/pi normalization of the point-light irradiance, then a
    # Reinhard tone map x/(1+x) instead of a hard clip: a clip would saturate
    # at these intensities (1-4 cd at ~1-2 m) and erase the per-frame light
    # variation the reference's renderer produces.
    light_tri = ambient + jnp.sum(
        light_int[None, :] * lam / (jnp.pi * jnp.maximum(d2, 1e-4)), axis=-1
    )                                                     # [T]
    lit = vertex_colors[faces] * light_tri[:, None, None]
    lit_tri_c = lit / (1.0 + lit)                         # [T, 3, 3]

    a, b, c = tri_xy[:, 0], tri_xy[:, 1], tri_xy[:, 2]
    area = (b[:, 0] - a[:, 0]) * (c[:, 1] - a[:, 1]) - (
        b[:, 1] - a[:, 1]
    ) * (c[:, 0] - a[:, 0])
    safe_area = jnp.where(jnp.abs(area) < 1e-9, 1e-9, area)
    visible = jnp.mean(tri_z, axis=-1) > 1e-6

    xs = jnp.arange(width, dtype=jnp.float32) + 0.5

    def edge(p0, p1, px, py):
        return (p1[:, 0, None] - p0[:, 0, None]) * (py - p0[:, 1, None]) - (
            p1[:, 1, None] - p0[:, 1, None]
        ) * (px - p0[:, 0, None])

    def row(y):
        py = jnp.float32(y) + 0.5
        w0 = edge(b, c, xs[None, :], py)
        w1 = edge(c, a, xs[None, :], py)
        w2 = edge(a, b, xs[None, :], py)
        s = jnp.sign(safe_area)[:, None]
        inside = (w0 * s >= 0) & (w1 * s >= 0) & (w2 * s >= 0)
        l0 = w0 / safe_area[:, None]
        l1 = w1 / safe_area[:, None]
        l2 = w2 / safe_area[:, None]
        zpix = l0 * tri_z[:, 0:1] + l1 * tri_z[:, 1:2] + l2 * tri_z[:, 2:3]
        covered = inside & visible[:, None] & (zpix > 1e-6)
        zbuf = jnp.where(covered, zpix, jnp.inf)
        best = jnp.argmin(zbuf, axis=0)                   # [W]
        cols = jnp.arange(width)
        hit = jnp.isfinite(zbuf[best, cols])
        bary = jnp.stack(
            [l0[best, cols], l1[best, cols], l2[best, cols]], axis=-1
        )                                                 # [W, 3]
        color = jnp.einsum("wi,wic->wc", bary, lit_tri_c[best])
        cls = jnp.where(hit, materials[best], 0)
        rgb = jnp.where(hit[:, None], jnp.clip(color, 0.0, 1.0), 0.0)
        dep = jnp.where(hit, zbuf[best, cols], 0.0)
        return cls.astype(jnp.int32), rgb, dep

    class_rows, rgb_rows, depth_rows = jax.lax.map(
        row, jnp.arange(height, dtype=jnp.int32)
    )
    return ShadedRasterOutput(class_id=class_rows, rgb=rgb_rows, depth=depth_rows)


def render_two_hands(
    verts_left: jax.Array,   # [V, 3]
    verts_right: jax.Array,  # [V, 3]
    faces: np.ndarray,       # [F, 3] per-hand faces
    projection: jax.Array,
    width: int,
    height: int,
) -> RasterOutput:
    """Combined two-hand render: left triangles are class 1, right class 2
    (matches the segmentation colors left=G, right=B, ``settings.py:40``)."""
    V = verts_left.shape[0]
    faces = np.asarray(faces, np.int32)
    all_faces = jnp.asarray(np.concatenate([faces, faces + V]))
    materials = jnp.asarray(
        np.concatenate([np.ones(len(faces)), np.full(len(faces), 2)]).astype(np.int32)
    )
    verts = jnp.concatenate([verts_left, verts_right], 0)
    return rasterize_mesh(verts, all_faces, materials, projection, width, height)
