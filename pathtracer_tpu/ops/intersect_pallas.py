"""Pallas TPU closest-hit kernel.

Fuses the tiled Moller-Trumbore sweep of ``ops.intersect.closest_tri_brute``
into a single kernel. The jnp version is HBM-bound: its ~25 [B, T]
intermediates each round-trip HBM (measured ~0.18 Tflop/s). Here the whole
triangle SoA sits resident in VMEM, each grid step owns one ray block, and
the triangle-tile loop runs *inside* the kernel with the running (t, id)
minimum carried in registers — intermediates never leave VMEM.

Layout: rays ride the *sublane* axis as [BR, 1] component blocks; triangles
ride the *lane* axis as [1, T] component arrays (sliced [1, TT] per tile).
Their broadcast product is a full [BR, TT] VPU tile per op — cross-pairing
falls out of 2-D broadcasting with no transposes (1-D operands trip
Mosaic/XLA layout mismatches, and argmin is done manually with iota+min
since a native argmin reduce lowers poorly).

Contract matches ``closest_tri_brute``: returns (t [B] f32 — inf on miss,
tri_id [B] i32 — -1 on miss). Interpret mode doubles as the CPU test path.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

EPS_TRI = 1e-8  # ray-triangle-intersection.wgsl:5
_INF = 3.0e38  # plain float: jnp scalars would be captured consts in pallas
_BIG_I = 2**30

RAY_BLOCK = 512
TRI_TILE = 128


def _make_kernel(n_tiles: int, tri_tile: int):
    def kernel(
        ox, oy, oz, dx, dy, dz,  # ray refs [BR, 1]
        v0x, v0y, v0z, e1x, e1y, e1z, e2x, e2y, e2z, valid,  # tri refs [1, T]
        t_out, id_out,  # out refs [BR, 1]
    ):
        rx, ry, rz = ox[:], oy[:], oz[:]  # [BR, 1]
        wx, wy, wz = dx[:], dy[:], dz[:]

        best_t = jnp.full(rx.shape, _INF, dtype=jnp.float32)
        best_id = jnp.full(rx.shape, -1, dtype=jnp.int32)

        for j in range(n_tiles):  # static unroll; tris stay in VMEM
            sl = pl.ds(j * tri_tile, tri_tile)
            ax, ay, az = v0x[:, sl], v0y[:, sl], v0z[:, sl]  # [1, TT]
            bx, by, bz = e1x[:, sl], e1y[:, sl], e1z[:, sl]
            cx, cy, cz = e2x[:, sl], e2y[:, sl], e2z[:, sl]
            ok_tri = valid[:, sl] != 0

            # pvec = d x e2 -> [BR, TT]
            px = wy * cz - wz * cy
            py = wz * cx - wx * cz
            pz = wx * cy - wy * cx
            det = bx * px + by * py + bz * pz
            inv_det = 1.0 / jnp.where(jnp.abs(det) > EPS_TRI, det, 1.0)
            sx, sy, sz = rx - ax, ry - ay, rz - az
            u = (sx * px + sy * py + sz * pz) * inv_det
            qx = sy * bz - sz * by
            qy = sz * bx - sx * bz
            qz = sx * by - sy * bx
            v = (wx * qx + wy * qy + wz * qz) * inv_det
            t = (cx * qx + cy * qy + cz * qz) * inv_det
            ok = (
                (jnp.abs(det) > EPS_TRI)
                & (u >= 0.0)
                & (u <= 1.0)
                & (v >= 0.0)
                & (u + v <= 1.0)
                & (t > EPS_TRI)
                & ok_tri
            )
            t = jnp.where(ok, t, _INF)

            tile_t = jnp.min(t, axis=1, keepdims=True)  # [BR, 1]
            # Manual argmin: lowest lane index attaining the min.
            lane = jax.lax.broadcasted_iota(jnp.int32, t.shape, 1)
            lane = jnp.where(t == tile_t, lane, _BIG_I)
            tile_arg = jnp.min(lane, axis=1, keepdims=True) + j * tri_tile

            better = tile_t < best_t
            best_t = jnp.where(better, tile_t, best_t)
            best_id = jnp.where(better, tile_arg, best_id)

        t_out[:] = best_t
        id_out[:] = best_id

    return kernel


@functools.partial(
    jax.jit, static_argnames=("ray_block", "tri_tile", "interpret")
)
def _closest_flat(
    rays, tris,
    ray_block: int = RAY_BLOCK,
    tri_tile: int = TRI_TILE,
    interpret: bool = False,
):
    """rays: 6 x [B, 1] f32; tris: 9 x [1, T] f32 + [1, T] i32 valid."""
    b = rays[0].shape[0]
    tp = tris[0].shape[1]
    grid = (b // ray_block,)
    n_tiles = tp // tri_tile

    ray_spec = pl.BlockSpec(
        (ray_block, 1), lambda i: (i, 0), memory_space=pltpu.VMEM
    )
    tri_spec = pl.BlockSpec((1, tp), lambda i: (0, 0), memory_space=pltpu.VMEM)
    out_spec = pl.BlockSpec(
        (ray_block, 1), lambda i: (i, 0), memory_space=pltpu.VMEM
    )

    t_min, tri_id = pl.pallas_call(
        _make_kernel(n_tiles, tri_tile),
        grid=grid,
        in_specs=[ray_spec] * 6 + [tri_spec] * 10,
        out_specs=(out_spec, out_spec),
        out_shape=(
            jax.ShapeDtypeStruct((b, 1), jnp.float32),
            jax.ShapeDtypeStruct((b, 1), jnp.int32),
        ),
        interpret=interpret,
    )(*rays, *tris)
    return t_min[:, 0], tri_id[:, 0]


def closest_tri_pallas(scene, o, d, interpret: bool = False):
    """Closest triangle hit -> (t [B] — inf on miss, tri_id [B] — -1 on miss).

    Pads the ray batch up to a RAY_BLOCK multiple; the triangle tile is the
    lane width (scene counts are always 128-padded).
    """
    b = o.shape[0]

    ray_block = RAY_BLOCK
    b_pad = ((b + ray_block - 1) // ray_block) * ray_block
    if b_pad != b:
        pad = b_pad - b
        o = jnp.concatenate([o, jnp.zeros((pad, 3), o.dtype)], axis=0)
        d = jnp.concatenate([d, jnp.zeros((pad, 3), d.dtype)], axis=0)

    rays = tuple(a[:, k : k + 1] for a in (o, d) for k in range(3))
    tris = tuple(
        a[:, k].reshape(1, -1)
        for a in (scene.tri_v0, scene.tri_e1, scene.tri_e2)
        for k in range(3)
    ) + (scene.tri_valid.astype(jnp.int32).reshape(1, -1),)

    t_min, tri_id = _closest_flat(
        rays, tris, ray_block=ray_block, tri_tile=TRI_TILE, interpret=interpret
    )
    t_min = jnp.where(t_min >= _INF, jnp.inf, t_min)
    return t_min[:b], tri_id[:b]
