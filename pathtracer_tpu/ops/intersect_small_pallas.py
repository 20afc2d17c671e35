"""Fused small-scene closest-hit kernel (T <= ~256 triangles).

The headline CornellBox workload intersects 36-40 triangles against 262k-ray
waves. The XLA path (ops.intersect: transposed [T8, B] Moller-Trumbore sweep
+ exact one-hot winner extraction on the MXU) is already layout-optimal for
the sweep itself, but materializes [T8, B] intermediates in HBM and pays a
separate extraction pass (~1.1 ms of the ~2.6 ms headline iteration,
docs/PERF_NOTES.md). This kernel fuses sweep + winner extraction into one
VMEM-resident pass over 512-ray blocks:

- triangles ride the SUBLANE axis ([T8, 1] component columns, T8 <= 256),
  rays the LANE axis ([1, block] rows) — the same [T8, B] orientation the
  XLA tmajor sweep proved out, with zero lane padding waste;
- the whole triangle table (16 component rows) is VMEM-resident; the
  [T8, block] test matrix never leaves VMEM;
- the winner's attributes (geometric normal, material id) are selected by a
  masked sum over the winning sublane — no one-hot matmul, no second pass;
- ``any_hit`` mode is the t-only shadow variant: one min against the
  per-ray cutoff, no winner bookkeeping.

Capability matched: the reference's megakernel intersection loop over its
packed triangle buffer (``src/wgsl-util/intersection-logic.wgsl:47-176``,
``ray-triangle-intersection.wgsl:1-42``), with identical Moller-Trumbore
math and epsilon — bit-exact against ``intersect.closest_tri_brute``.

Inference path only (pallas_call has no VJP); the differentiable scan
integrator keeps the XLA sweep (ops/intersect.py routes by scheduler).
"""

from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

EPS_TRI = 1e-8  # ray-triangle-intersection.wgsl:5
_INF = jnp.inf
_BIG_ID = 1.0e9  # > any triangle id; ids exact in f32 (< 2^24)

BLOCK = int(os.environ.get("PT_SMALL_BLOCK", "2048"))  # rays per block
SMALL_MAX_T8 = 256  # largest 8-rounded triangle count this kernel serves

# Table column layout (16 f32 columns, zero-padded):
# v0.xyz e1.xyz e2.xyz valid id n.xyz mat_id pad pad
_COLS = 16


def _tri_table_small(scene):
    """[T8, 16] f32 component table, T8 = 8-rounded triangle count."""
    t8 = max(8, (scene.num_tris + 7) // 8 * 8)
    v0, e1, e2 = scene.tri_v0[:t8], scene.tri_e1[:t8], scene.tri_e2[:t8]
    n = scene.tri_n[:t8]
    cols = [
        v0[:, 0], v0[:, 1], v0[:, 2],
        e1[:, 0], e1[:, 1], e1[:, 2],
        e2[:, 0], e2[:, 1], e2[:, 2],
        scene.tri_valid[:t8].astype(jnp.float32),
        jnp.arange(t8, dtype=jnp.float32),
        n[:, 0], n[:, 1], n[:, 2],
        scene.tri_mat[:t8].astype(jnp.float32),
        jnp.zeros((t8,), jnp.float32),
    ]
    return jnp.stack(cols, axis=1)  # [T8, 16]


def _kernel(ray_ref, tab_ref, out_ref, *, any_hit: bool):
    block = ray_ref.shape[1]

    ox = ray_ref[0:1, :]
    oy = ray_ref[1:2, :]
    oz = ray_ref[2:3, :]
    dx = ray_ref[3:4, :]
    dy = ray_ref[4:5, :]
    dz = ray_ref[5:6, :]
    t0 = ray_ref[6:7, :]  # cutoff (any-hit) / inf

    def col(j):
        return tab_ref[:, j : j + 1]  # [T8, 1]

    ax_, ay, az = col(0), col(1), col(2)
    bx, by, bz = col(3), col(4), col(5)
    cx, cy, cz = col(6), col(7), col(8)
    tval, tid = col(9), col(10)

    # Moller-Trumbore, [T8, block] componentwise (same math/eps as the
    # reference kernel and every other intersector in ops/).
    px = dy * cz - dz * cy
    py = dz * cx - dx * cz
    pz = dx * cy - dy * cx
    det = bx * px + by * py + bz * pz
    inv_det = 1.0 / jnp.where(jnp.abs(det) > EPS_TRI, det, 1.0)
    sx, sy, sz = ox - ax_, oy - ay, oz - az
    u = (sx * px + sy * py + sz * pz) * inv_det
    qx = sy * bz - sz * by
    qy = sz * bx - sx * bz
    qz = sx * by - sy * bx
    v = (dx * qx + dy * qy + dz * qz) * inv_det
    t = (cx * qx + cy * qy + cz * qz) * inv_det
    ok = (
        (jnp.abs(det) > EPS_TRI)
        & (u >= 0.0) & (u <= 1.0)
        & (v >= 0.0) & (u + v <= 1.0)
        & (t > EPS_TRI) & (tval > 0.5)
    )
    t = jnp.where(ok, t, _INF)  # [T8, block]

    if any_hit:
        # Shadow variant: smallest accepted t strictly before the cutoff
        # (caller tests t < cutoff); no winner attributes.
        tmin = jnp.min(jnp.where(t < t0, t, _INF), axis=0, keepdims=True)
        out_ref[0:1, :] = tmin
        out_ref[1:8, :] = jnp.zeros((7, block))
        return

    tmin = jnp.min(t, axis=0, keepdims=True)  # [1, block]
    idwin = jnp.min(
        jnp.where(t == tmin, tid, _BIG_ID), axis=0, keepdims=True
    )
    miss = ~jnp.isfinite(tmin)
    win = (t == tmin) & (tid == idwin)  # exactly one sublane per hit lane

    out_ref[0:1, :] = tmin
    out_ref[1:2, :] = jnp.where(miss, -1.0, idwin)
    for j in range(4):  # n.x n.y n.z mat_id
        row = col(11 + j)
        sel = jnp.sum(jnp.where(win, row, 0.0), axis=0, keepdims=True)
        out_ref[2 + j : 3 + j, :] = sel
    out_ref[6:8, :] = jnp.zeros((2, block))


@functools.partial(
    jax.jit, static_argnames=("block", "interpret", "any_hit")
)
def _small_pallas_raw(
    scene, o, d, t_init=None, block: int = BLOCK, interpret: bool = False,
    any_hit: bool = False,
):
    b = o.shape[0]
    bp = -(-b // block) * block
    if bp != b:
        pad = bp - b
        o = jnp.concatenate([o, jnp.full((pad, 3), 1e30, o.dtype)], axis=0)
        d = jnp.concatenate(
            [d, jnp.tile(jnp.asarray([[1.0, 0.0, 0.0]], d.dtype), (pad, 1))],
            axis=0,
        )
        if t_init is not None:
            t_init = jnp.concatenate(
                [t_init, jnp.zeros((pad,), t_init.dtype)], axis=0
            )
    nb = bp // block

    t0 = (
        jnp.full((bp,), _INF, jnp.float32)
        if t_init is None
        else t_init.astype(jnp.float32)
    )
    # [8, bp] ray pack (rows: o.xyz d.xyz t0 pad) sliced along the LANE
    # axis by the grid — no [8, B] -> [nb, 8, block] transpose (which
    # relayouts 8 MB per call and dominated this kernel's cost at 36 tris).
    packed = jnp.stack(
        [o[:, 0], o[:, 1], o[:, 2], d[:, 0], d[:, 1], d[:, 2], t0,
         jnp.zeros((bp,), jnp.float32)],
        axis=0,
    )
    table = _tri_table_small(scene)

    ray_spec = pl.BlockSpec(
        (8, block), lambda i: (0, i), memory_space=pltpu.VMEM
    )
    full = pl.BlockSpec(memory_space=pltpu.VMEM)
    out = pl.pallas_call(
        functools.partial(_kernel, any_hit=any_hit),
        grid=(nb,),
        in_specs=[ray_spec, full],
        out_specs=ray_spec,
        out_shape=jax.ShapeDtypeStruct((8, bp), jnp.float32),
        interpret=interpret,
    )(packed, table)
    return out


def closest_tri_small_pallas_attrs(
    scene, o, d, block: int = BLOCK, interpret: bool = False
):
    """Closest hit with winner attributes -> (t [B], tri_id [B] i32,
    n_geo [B, 3], mat_id [B] i32). Bit-exact t/id vs closest_tri_brute;
    miss lanes: t = inf, id = -1, n = 0 (callers sanitize), mat_id = 0."""
    out = _small_pallas_raw(
        scene, o, d, block=block, interpret=interpret, any_hit=False
    )
    b = o.shape[0]
    t = out[0, :b]
    tri_id = out[1, :b].astype(jnp.int32)
    n_geo = jnp.stack([out[2, :b], out[3, :b], out[4, :b]], axis=-1)
    mat_id = out[5, :b].astype(jnp.int32)
    return t, jnp.where(jnp.isfinite(t), tri_id, -1), n_geo, mat_id


def occluded_tri_small_pallas(
    scene, o, d, t_cut, block: int = BLOCK, interpret: bool = False
):
    """Shadow occlusion -> occluded [B] bool (any triangle strictly before
    ``t_cut``); the t-only half of the sweep, no winner bookkeeping."""
    out = _small_pallas_raw(
        scene, o, d, t_init=t_cut, block=block, interpret=interpret,
        any_hit=True,
    )
    t = out[0, : o.shape[0]]
    return t < t_cut
