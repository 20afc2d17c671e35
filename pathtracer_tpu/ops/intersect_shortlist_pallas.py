"""Fused Pallas block-shortlist intersector (large scenes).

Same algorithm as ``ops.intersect_shortlist`` (the capability matched is the
reference's BVH traversal, ``src/wgsl-util/intersection-logic.wgsl:1-215``),
fused into one Pallas kernel. The XLA version pays ~7 ms/round of fixed cost
(top-k, cluster gather, repack relayout, two HBM round-trips of the gathered
tiles) and runs every block for the *global* maximum round count because the
``while_loop`` is branch-free over the whole batch. Fusing the loop into a
kernel removes both:

- the grid iterates 256-ray blocks; each block runs exactly as many rounds
  as IT needs (dead/finished blocks cost one [block, C] slab pass and exit)
  — the long drain tail of the regenerative pool gets cheap automatically;
- the triangle-cluster table lives in VMEM (the 12.8k-tri boat is ~0.7 MB),
  so the per-round "gather" is one dynamic row slice, and the per-ray
  entry-distance matrix [block, C] stays resident in VMEM across rounds —
  enabling the *exact* per-ray improvable cull (enter < best_t per ray)
  instead of the XLA version's conservative block-max cull;
- per round the only vector->scalar sync is one argmin (the shortlisted
  cluster id); everything else is straight VPU work on aligned tiles.

Exactness: identical contract to the XLA shortlist — agrees with the brute
sweep bit-for-bit on t (same Moller-Trumbore math and epsilon, strict
front-to-back improvement, min-id tie-break within a cluster row).
"""

from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# Clusters swept per argmin round (amortizes the round's fixed cost; the
# last round may redundantly re-sweep culled clusters). 2 measured best on
# both the boat and refraction once pool ray-sorting landed (round 5);
# overridable for experiments via PT_SHORTLIST_FETCH.
FETCH_DEFAULT = int(os.environ.get("PT_SHORTLIST_FETCH", "2"))

# Debug: write each block's shortlist round count into output row 7
# (read it as out[:, 7, 0] per block via _shortlist_pallas_raw).
_DEBUG_ROUNDS = os.environ.get("PT_SHORTLIST_DEBUG_ROUNDS", "0") == "1"

EPS_TRI = 1e-8  # ray-triangle-intersection.wgsl:5
_INF = jnp.inf
_BIG_F = 3.0e38
_BIG_ID = 1.0e9  # > any triangle id; ids exact in f32 (< 2^24)

BLOCK = int(os.environ.get("PT_SHORTLIST_BLOCK", "128"))  # rays per block
# 128 measured best with the sorted pool (round 5): tighter per-block
# cluster unions beat the halved fixed-cost amortization of 256/512
# (boat 8.6 vs 8.3 Mray/s, refraction 4.4 vs 4.7 s with grid 16).
CLUSTER = 128  # triangles per cluster row (= lane width)

_COMPS = 15  # v0.xyz e1.xyz e2.xyz id valid n.xyz mat_id


def _cluster_table_padded(scene, cluster: int):
    """(table [16, CP*cluster], lo_t [8, CP], hi_t [8, CP]) — C lane-padded.

    Component-major flat table: row j holds component j (v0.xyz e1.xyz
    e2.xyz id valid n.xyz mat_id) for every triangle in packed (BVH-leaf)
    order, so the kernel's per-round cluster "gather" is a [1, cluster]
    slice at a lane-aligned dynamic offset ``cidx * cluster`` — the only
    dynamic VMEM access Mosaic supports cheaply (cf. the working pattern in
    ops/intersect_cluster.py; dynamic *row* loads of a [C, 11*cluster]
    table hit "dynamic load with unaligned indices"). Rows are padded to
    16 for the (8, 128) f32 sublane tile. Cluster axis padded to a
    multiple of 128; degenerate clusters get lo > hi and valid = 0.

    Rows 11-14 (geometric normal + material id) feed the kernel's in-sweep
    winner-attribute extraction (round 5): the winner's n/mat ride the
    output for free instead of a separate two-stage one-hot extraction
    pass (~2.6 ms per 262k wave at 2.5k tris, measured round 4).

    The lo/hi tables' spare sublane rows 3-5 carry the scene root AABB
    (min/max over valid clusters), broadcast across lanes, so the kernel's
    whole-block root pre-test reads two scalars per axis instead of
    reducing over [1, CP] every grid step (ADVICE r4 item 2).
    """
    t = scene.tri_v0.shape[0]
    tp = -(-t // cluster) * cluster
    c = tp // cluster
    cp = -(-c // 128) * 128

    def pad(a, rows):
        if rows == a.shape[0]:
            return a
        return jnp.concatenate(
            [a, jnp.zeros((rows - a.shape[0],) + a.shape[1:], a.dtype)], axis=0
        )

    v0, e1, e2 = (
        pad(scene.tri_v0, tp), pad(scene.tri_e1, tp), pad(scene.tri_e2, tp)
    )
    n = pad(scene.tri_n, tp)
    mat = pad(scene.tri_mat.astype(jnp.float32), tp)
    valid = pad(scene.tri_valid, tp)
    ids = jnp.arange(tp, dtype=jnp.float32)

    rows = [v0[:, 0], v0[:, 1], v0[:, 2],
            e1[:, 0], e1[:, 1], e1[:, 2],
            e2[:, 0], e2[:, 1], e2[:, 2],
            ids, valid.astype(jnp.float32),
            n[:, 0], n[:, 1], n[:, 2], mat]
    table = jnp.stack([pad(r, cp * cluster) for r in rows], axis=0)
    table = jnp.concatenate(
        [table, jnp.zeros((16 - _COMPS, cp * cluster))], axis=0
    )  # [16, CP*cluster]

    pts = jnp.stack([v0, v0 + e1, v0 + e2], axis=1)  # [tp, 3, 3]
    m = valid[:, None, None]
    lo = jnp.where(m, pts, _BIG_F).reshape(c, cluster * 3, 3).min(axis=1)
    hi = jnp.where(m, pts, -_BIG_F).reshape(c, cluster * 3, 3).max(axis=1)
    lo = pad(lo, cp).T  # [3, CP]
    hi = pad(hi, cp).T
    # Padded clusters: lo = 0, hi = 0 would look valid; force lo > hi.
    if cp != c:
        lo = lo.at[:, c:].set(_BIG_F)
        hi = hi.at[:, c:].set(-_BIG_F)
    ok_c = lo[0] <= hi[0]  # [CP] valid-cluster mask
    root_lo = jnp.min(jnp.where(ok_c[None, :], lo, _BIG_F), axis=1)  # [3]
    root_hi = jnp.max(jnp.where(ok_c[None, :], hi, -_BIG_F), axis=1)
    lo8 = jnp.concatenate(
        [lo, jnp.broadcast_to(root_lo[:, None], (3, cp)),
         jnp.zeros((2, cp), lo.dtype)], axis=0
    )
    hi8 = jnp.concatenate(
        [hi, jnp.broadcast_to(root_hi[:, None], (3, cp)),
         jnp.zeros((2, cp), hi.dtype)], axis=0
    )
    return table, lo8, hi8


def _kernel(ray_ref, table_ref, lo_ref, hi_ref, out_ref,
            *, cluster: int, max_rounds: int, any_hit: bool = False,
            fetch: int | None = None):
    block = ray_ref.shape[2]
    cp = lo_ref.shape[1]

    # All seven per-ray inputs ride ONE [1, 8, block] block (rows: o.xyz
    # d.xyz t0 pad), and both outputs ONE [1, 8, block] block (rows: t id):
    # the per-grid-step DMA count — which set a ~1.4 us/block floor when
    # rays arrived as 7 separate [1, 1, block] streams — drops to 2.
    # Rays as [block, 1] columns (sublane axis = rays for the MT tiles).
    ox = ray_ref[0, 0, :].reshape(block, 1)
    oy = ray_ref[0, 1, :].reshape(block, 1)
    oz = ray_ref[0, 2, :].reshape(block, 1)
    dx = ray_ref[0, 3, :].reshape(block, 1)
    dy = ray_ref[0, 4, :].reshape(block, 1)
    dz = ray_ref[0, 5, :].reshape(block, 1)

    best_t0 = ray_ref[0, 6, :].reshape(block, 1)
    t0_cut = best_t0  # original cutoff (any-hit mode compares against it)

    # Whole-block pre-test against the scene's root AABB: a block none of
    # whose rays can reach the root box before its cutoff (the common case
    # for all-parked blocks in the regenerative pool's drain tail, and for
    # shadow blocks whose cutoffs are all short) skips the full [block, CP]
    # slab pass, the resident `enter` matrix, and the round loop entirely —
    # one ~[block, 1] slab + one any() sync instead of ~1.4 us of VPU work.
    # Mirrors the reference's BVH root test (intersection-logic.wgsl:125).
    # Root lo/hi are precomputed per axis on the host and broadcast into
    # lo/hi rows 3-5 (_cluster_table_padded) — no per-grid-step [1, CP]
    # reductions (ADVICE r4 item 2).
    t_near_r = jnp.full((block, 1), -_BIG_F)
    t_far_r = jnp.full((block, 1), _BIG_F)
    for ax, w, o_ax in ((0, dx, ox), (1, dy, oy), (2, dz, oz)):
        mag = jnp.maximum(jnp.abs(w), 1e-12)
        inv = jnp.where(w >= 0.0, 1.0, -1.0) / mag  # [block, 1]
        root_lo = lo_ref[3 + ax, 0]
        root_hi = hi_ref[3 + ax, 0]
        t0 = (root_lo - o_ax) * inv
        t1 = (root_hi - o_ax) * inv
        t_near_r = jnp.maximum(t_near_r, jnp.minimum(t0, t1))
        t_far_r = jnp.minimum(t_far_r, jnp.maximum(t0, t1))
    root_reach = (
        (t_far_r >= t_near_r)
        & (t_far_r > 0.0)
        & (jnp.maximum(t_near_r, 0.0) < best_t0)
    )
    block_live = jnp.any(root_reach)

    @pl.when(jnp.logical_not(block_live))
    def _dead_block():
        out_ref[0, 0, :] = best_t0.reshape(1, block)[0, :]
        out_ref[0, 1, :] = jnp.full((1, block), -1.0)[0, :]
        for r in range(2, 8):
            out_ref[0, r, :] = jnp.zeros((1, block))[0, :]

    @pl.when(block_live)
    def _live_block():
        _kernel_live(
            ox, oy, oz, dx, dy, dz, best_t0, t0_cut,
            table_ref, lo_ref, hi_ref, out_ref,
            cluster=cluster, max_rounds=max_rounds, any_hit=any_hit,
            fetch=fetch, block=block, cp=cp,
        )


def _kernel_live(ox, oy, oz, dx, dy, dz, best_t0, t0_cut,
                 table_ref, lo_ref, hi_ref, out_ref,
                 *, cluster, max_rounds, any_hit, fetch, block, cp):
    # Slab entry distance of every ray to every cluster AABB -> [block, CP]
    # (resident for the whole block; the per-ray improvable cull reads it
    # every round). Same NaN-safe convention as the XLA shortlist.
    t_near = jnp.full((block, cp), -_BIG_F)
    t_far = jnp.full((block, cp), _BIG_F)
    for ax, w, o_ax in ((0, dx, ox), (1, dy, oy), (2, dz, oz)):
        mag = jnp.maximum(jnp.abs(w), 1e-12)
        inv = jnp.where(w >= 0.0, 1.0, -1.0) / mag  # [block, 1]
        lo_row = lo_ref[ax, :].reshape(1, cp)
        hi_row = hi_ref[ax, :].reshape(1, cp)
        t0 = (lo_row - o_ax) * inv
        t1 = (hi_row - o_ax) * inv
        t_near = jnp.maximum(t_near, jnp.minimum(t0, t1))
        t_far = jnp.minimum(t_far, jnp.maximum(t0, t1))
    cluster_ok = (lo_ref[0, :] <= hi_ref[0, :]).reshape(1, cp)
    ok = (t_far >= t_near) & (t_far > 0.0) & cluster_ok
    enter = jnp.where(ok, jnp.maximum(t_near, 0.0), _INF)

    best_id0 = jnp.full((block, 1), -1.0)
    # Winner attributes (geometric normal + material id), extracted inside
    # the sweep that found the winner (see the `better` update below) —
    # replaces the host-side two-stage one-hot extraction for this path.
    # Any-hit mode carries no attrs (t/id are not valid hit records there).
    n_attrs = 0 if any_hit else 4
    attr0 = tuple(jnp.zeros((block, 1)) for _ in range(n_attrs))
    visited0 = jnp.zeros((1, cp), jnp.float32)
    iota_c = jax.lax.broadcasted_iota(jnp.int32, (1, cp), 1)

    def improvable_key(best_t, visited):
        """[1, CP] min-over-rays entry of clusters still improvable for
        *some* ray (exact per-ray cull: enter[b, c] < best_t[b])."""
        useful = (enter < best_t) & (visited == 0.0)
        return jnp.min(jnp.where(useful, enter, _INF), axis=0, keepdims=True)

    def cond(carry):
        go, rounds = carry[-2], carry[-1]
        return go & (rounds < max_rounds)

    def body(carry):
        # ``key`` is carried between rounds (computed once per round, at the
        # bottom) — recomputing it at the top too measurably dominated the
        # per-round cost along with the argmin sync; see PERF_NOTES round 4.
        best_t, best_id, attrs, visited, key, _, rounds = carry

        # Pick the FETCH nearest improvable clusters by iterated argmin on
        # the [1, CP] key (cheap), then sweep them back-to-back: the
        # per-round fixed costs (key rebuild, go-check, loop bookkeeping)
        # amortize over FETCH cluster sweeps. Blocks needing fewer than
        # FETCH clusters sweep already-culled ones redundantly on their
        # last round — wasted but correct (strict `better` update).
        for _f in range(fetch):
            cidx = jnp.argmin(key[0, :])  # nearest improvable (sync)
            visited = jnp.where(iota_c == cidx, 1.0, visited)
            key = jnp.where(iota_c == cidx, _INF, key)

            start = pl.multiple_of(cidx * cluster, cluster)

            def comp(j, start=start):
                # [1, cluster] load at a lane-aligned dynamic offset
                # (static sublane row) — see _cluster_table_padded for why
                # this is the one dynamic-gather shape Mosaic lowers.
                return table_ref[j : j + 1, pl.ds(start, cluster)]

            ax_, ay, az = comp(0), comp(1), comp(2)
            bx, by, bz = comp(3), comp(4), comp(5)
            cx, cy, cz = comp(6), comp(7), comp(8)
            tid, tval = comp(9), comp(10)

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
            hit_ok = (
                (jnp.abs(det) > EPS_TRI)
                & (u >= 0.0) & (u <= 1.0)
                & (v >= 0.0) & (u + v <= 1.0)
                & (t > EPS_TRI) & (tval > 0.5)
            )
            t = jnp.where(hit_ok, t, _INF)  # [block, cluster]
            tile_t = jnp.min(t, axis=1, keepdims=True)  # [block, 1]
            tile_id = jnp.min(
                jnp.where(t == tile_t, tid, _BIG_ID), axis=1, keepdims=True
            )
            better = tile_t < best_t
            best_t = jnp.where(better, tile_t, best_t)
            best_id = jnp.where(better, tile_id, best_id)
            if not any_hit:
                # In-sweep winner-attribute extraction: the winning column
                # is uniquely identified by (t == tile_t) & (id == tile_id)
                # (min-id tie-break), so a masked sum selects exactly one
                # value per attribute — the winner's n/mat_id come out of
                # the sweep that found it, no later extraction pass.
                win = (t == tile_t) & (tid == tile_id)
                new_attrs = []
                for j, a in enumerate(attrs):
                    row = comp(11 + j)  # n.x n.y n.z mat_id
                    sel = jnp.sum(
                        jnp.where(win, row, 0.0), axis=1, keepdims=True
                    )
                    new_attrs.append(jnp.where(better, sel, a))
                attrs = tuple(new_attrs)

        if any_hit:
            # Occlusion mode: any hit before the cutoff (best_t improved at
            # least once, since it started AT the cutoff) finishes the ray.
            # Forcing best_t to 0 retires it from every cluster's improvable
            # set (enter >= 0 always) while keeping t < t_cut true for the
            # caller. The closest-hit contract is given up — only the
            # occluded_* wrappers may set this.
            best_t = jnp.where(best_t < t0_cut, 0.0, best_t)

        key = improvable_key(best_t, visited)
        go = jnp.isfinite(jnp.min(key))
        return best_t, best_id, attrs, visited, key, go, rounds + 1

    key0 = improvable_key(best_t0, visited0)
    go0 = jnp.isfinite(jnp.min(key0))
    best_t, best_id, attrs, _, _, _, rounds = jax.lax.while_loop(
        cond, body,
        (best_t0, best_id0, attr0, visited0, key0, go0, jnp.int32(0)),
    )

    out_ref[0, 0, :] = best_t.reshape(1, block)[0, :]
    out_ref[0, 1, :] = best_id.reshape(1, block)[0, :]
    for j in range(n_attrs):  # n.x n.y n.z mat_id
        out_ref[0, 2 + j, :] = attrs[j].reshape(1, block)[0, :]
    for r in range(2 + n_attrs, 7):
        out_ref[0, r, :] = jnp.zeros((1, block))[0, :]
    if _DEBUG_ROUNDS:
        out_ref[0, 7, :] = jnp.full((1, block), rounds.astype(jnp.float32))[0, :]
    else:
        out_ref[0, 7, :] = jnp.zeros((1, block))[0, :]


@functools.partial(
    jax.jit, static_argnames=("block", "cluster", "interpret", "any_hit", "fetch")
)
def _shortlist_pallas_raw(
    scene,
    o,
    d,
    t_init=None,
    block: int = BLOCK,
    cluster: int = CLUSTER,
    interpret: bool = False,
    any_hit: bool = False,
    fetch: int | None = None,
):
    """Closest triangle hit -> (t [B] f32 — inf on miss, tri_id [B] i32 —
    -1 on miss). Exact match with ``intersect.closest_tri_brute`` when
    ``any_hit=False`` (the default).

    ``t_init`` (optional [B]) caps the search exactly as in the XLA
    shortlist: only hits strictly before it are found; the occlusion
    variant starts best_t at the shadow cutoff so far clusters are never
    swept.

    ``any_hit=True`` DELIBERATELY BREAKS the closest-hit contract: a ray is
    retired as soon as *any* triangle lands before its ``t_init`` cutoff by
    forcing its t to 0, so the returned t/id are NOT valid hit records —
    only "t < cutoff" is meaningful. Reserved for the ``occluded_*``
    wrappers (ADVICE r4 item 3).
    """
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

    fetch = FETCH_DEFAULT if fetch is None else fetch
    table, lo8, hi8 = _cluster_table_padded(scene, cluster)
    cp = lo8.shape[1]
    max_rounds = -(-cp // fetch)  # exactness backstop: all clusters visitable

    t0 = (
        jnp.full((bp,), _INF, jnp.float32)
        if t_init is None
        else t_init.astype(jnp.float32)
    )

    # Pack the seven per-ray streams into one [NB, 8, block] array (rows:
    # o.xyz d.xyz t0 pad) so each grid step moves ONE input DMA and ONE
    # output DMA instead of nine — the per-block overhead floor measured
    # ~1.4 us/block with separate streams (docs/PERF_NOTES.md round 4).
    packed = (
        jnp.stack(
            [o[:, 0], o[:, 1], o[:, 2], d[:, 0], d[:, 1], d[:, 2], t0,
             jnp.zeros((bp,), jnp.float32)],
            axis=0,
        )
        .reshape(8, nb, block)
        .transpose(1, 0, 2)
    )

    # [NB, 8, block] layout: the Mosaic lowering requires the last two
    # block dims divisible by (8, 128) or equal to the array dims; NB is
    # the grid axis.
    ray_spec = pl.BlockSpec(
        (1, 8, block), lambda i: (i, 0, 0), memory_space=pltpu.VMEM
    )
    full = pl.BlockSpec(memory_space=pltpu.VMEM)
    out = pl.pallas_call(
        functools.partial(
            _kernel, cluster=cluster, max_rounds=max_rounds, any_hit=any_hit,
            fetch=fetch,
        ),
        grid=(nb,),
        in_specs=[ray_spec, full, full, full],
        out_specs=ray_spec,
        out_shape=jax.ShapeDtypeStruct((nb, 8, block), jnp.float32),
        interpret=interpret,
    )(packed, table, lo8, hi8)
    t_out = out[:, 0, :].reshape(bp)[:b]
    id_out = out[:, 1, :].reshape(bp)[:b].astype(jnp.int32)
    return t_out, jnp.where(jnp.isfinite(t_out), id_out, -1), out


def closest_tri_shortlist_pallas(
    scene,
    o,
    d,
    t_init=None,
    block: int = BLOCK,
    cluster: int = CLUSTER,
    interpret: bool = False,
    any_hit: bool = False,
    fetch: int | None = None,
):
    t, tri_id, _ = _shortlist_pallas_raw(
        scene, o, d, t_init=t_init, block=block, cluster=cluster,
        interpret=interpret, any_hit=any_hit, fetch=fetch,
    )
    return t, tri_id


def closest_tri_shortlist_pallas_attrs(
    scene,
    o,
    d,
    t_init=None,
    block: int = BLOCK,
    cluster: int = CLUSTER,
    interpret: bool = False,
    fetch: int | None = None,
):
    """Closest hit WITH winner attributes -> (t [B], tri_id [B] i32,
    n_geo [B, 3], mat_id [B] i32).

    The attributes are extracted inside the kernel's winning sweep (masked
    sum over the winner column) — no host-side one-hot extraction pass.
    Miss lanes return n = 0 (callers sanitize) and mat_id = 0.
    """
    t, tri_id, out = _shortlist_pallas_raw(
        scene, o, d, t_init=t_init, block=block, cluster=cluster,
        interpret=interpret, any_hit=False, fetch=fetch,
    )
    b = o.shape[0]
    bp = out.shape[0] * out.shape[2]
    # Row slices reshape freely ([nb, block] keeps the lane axis minor);
    # the [B] -> [B, 3] stack is cheap (~0.1 ms/262k) where a
    # [nb, 3, block] -> [bp, 3] transpose relayouts tiles (~4.3 ms).
    nx = out[:, 2, :].reshape(bp)[:b]
    ny = out[:, 3, :].reshape(bp)[:b]
    nz = out[:, 4, :].reshape(bp)[:b]
    n_geo = jnp.stack([nx, ny, nz], axis=-1)
    mat_id = out[:, 5, :].reshape(bp)[:b].astype(jnp.int32)
    return t, tri_id, n_geo, mat_id


def occluded_tri_shortlist_pallas(
    scene, o, d, t_cut, block: int = BLOCK, cluster: int = CLUSTER,
    interpret: bool = False,
):
    """Shadow occlusion -> occluded [B] bool (some triangle strictly before
    ``t_cut``); cf. ``intersect_shortlist.occluded_tri_shortlist``.

    Runs the kernel in any-hit mode: a ray exits as soon as *any* triangle
    lands before the cutoff (the closest-hit refinement occlusion never
    needed), the same early-out as the reference shadow query's
    ``return true`` on first accepted hit semantics.
    """
    t, _ = closest_tri_shortlist_pallas(
        scene, o, d, t_init=t_cut, block=block, cluster=cluster,
        interpret=interpret, any_hit=True,
    )
    return t < t_cut
