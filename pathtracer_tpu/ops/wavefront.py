"""Regenerative wavefront renderer.

The fixed-depth scan integrator (ops.integrator) pays ``max_depth`` bounces
for every path even though the average CornellBox path dies after ~3.5
(emissive hit, escape, or Russian roulette) — most lanes are masked-dead
most of the time. This renderer keeps a pool of B lanes *always busy*:
whenever a lane's path terminates, the lane immediately accumulates the
path's radiance and loads its next ray. Utilization stays near 100% and
wall-clock drops by roughly the ratio of max_depth to mean path length
(~4x on the headline workload).

This is the classic GPU "path regeneration" wavefront, reshaped for the TPU:
the pool is a flat SoA batch, regeneration is a masked prefix-sum id
assignment (no compaction/sorting), and the loop is a ``lax.while_loop``
that exits when the ray counter is exhausted and every lane is idle.
Because all randomness is counter-based on (pixel, sample) (ops.rng), the
result is identical in distribution — and per-ray identical — to the scan
integrator; only float accumulation order differs.

Two levels of regeneration keep the image scatter (the pool's dominant
device cost — ~53% of device time at round 2, row-count bound at ~67 M
rows/s however many rows are masked) off the critical path:

- **sample groups**: a lane claims a *group* of G ray ids strided
  ``total/G`` apart. Because the stride is a multiple of ``n_pixels``,
  all G paths hit the same pixel, so the lane pre-sums their radiance in
  a register and flushes ONCE per group — a G-fold cut in scatter rows.
  In-group respawns bypass the flush/counter machinery entirely.
- **hold-and-flush**: finished groups *hold* until their W-way flush slot
  frees up, shrinking the per-iteration scatter to [B/W] rows.

Gradients: use the scan integrator (this loop is inference-only; while_loop
is not reverse-differentiable).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from pathtracer_tpu.ops import rng
from pathtracer_tpu.ops.camera_rays import generate_rays
from pathtracer_tpu.ops.integrator import bounce_core

# Flush-group width: each group of W lanes (strided B/W apart) flushes at
# most one finished sample-group per iteration, shrinking the image scatter
# to [B/W] rows. Group completions arrive at ~1/(G * mean_path_len) per
# lane-iteration, so capacity 1/W must stay above that with margin (a
# throttled flush queue inflates the iteration count instead).
_FLUSH_WAYS = {1: 4, 2: 8, 4: 8}
# Max sample-group size: G paths of one pixel per lane claim. Larger G cuts
# scatter rows further but concentrates the per-claim work distribution
# (sum of G path lengths), inflating the drain tail.
_MAX_GROUP = 4


def _pick_group(total: int, n_pixels: int, sample_group) -> int:
    """Sample-group size G: ids l and l + total/G must share a pixel, i.e.
    total/G % n_pixels == 0 — G must divide the whole sample-wave count."""
    if sample_group is not None:
        return sample_group
    if total % n_pixels != 0:
        return 1
    waves = total // n_pixels
    g = 1
    while g < _MAX_GROUP and waves % (g * 2) == 0:
        g *= 2
    return g


@functools.partial(
    jax.jit,
    static_argnames=(
        "settings", "n_pixels", "batch", "rays_per_pixel", "sample_offset",
        "n_ids", "sample_group", "flush_ways",
    ),
)
def render_pool(
    scene,
    frame,
    settings,
    n_pixels: int,
    batch: int,
    rays_per_pixel: int,
    sample_offset: int = 0,
    id_offset=None,
    id_limit=None,
    n_ids: int | None = None,
    sample_group: int | None = None,
    flush_ways: int | None = None,
):
    """Trace ``n_pixels * rays_per_pixel`` paths -> (image [P, 3] radiance sum,
    rays_traced, iterations).

    Ray ids are sample-major: id = sample * P + pixel, so any contiguous id
    range covers whole sample waves first — matching the scan renderer's
    progressive order for checkpointing. ``sample_offset`` shifts the sample
    indices so chunked/resumed renders reproduce the straight-through result.

    Sharding hooks (parallel.render.render_pool_sharded): the pool can own
    an arbitrary slice of the global ray-id space. ``n_ids`` (static) is the
    slice length (default: all ids), ``id_offset`` (traced u32, e.g. derived
    from ``lax.axis_index``) shifts local ids to global ones, and
    ``id_limit`` (traced u32) caps the count actually spawned (for a ragged
    final slice). Because all randomness is counter-based on the *global*
    (pixel, sample), per-path radiance is bit-identical however the id space
    is sliced.

    ``sample_group``/``flush_ways`` override the auto-chosen G/W (see module
    docstring); they exist for benchmarking, not normal use.
    """
    total = n_ids if n_ids is not None else n_pixels * rays_per_pixel
    limit = jnp.uint32(total if id_limit is None else id_limit)
    offset = jnp.uint32(0 if id_offset is None else id_offset)

    # Sample-group size G and id stride. The stride is a multiple of
    # n_pixels whenever G > 1, so a lane's G strided ids share one pixel
    # regardless of ``id_offset`` ((offset + l + stride) % P == (offset +
    # l) % P). Groups are indexed by their first local id c in [0, stride).
    g_len = _pick_group(total, n_pixels, sample_group)
    stride = total // g_len
    w = flush_ways if flush_ways is not None else _FLUSH_WAYS.get(g_len, 8)

    b = min(batch, stride)
    b += (-b) % w  # W-way flush groups; extra lanes stay idle

    def spawn(ray_ids):
        """Camera rays for [B] *local* ray ids."""
        gids = ray_ids + offset
        pixel = (gids % n_pixels).astype(jnp.uint32)
        sample = (gids // n_pixels).astype(jnp.uint32) + jnp.uint32(sample_offset)
        jitter = rng.pixel_jitter(settings, pixel, sample)
        o, d = generate_rays(frame, settings.width, settings.height, pixel, jitter)
        return pixel, sample, o, d

    # Initial fill: lanes claim groups 0..b-1 (first id = group index).
    ids0 = jnp.arange(b, dtype=jnp.uint32)
    pixel, sample, o, d = spawn(ids0)

    # Inits must be *data-dependent* on the (possibly shard_map-varying)
    # ray state so the while_loop carry in/out types match — constant
    # zeros/ones fold to replicated types and lose the varying axis.
    zero3 = (o + d) * 0.0
    zero = zero3[:, 0]
    vary_u32 = offset * jnp.uint32(0)

    glimit = jnp.minimum(limit, jnp.uint32(stride))  # valid group ids

    state = dict(
        o=o,
        d=d,
        beta=zero3 + 1.0,
        radiance=zero3,
        accum=zero3,
        alive=ids0 < glimit,
        holding=zero != 0.0,
        spec=zero != 0.0,
        pixel=pixel,
        cur_id=ids0 + vary_u32,
        sample=sample,
        depth=zero.astype(jnp.int32),
        image=jnp.zeros((n_pixels, 3), jnp.float32) + zero3[0] * 0.0,
        next_id=jnp.uint32(b) + vary_u32,
        n_rays=jnp.sum(zero),
        iters=jnp.int32(0) + vary_u32.astype(jnp.int32),
    )

    def cond(st):
        return jnp.any(st["alive"] | st["holding"])

    def body(st):
        o, d, beta, radiance, alive, spec, n = bounce_core(
            scene,
            settings,
            st["o"],
            st["d"],
            st["beta"],
            st["radiance"],
            st["alive"],
            st["spec"],
            st["pixel"],
            st["sample"],
            st["depth"],
        )
        depth = st["depth"] + 1
        # Depth cap (reference: while depth <= 16 -> max_depth bounces).
        alive = alive & (depth < settings.max_depth)

        # Terminated paths bank their radiance into the lane's per-pixel
        # accumulator (per-channel clamp as in the reference accumulator,
        # program-raymarch.ts:283-285 — per *sample*, before summation).
        died = st["alive"] & ~alive
        accum = st["accum"] + jnp.where(
            died[:, None], jnp.maximum(radiance, 0.0), 0.0
        )

        # In-group respawn: the lane's next strided id (same pixel, later
        # sample wave) — no flush, no counter traffic. next_l >= limit also
        # covers the end of the group (c + G*stride = c + total >= limit).
        next_l = st["cur_id"] + jnp.uint32(stride)
        regen = died & (next_l < limit)
        cur_id = jnp.where(regen, next_l, st["cur_id"])

        # Group-complete lanes *hold* their accumulated pixel sum until
        # their W-way flush slot frees up. The image scatter-add is
        # row-count bound on TPU (~67 M rows/s on v5e, regardless of
        # target size or how many rows are masked), so flushing all B
        # lanes every iteration costs ~45% of the loop; the W-way slots
        # cut it to [B/W] rows. Completions arrive at ~1/(G*path_len) per
        # lane-iter < 1/W, so the hold queue drains; an unflushed lane
        # just reclaims a little later.
        holding = st["holding"] | (died & ~regen)
        # Group lane i with lanes i + k*B/W (W-way): strided slices keep
        # the TPU lane layout intact (a [B] -> [B/W, W] reshape would
        # relayout the 128-wide lane axis and cost more than the scatter
        # saves). The first holding lane of each W-group flushes.
        group = b // w
        taken = jnp.zeros((group,), bool)
        row_pix = jnp.full((group,), n_pixels, dtype=jnp.uint32)  # drop row
        row_val = jnp.zeros((group, 3), jnp.float32)
        sels = []
        for k in range(w):
            h_k = holding[k * group : (k + 1) * group]
            sel_k = h_k & ~taken
            taken = taken | sel_k
            row_pix = jnp.where(
                sel_k, st["pixel"][k * group : (k + 1) * group], row_pix
            )
            row_val = jnp.where(
                sel_k[:, None], accum[k * group : (k + 1) * group], row_val
            )
            sels.append(sel_k)
        selected = jnp.concatenate(sels)
        image = st["image"].at[row_pix].add(row_val, mode="drop")

        # Flushed lanes claim fresh groups from the global counter.
        rank = jnp.cumsum(selected.astype(jnp.uint32)) - 1
        new_ids = st["next_id"] + rank
        take = selected & (new_ids < glimit)
        next_id = jnp.minimum(
            st["next_id"] + jnp.sum(selected.astype(jnp.uint32)), glimit
        )

        fresh = regen | take
        cur_id = jnp.where(take, new_ids, cur_id)
        n_pixel, n_sample, n_o, n_d = spawn(cur_id)
        sel = fresh[:, None]
        return dict(
            o=jnp.where(sel, n_o, o),
            d=jnp.where(sel, n_d, d),
            beta=jnp.where(sel, 1.0, beta),
            radiance=jnp.where(sel, 0.0, radiance),
            accum=jnp.where(take[:, None], 0.0, accum),
            alive=alive | fresh,
            holding=holding & ~selected,
            spec=jnp.where(fresh, False, spec),
            pixel=jnp.where(fresh, n_pixel, st["pixel"]),
            cur_id=cur_id,
            sample=jnp.where(fresh, n_sample, st["sample"]),
            depth=jnp.where(fresh, 0, depth),
            image=image,
            next_id=next_id,
            n_rays=st["n_rays"] + n,
            iters=st["iters"] + 1,
        )

    state = jax.lax.while_loop(cond, body, state)
    return state["image"], state["n_rays"], state["iters"]


def render_regenerative_stats(scene, camera, settings):
    """Full render via the regenerative pool -> (mean radiance [H, W, 3],
    n_rays traced, pool iterations)."""
    frame = {
        k: jnp.asarray(v)
        for k, v in camera.ray_frame(settings.width, settings.height).items()
    }
    n_pixels = settings.width * settings.height
    image, n_rays, iters = render_pool(
        scene,
        frame,
        settings,
        n_pixels=n_pixels,
        batch=min(settings.batch_size, n_pixels * settings.samples_per_pixel),
        rays_per_pixel=settings.samples_per_pixel,
    )
    mean = image / settings.samples_per_pixel
    return mean.reshape(settings.height, settings.width, 3), n_rays, iters


def render_regenerative(scene, camera, settings):
    """Full render via the regenerative pool -> mean radiance [H, W, 3]."""
    return render_regenerative_stats(scene, camera, settings)[0]
