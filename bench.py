"""Benchmark harness: rays/sec/chip on the CornellBox headline workload.

Prints ONE JSON line:
    {"metric": ..., "value": N, "unit": ..., "vs_baseline": N, ...}

The reference publishes no numbers (BASELINE.md: "published": {}); the
baseline constant below is a nominal WebGPU-class figure for this workload
(one ray segment = one closest-hit or shadow-ray traversal), so vs_baseline
is a speedup ratio against the class of hardware the reference ran on.

Workload: CornellBox (procedural twin of scene_assets CornellBox-Original),
512x512, progressive sample waves, full GI integrator, rr=0.9, depth<=17 —
matching scene_files/final/cornell_box_full_lighting.ini. Ray counts are
the integrator's real live-lane counters, not grid size.
"""

from __future__ import annotations

import argparse
import json
import time

# Nominal reference-class throughput (WebGPU student path tracer on a
# desktop GPU): ~20 M ray segments/s. No published figure exists
# (BASELINE.md); this anchors vs_baseline as a hardware-class speedup.
BASELINE_RAYS_PER_SEC = 2.0e7


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--size", type=int, default=512)
    p.add_argument("--spp", type=int, default=16)
    p.add_argument(
        "--scene",
        default="cornell",
        choices=("cornell", "boat"),
        help="cornell: procedural CornellBox twin (36 tris); "
        "boat: MedievalBoat.xml large-mesh stressor (12.5k tris)",
    )
    p.add_argument("--warmup", type=int, default=2)
    p.add_argument("--intersector", default="auto")
    p.add_argument("--scheduler", default="regen", choices=("regen", "scan"))
    p.add_argument("--mse", action="store_true", help="also report MSE vs golden")
    args = p.parse_args()

    import jax
    import jax.numpy as jnp

    from pathtracer_tpu.models.procedural import cornell_box_scene
    from pathtracer_tpu.models.scene import RenderSettings
    from pathtracer_tpu.ops import rng
    from pathtracer_tpu.ops.camera_rays import generate_rays
    from pathtracer_tpu.ops.integrator import radiance_batch_stats

    if args.scene == "boat":
        from pathtracer_tpu.models.scene import scene_from_graph
        from pathtracer_tpu.models.scenegraph import load_scenegraph

        graph = load_scenegraph("/root/reference/scene_assets/MedievalBoat.xml")
        scene, camera = scene_from_graph(
            graph, "/root/reference/scene_assets"
        )
    else:
        scene, camera = cornell_box_scene()
    settings = RenderSettings(
        width=args.size,
        height=args.size,
        samples_per_pixel=args.spp,
        intersector=args.intersector,
        scheduler=args.scheduler,
    )
    frame = {
        k: jnp.asarray(v)
        for k, v in camera.ray_frame(args.size, args.size).items()
    }
    n_pixels = args.size * args.size
    pixel_ids = jnp.arange(n_pixels, dtype=jnp.uint32)

    import functools

    @functools.partial(jax.jit, static_argnames=())
    def wave(scene, frame, sample_idx):
        sample_ids = jnp.full((n_pixels,), sample_idx, dtype=jnp.uint32)
        jitter = rng.pixel_jitter_hash(pixel_ids, sample_ids)
        o, d = generate_rays(frame, args.size, args.size, pixel_ids, jitter)
        rad, n_rays = radiance_batch_stats(
            scene, settings, o, d, pixel_ids, sample_ids
        )
        return jnp.maximum(rad, 0.0), n_rays

    if args.scheduler == "regen":
        from pathtracer_tpu.ops.wavefront import render_pool

        def run():
            img, n_rays, iters = render_pool(
                scene,
                frame,
                settings,
                n_pixels=n_pixels,
                batch=min(settings.batch_size, n_pixels * args.spp),
                rays_per_pixel=args.spp,
            )
            jax.block_until_ready(img)
            return float(n_rays)

        run()  # compile
        t0 = time.perf_counter()
        total_rays = run()
        dt = time.perf_counter() - t0
    else:
        # Warmup (compile) then timed samples.
        for s in range(args.warmup):
            r, n = wave(scene, frame, jnp.uint32(s))
            jax.block_until_ready(r)

        acc = jnp.zeros((n_pixels, 3))
        total_rays = 0.0
        t0 = time.perf_counter()
        for s in range(args.spp):
            r, n = wave(scene, frame, jnp.uint32(s))
            acc = acc + r
        jax.block_until_ready(acc)
        dt = time.perf_counter() - t0
        # Ray counts are deterministic per sample; fetch after timing.
        for s in range(args.spp):
            _, n = wave(scene, frame, jnp.uint32(s))
            total_rays += float(n)

    rays_per_sec = total_rays / dt
    result = {
        "metric": "rays_per_sec_per_chip",
        "value": round(rays_per_sec, 1),
        "unit": "rays/s",
        "vs_baseline": round(rays_per_sec / BASELINE_RAYS_PER_SEC, 3),
        "workload": f"{args.scene}_{args.size}x{args.size}_spp{args.spp}",
        "paths_per_sec": round(n_pixels * args.spp / dt, 1),
        "wall_s": round(dt, 3),
        "device": str(jax.devices()[0]),
        "intersector": args.intersector,
        "scheduler": args.scheduler,
    }
    print(json.dumps(result))


if __name__ == "__main__":
    main()
