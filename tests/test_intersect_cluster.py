"""Cluster-culled Pallas intersector vs the brute-sweep oracle.

The kernel (ops.intersect_cluster) must agree exactly with
``closest_tri_brute`` on hit masks, distances, and winning triangle ids —
cluster culling is a pure optimization and may never change results.
Runs in Pallas interpret mode on the CPU test platform.
"""

import numpy as np
import pytest


@pytest.fixture(scope="module")
def cornell():
    from pathtracer_tpu.models.procedural import cornell_box_scene

    scene, camera = cornell_box_scene()
    return scene, camera


def _random_rays(rng, b, lo=-2.0, hi=2.0):
    import jax.numpy as jnp

    o = rng.uniform(lo, hi, (b, 3)).astype(np.float32)
    d = rng.normal(size=(b, 3))
    d /= np.linalg.norm(d, axis=1, keepdims=True)
    return jnp.asarray(o), jnp.asarray(d.astype(np.float32))


def test_cluster_matches_brute_cornell(cornell, rng_np):
    from pathtracer_tpu.ops.intersect import closest_tri_brute
    from pathtracer_tpu.ops.intersect_cluster import closest_tri_cluster

    scene, _ = cornell
    o, d = _random_rays(rng_np, 256)
    t0, id0 = closest_tri_brute(scene, o, d)
    t1, id1 = closest_tri_cluster(scene, o, d, interpret=True)
    t0, t1, id0, id1 = map(np.asarray, (t0, t1, id0, id1))
    hit = np.isfinite(t0)
    assert np.array_equal(hit, np.isfinite(t1))
    assert np.allclose(t0[hit], t1[hit], rtol=1e-5, atol=1e-6)
    assert np.array_equal(id0[hit], id1[hit])


def test_cluster_handles_ray_padding(cornell, rng_np):
    """Batch sizes that are not RAY_BLOCK multiples pad with miss rays."""
    from pathtracer_tpu.ops.intersect import closest_tri_brute
    from pathtracer_tpu.ops.intersect_cluster import closest_tri_cluster

    scene, _ = cornell
    o, d = _random_rays(rng_np, 100)
    t0, _ = closest_tri_brute(scene, o, d)
    t1, _ = closest_tri_cluster(scene, o, d, interpret=True)
    t0, t1 = np.asarray(t0), np.asarray(t1)
    assert t1.shape == (100,)
    hit = np.isfinite(t0)
    assert np.allclose(t0[hit], t1[hit], rtol=1e-5, atol=1e-6)


def test_degenerate_all_padding_cluster_is_masked(cornell, rng_np):
    """A cluster made entirely of padding triangles must be culled by the
    kernel's explicit lo <= hi mask (ADVICE r1 #1): results still agree
    with brute on the un-padded geometry."""
    import jax.numpy as jnp

    from pathtracer_tpu.ops.intersect import closest_tri_brute
    from pathtracer_tpu.ops.intersect_cluster import closest_tri_cluster

    scene, _ = cornell
    tp = 1024  # cornell pads to 128 tris -> second cluster is all padding

    def pad(a, fill=0):
        a = np.asarray(a)
        ext = np.full((tp - a.shape[0],) + a.shape[1:], fill, a.dtype)
        return jnp.asarray(np.concatenate([a, ext], axis=0))

    scene2 = scene.replace(
        tri_v0=pad(scene.tri_v0),
        tri_e1=pad(scene.tri_e1),
        tri_e2=pad(scene.tri_e2),
        tri_n=pad(scene.tri_n),
        tri_vn=pad(scene.tri_vn),
        tri_mat=pad(scene.tri_mat),
        tri_valid=pad(scene.tri_valid),
    )
    o, d = _random_rays(rng_np, 128)
    t0, id0 = closest_tri_brute(scene, o, d)
    t1, id1 = closest_tri_cluster(scene2, o, d, interpret=True)
    t0, t1, id0, id1 = map(np.asarray, (t0, t1, id0, id1))
    hit = np.isfinite(t0)
    assert np.array_equal(hit, np.isfinite(t1))
    assert np.allclose(t0[hit], t1[hit], rtol=1e-5, atol=1e-6)
    assert np.array_equal(id0[hit], id1[hit])


def test_cluster_bounds_cover_valid_tris(cornell):
    from pathtracer_tpu.ops.intersect_cluster import (
        CLUSTER,
        _pad_tris,
        cluster_bounds,
    )

    scene, _ = cornell
    tp = (scene.padded_tris + CLUSTER - 1) // CLUSTER * CLUSTER
    v0 = _pad_tris(scene.tri_v0, tp)
    e1 = _pad_tris(scene.tri_e1, tp)
    e2 = _pad_tris(scene.tri_e2, tp)
    valid = _pad_tris(scene.tri_valid, tp)
    lo, hi = (np.asarray(a) for a in cluster_bounds(v0, e1, e2, valid))
    v0, e1, e2, valid = map(np.asarray, (v0, e1, e2, valid))
    for c in range(lo.shape[0]):
        sl = slice(c * CLUSTER, (c + 1) * CLUSTER)
        vm = valid[sl]
        if not vm.any():
            # Degenerate marker the kernel's explicit lo <= hi mask keys
            # on (the slab min/max alone would swap the bounds and pass).
            assert (lo[c] > hi[c]).any()
            continue
        pts = np.concatenate(
            [v0[sl][vm], (v0 + e1)[sl][vm], (v0 + e2)[sl][vm]], axis=0
        )
        assert (pts >= lo[c] - 1e-6).all() and (pts <= hi[c] + 1e-6).all()
