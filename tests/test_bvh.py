"""BVH construction invariants (SURVEY.md §4: every triangle reachable,
no overlap between leaves — the property class that catches the reference's
"triangles sometimes missing" traversal bug)."""

import numpy as np

from pathtracer_tpu.models.bvh import build_bvh, bvh_depth


def random_tris(rng, n):
    v0 = rng.uniform(-10, 10, size=(n, 3))
    v1 = v0 + rng.uniform(-1, 1, size=(n, 3))
    v2 = v0 + rng.uniform(-1, 1, size=(n, 3))
    lo = np.minimum(np.minimum(v0, v1), v2)
    hi = np.maximum(np.maximum(v0, v1), v2)
    return lo, hi


class TestBuild:
    def test_permutation_covers_all(self, rng_np):
        lo, hi = random_tris(rng_np, 1000)
        bvh = build_bvh(lo, hi)
        assert sorted(bvh.prim_order.tolist()) == list(range(1000))

    def test_leaf_ranges_partition(self, rng_np):
        lo, hi = random_tris(rng_np, 500)
        bvh = build_bvh(lo, hi, max_leaf=4)
        covered = np.zeros(500, dtype=int)
        for n in range(bvh.num_nodes):
            for s in range(2):
                if bvh.child[n, s] < 0:
                    a, c = bvh.leaf_start[n, s], bvh.leaf_count[n, s]
                    covered[a : a + c] += 1
        assert (covered == 1).all()

    def test_child_bounds_contain_leaf_prims(self, rng_np):
        lo, hi = random_tris(rng_np, 300)
        bvh = build_bvh(lo, hi, max_leaf=4)
        order = bvh.prim_order
        for n in range(bvh.num_nodes):
            for s in range(2):
                if bvh.child[n, s] < 0 and bvh.leaf_count[n, s] > 0:
                    a, c = bvh.leaf_start[n, s], bvh.leaf_count[n, s]
                    ids = order[a : a + c]
                    assert (lo[ids] >= bvh.bounds_lo[n, s] - 1e-5).all()
                    assert (hi[ids] <= bvh.bounds_hi[n, s] + 1e-5).all()

    def test_internal_bounds_contain_children(self, rng_np):
        lo, hi = random_tris(rng_np, 300)
        bvh = build_bvh(lo, hi, max_leaf=4)
        for n in range(bvh.num_nodes):
            for s in range(2):
                c = bvh.child[n, s]
                if c >= 0:
                    child_lo = bvh.bounds_lo[c].min(axis=0)
                    child_hi = bvh.bounds_hi[c].max(axis=0)
                    assert (child_lo >= bvh.bounds_lo[n, s] - 1e-5).all()
                    assert (child_hi <= bvh.bounds_hi[n, s] + 1e-5).all()

    def test_single_leaf_scene(self):
        lo = np.zeros((3, 3))
        hi = np.ones((3, 3))
        bvh = build_bvh(lo, hi, max_leaf=8)
        assert bvh.num_nodes == 1
        assert bvh.leaf_count[0, 0] == 3
        assert bvh.leaf_count[0, 1] == 0

    def test_leaf_size_respected(self, rng_np):
        lo, hi = random_tris(rng_np, 2000)
        bvh = build_bvh(lo, hi, max_leaf=8)
        assert bvh.max_leaf_size <= 8 or bvh.num_nodes == 1

    def test_depth_reasonable(self, rng_np):
        lo, hi = random_tris(rng_np, 4096)
        bvh = build_bvh(lo, hi, max_leaf=8)
        d = bvh_depth(bvh)
        # SAH over uniform input should stay near log2(n/leaf).
        assert d <= 24

    def test_identical_centroids(self):
        # Degenerate case: all boxes identical -> median split must make
        # progress, not recurse forever.
        lo = np.zeros((100, 3))
        hi = np.ones((100, 3))
        bvh = build_bvh(lo, hi, max_leaf=4)
        assert sorted(bvh.prim_order.tolist()) == list(range(100))


class TestPackedScene:
    def test_cornell_pack(self, cornell_scene):
        scene, _, _ = cornell_scene
        assert scene.num_tris == 36
        assert scene.padded_tris % 128 == 0
        assert int(scene.num_emissive) == 2  # light quad -> 2 triangles
        # Padding triangles are degenerate.
        import numpy as np

        e1 = np.asarray(scene.tri_e1[scene.num_tris :])
        assert np.all(e1 == 0.0)

    def test_emissive_table_matches_materials(self, cornell_scene):
        import numpy as np

        scene, _, _ = cornell_scene
        ke = np.asarray(scene.mat_Ke)
        tri_mat = np.asarray(scene.tri_mat)
        n_e = int(scene.num_emissive)
        for tri in np.asarray(scene.emissive_tri)[:n_e]:
            assert ke[tri_mat[tri]].sum() > 0
