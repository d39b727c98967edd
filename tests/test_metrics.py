"""Metric tests: AJI+/AJI/PQ/Dice semantics on hand-checkable cases."""

import numpy as np

from microbeseg_tpu.evaluation.metrics import (
    get_dice_1,
    get_fast_aji,
    get_fast_aji_plus,
    get_fast_dice_2,
    get_fast_pq,
    remap_label,
)


def two_cells(shift=0):
    m = np.zeros((40, 40), np.int32)
    m[5:15, 5:15] = 1
    m[25 + shift:35 + shift, 5:15] = 2
    return m


class TestAJIPlus:
    def test_perfect(self):
        m = two_cells()
        assert get_fast_aji_plus(m, m) == 1.0

    def test_disjoint(self):
        a = np.zeros((20, 20), np.int32)
        a[:5, :5] = 1
        b = np.zeros((20, 20), np.int32)
        b[10:15, 10:15] = 1
        assert get_fast_aji_plus(a, b) == 0.0

    def test_half_overlap(self):
        a = np.zeros((20, 20), np.int32)
        a[0:10, 0:10] = 1
        b = np.zeros((20, 20), np.int32)
        b[0:10, 5:15] = 1
        # inter 50, union 150
        assert np.isclose(get_fast_aji_plus(a, b), 50 / 150)

    def test_one_to_one_pairing_beats_greedy(self):
        """AJI+ Hungarian pairing: a pred overlapping two GTs pairs with only
        one; the other GT counts as unpaired union."""
        t = np.zeros((10, 30), np.int32)
        t[:, 0:10] = 1
        t[:, 12:22] = 2
        p = np.zeros((10, 30), np.int32)
        p[:, 0:22] = 1  # one blob covering both
        score_plus = get_fast_aji_plus(t, p)
        assert 0 < score_plus < 0.5

    def test_empty_prediction(self):
        m = two_cells()
        assert get_fast_aji_plus(m, np.zeros_like(m)) == 0.0

    def test_aji_le_aji_plus(self):
        rng = np.random.default_rng(3)
        t = (rng.random((30, 30)) > 0.6).astype(np.int32)
        from scipy import ndimage
        t, _ = ndimage.label(t)
        p = np.roll(t, 2, axis=0)
        assert get_fast_aji(t, p) <= get_fast_aji_plus(t, p) + 1e-9


class TestPQ:
    def test_perfect(self):
        m = two_cells()
        [dq, sq, pq], _ = get_fast_pq(m, m)
        assert dq == 1.0 and np.isclose(sq, 1.0, atol=1e-5) and np.isclose(pq, 1.0, atol=1e-5)

    def test_missing_instance(self):
        t = two_cells()
        p = np.where(t == 2, 0, t)
        [dq, sq, pq], _ = get_fast_pq(t, p)
        assert np.isclose(dq, 1 / (1 + 0.5))  # 1 TP, 1 FN


class TestDice:
    def test_dice1(self):
        t = two_cells()
        assert get_dice_1(t, t) == 1.0
        assert get_dice_1(t, np.zeros_like(t)) == 0.0

    def test_dice2_perfect(self):
        t = two_cells()
        assert np.isclose(get_fast_dice_2(t, t), 1.0)


class TestRemap:
    def test_remap(self):
        m = np.array([[0, 5], [9, 5]])
        out = remap_label(m)
        np.testing.assert_array_equal(out, [[0, 1], [2, 1]])

    def test_remap_by_size_largest_first(self):
        """Reference stats_utils.py:365-394 by_size semantics: new id 1 is
        the largest instance; ties keep original id order (stable)."""
        m = np.array([[3, 3, 3], [7, 7, 0], [9, 0, 0]], np.uint16)
        out = remap_label(m, by_size=True)
        np.testing.assert_array_equal(
            out, np.array([[1, 1, 1], [2, 2, 0], [3, 0, 0]], np.uint16))
        assert out.dtype == m.dtype

    def test_remap_by_size_matches_loop_oracle(self):
        rng = np.random.RandomState(0)
        m = rng.randint(0, 12, size=(40, 40)).astype(np.int32) * 7
        out = remap_label(m, by_size=True)
        # loop oracle (the reference's per-instance algorithm)
        ids = np.unique(m); ids = ids[ids > 0]
        sizes = np.array([(m == i).sum() for i in ids])
        order = ids[np.argsort(-sizes, kind="stable")]
        ref = np.zeros_like(m)
        for new, old in enumerate(order, 1):
            ref[m == old] = new
        np.testing.assert_array_equal(out, ref)

    def test_remap_negative_ids_map_to_background(self):
        """ADVICE r4: signed inputs — ids <= 0 must all land on 0, not wrap
        through the lookup table."""
        m = np.array([[-3, 0, 5], [5, -1, 9]], np.int32)
        out = remap_label(m)
        np.testing.assert_array_equal(out, [[0, 0, 1], [1, 0, 2]])
        out = remap_label(m, by_size=True)
        np.testing.assert_array_equal(out, [[0, 0, 1], [1, 0, 2]])

    def test_remap_sparse_huge_ids_no_dense_table(self):
        """ADVICE r4: sparse int64 ids far above the pixel count must not
        allocate an O(max_id) table; result identical to the dense path."""
        m = np.zeros((32, 32), np.int64)
        m[:4, :4] = 3
        m[10:20, 10:20] = 2**40 + 7
        m[25:27, 25:30] = 2**33
        out = remap_label(m, by_size=True)
        ref = np.zeros_like(m)
        ref[10:20, 10:20] = 1   # largest
        ref[:4, :4] = 2
        ref[25:27, 25:30] = 3
        np.testing.assert_array_equal(out, ref)
        np.testing.assert_array_equal(
            np.unique(remap_label(m)), [0, 1, 2, 3])


class TestPairCoordinates:
    def test_pairs_within_radius(self):
        """Reference stats_utils.py:398-434: Hungarian pairing on Euclidean
        cost, pairs beyond the radius discarded."""
        from microbeseg_tpu.evaluation.metrics import pair_coordinates

        set_a = np.array([[0., 0.], [10., 10.], [50., 50.]], np.float32)
        set_b = np.array([[1., 0.], [10., 11.], [200., 200.]], np.float32)
        pairing, un_a, un_b = pair_coordinates(set_a, set_b, radius=2.0)
        assert sorted(map(tuple, pairing.tolist())) == [(0, 0), (1, 1)]
        np.testing.assert_array_equal(un_a, [2])
        np.testing.assert_array_equal(un_b, [2])

    def test_optimal_not_greedy(self):
        """Greedy nearest-first would pair a0-b0 and strand a1; the optimal
        assignment pairs a0-b1, a1-b0."""
        from microbeseg_tpu.evaluation.metrics import pair_coordinates

        set_a = np.array([[0., 0.], [1., 0.]], np.float32)
        set_b = np.array([[1.1, 0.], [0.4, 0.]], np.float32)
        pairing, un_a, un_b = pair_coordinates(set_a, set_b, radius=5.0)
        assert sorted(map(tuple, pairing.tolist())) == [(0, 1), (1, 0)]
        assert un_a.size == 0 and un_b.size == 0

    def test_empty_sets(self):
        from microbeseg_tpu.evaluation.metrics import pair_coordinates

        pairing, un_a, un_b = pair_coordinates(
            np.zeros((0, 2), np.float32), np.zeros((3, 2), np.float32), 1.0)
        assert pairing.shape[0] == 0
        np.testing.assert_array_equal(un_b, [0, 1, 2])
