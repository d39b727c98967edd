"""Unit tests for the self-training / GT-ceiling script helpers
(scripts/self_training.py, scripts/gt_ceiling.py — round 5)."""

import numpy as np

from scripts.gt_ceiling import erode1, grow1
from scripts.self_training import consistency_filter, instance_max_iou


class TestInstanceMaxIoU:
    def test_exact_and_partial_matches(self):
        base = np.zeros((16, 16), np.int32)
        base[0:4, 0:4] = 1          # exact match in member
        base[8:12, 8:12] = 2        # half-overlapped in member
        member = np.zeros_like(base)
        member[0:4, 0:4] = 5
        member[10:14, 8:12] = 9     # overlaps rows 10:12 of base id 2
        iou = instance_max_iou(base, member)
        assert iou[0] == 1.0
        # inter 8, union 16+16-8
        assert np.isclose(iou[1], 8 / 24)

    def test_empty_member(self):
        base = np.zeros((8, 8), np.int32)
        base[:2, :2] = 1
        assert instance_max_iou(base, np.zeros_like(base)).tolist() == [0.0]

    def test_empty_base(self):
        assert instance_max_iou(np.zeros((8, 8), np.int32),
                                np.zeros((8, 8), np.int32)).size == 0


class TestConsistencyFilter:
    def test_keeps_agreed_drops_disputed_and_small(self):
        base = np.zeros((24, 24), np.int32)
        base[2:8, 2:8] = 3          # agreed by both members
        base[12:18, 12:18] = 7      # missed by member b
        base[20:22, 20:22] = 9      # agreed but tiny (area 4 < min_area)
        a = np.where(base > 0, base + 10, 0)
        b = a.copy()
        b[12:18, 12:18] = 0
        out, kept, dropped = consistency_filter(base, [a, b], tau=0.5,
                                                min_area=6)
        assert (kept, dropped) == (1, 2)
        # survivor renumbered densely from 1, in original position
        assert set(np.unique(out)) == {0, 1}
        assert (out[2:8, 2:8] == 1).all()

    def test_no_filter_when_members_agree(self):
        base = np.zeros((16, 16), np.int32)
        base[1:6, 1:6] = 1
        base[9:14, 9:14] = 2
        out, kept, dropped = consistency_filter(base, [base, base],
                                                tau=0.9, min_area=4)
        assert kept == 2 and dropped == 0
        np.testing.assert_array_equal(out, base.astype(np.uint16))


class TestGtCeilingMorphology:
    def test_erode1_keeps_interior_only(self):
        m = np.zeros((10, 10), np.uint16)
        m[2:7, 2:7] = 4
        e = erode1(m)
        assert (e[3:6, 3:6] == 4).all()
        assert e.sum() == 4 * 9  # 3x3 interior survives

    def test_grow1_no_merge_between_touching_instances(self):
        m = np.zeros((10, 12), np.uint16)
        m[2:8, 2:5] = 1
        m[2:8, 7:10] = 2   # 2-px background gap at columns 5:7
        g = grow1(m)
        # both grew into the gap but kept distinct labels
        assert set(np.unique(g)) == {0, 1, 2}
        assert (g[2:8, 5] == 1).all() and (g[2:8, 6] == 2).all()
        # grown beyond original extent
        assert g[1, 3] == 1 and g[8, 8] == 2
