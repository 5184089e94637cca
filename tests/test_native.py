"""Native host-op tests: C++ vs numpy agreement."""

import numpy as np

from odise_tpu import native


def test_native_builds():
    # build may fail in exotic environments; the API must still work
    rng = np.random.RandomState(0)
    rgb = rng.randint(0, 255, (16, 16, 3), np.uint8)
    ids = native.rgb2id(rgb)
    ref = (rgb[..., 0].astype(np.uint32) + 256 * rgb[..., 1].astype(np.uint32)
           + 65536 * rgb[..., 2].astype(np.uint32))
    np.testing.assert_array_equal(ids, ref)


def test_pq_intersections_matches_numpy():
    rng = np.random.RandomState(1)
    gt = rng.randint(0, 5, (32, 32)).astype(np.uint32)
    pred = rng.randint(0, 4, (32, 32)).astype(np.uint32)
    g, p, c = native.pq_intersections(gt, pred)
    ref = {}
    for a, b in zip(gt.ravel(), pred.ravel()):
        ref[(int(a), int(b))] = ref.get((int(a), int(b)), 0) + 1
    got = {(int(a), int(b)): int(n) for a, b, n in zip(g, p, c)}
    assert got == ref


def test_mask_iou_native():
    a = np.zeros((8, 8), bool)
    b = np.zeros((8, 8), bool)
    a[:4] = True
    b[2:6] = True
    np.testing.assert_allclose(native.mask_iou(a, b), 16 / 48, rtol=1e-9)
