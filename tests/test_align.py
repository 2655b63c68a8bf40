"""Monotonic-alignment DP: on-device scan vs C++ kernel vs brute force,
plus the duration->alignment builder vs the reference's python loop."""

import itertools

import numpy as np
import pytest

import jax.numpy as jnp

from styletts2_tpu.ops import align as A


def brute_force_path(value: np.ndarray, t_x: int, t_y: int) -> np.ndarray:
    """Enumerate all monotonic paths (start at x=0, end at x=t_x-1, advance
    x by 0/1 per frame), pick the max-sum one. Exponential — tiny sizes only.
    """
    best, best_path = -np.inf, None
    # choose the t_x-1 frame indices (out of t_y-1 transitions) where x advances
    for adv in itertools.combinations(range(1, t_y), t_x - 1):
        x = 0
        score = value[0, 0]
        path = np.zeros_like(value, dtype=np.int32)
        path[0, 0] = 1
        for y in range(1, t_y):
            if y in adv:
                x += 1
            score += value[x, y]
            path[x, y] = 1
        if score > best:
            best, best_path = score, path
    return best_path


@pytest.mark.parametrize("seed", [0, 1, 2, 3])
def test_jax_dp_matches_brute_force(seed):
    rng = np.random.default_rng(seed)
    t_x, t_y = 4, 7
    value = rng.standard_normal((1, t_x, t_y)).astype(np.float32)
    ours = np.asarray(A.maximum_path(jnp.asarray(value),
                                     jnp.asarray([t_x]), jnp.asarray([t_y])))
    ref = brute_force_path(value[0], t_x, t_y)
    # scores must match (ties can pick different argmax paths)
    assert (ours[0] * value[0]).sum() == pytest.approx(
        (ref * value[0]).sum(), abs=1e-4)
    # every mel frame assigned exactly one token, monotonically
    assert (ours[0].sum(axis=0) == 1).all()
    xs = ours[0].argmax(axis=0)
    assert (np.diff(xs) >= 0).all() and xs[0] == 0 and xs[-1] == t_x - 1


def test_jax_dp_matches_cpp_kernel():
    rng = np.random.default_rng(42)
    b, max_x, max_y = 3, 12, 30
    value = rng.standard_normal((b, max_x, max_y)).astype(np.float32)
    t_x = np.array([12, 7, 3], np.int32)
    t_y = np.array([30, 18, 9], np.int32)
    ours = np.asarray(A.maximum_path(jnp.asarray(value), jnp.asarray(t_x),
                                     jnp.asarray(t_y)))
    native = A.maximum_path_cpu(value, t_x, t_y)
    np.testing.assert_array_equal(ours.astype(np.int32), native)


def test_cpp_matches_reference_semantics():
    """One-token and square cases, plus padding stays zero."""
    value = np.zeros((1, 1, 5), np.float32)
    p = A.maximum_path_cpu(value, np.array([1]), np.array([5]))
    assert p.sum() == 5  # single token spans all frames
    value = np.zeros((1, 4, 4), np.float32)
    p = A.maximum_path_cpu(value, np.array([4]), np.array([4]))
    np.testing.assert_array_equal(p[0], np.eye(4, dtype=np.int32))
    value = np.zeros((1, 6, 9), np.float32)
    p = A.maximum_path_cpu(value, np.array([3]), np.array([5]))
    assert p[0, 3:, :].sum() == 0 and p[0, :, 5:].sum() == 0


def test_mask_from_lens():
    m = np.asarray(A.mask_from_lens(jnp.asarray([2, 3]), jnp.asarray([4, 2]),
                                    3, 5))
    assert m.shape == (2, 3, 5)
    assert m[0].sum() == 2 * 4 and m[1].sum() == 3 * 2


def test_build_alignment_matches_reference_loop():
    """vs the python loop at reference inference.py:258-263."""
    durs = np.array([[2, 1, 3], [1, 1, 1]], np.float32)
    total = 8
    ours = np.asarray(A.build_alignment(jnp.asarray(durs), total))
    for b in range(2):
        ref = np.zeros((3, total), np.float32)
        c = 0
        for i in range(3):
            ref[i, c:c + int(durs[b, i])] = 1
            c += int(durs[b, i])
        np.testing.assert_array_equal(ours[b], ref)
    # frames beyond sum(durs) are unassigned (zero columns) — the frame mask
    assert ours[1, :, 3:].sum() == 0
