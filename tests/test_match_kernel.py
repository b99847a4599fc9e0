"""ops/match_kernel.py: fused top-2 matcher vs the dense XLA reference."""

import numpy as np
import pytest
import jax.numpy as jnp

from slam_toolkit_tpu.ops.match_kernel import (_topk2_pallas, _topk2_xla,
                                               topk2_match)


def _case(m, n, seed, w=640.0, h=480.0):
    rng = np.random.default_rng(seed)
    a_desc = jnp.asarray(rng.integers(0, 2**32, (m, 8), dtype=np.uint32))
    b_desc = jnp.asarray(rng.integers(0, 2**32, (n, 8), dtype=np.uint32))
    # half the targets are near-duplicates of queries so real matches and
    # ratio-test discriminations both occur
    bd = np.array(b_desc)
    bd[: m // 2] = np.asarray(a_desc)[: m // 2]
    b_desc = jnp.asarray(bd)
    a_uv = jnp.asarray(rng.uniform(0, [w, h], (m, 2)).astype(np.float32))
    b_xy = np.asarray(rng.uniform(0, [w, h], (n, 2)).astype(np.float32))
    b_xy[: m // 2] = np.asarray(a_uv)[: m // 2] + rng.normal(0, 3, (m // 2, 2))
    return a_desc, b_desc, a_uv, jnp.asarray(b_xy.astype(np.float32))


@pytest.mark.slow
def test_kernel_matches_xla_interpret():
    for (m, n, seed) in [(256, 256, 0), (512, 384, 1), (384, 512, 2)]:
        a_desc, b_desc, a_uv, b_xy = _case(m, n, seed)
        ref = np.asarray(_topk2_xla(a_desc, b_desc, a_uv, b_xy, 25.0))
        out = np.asarray(_topk2_pallas(a_desc, b_desc, a_uv, b_xy, 25.0,
                                       interpret=True))
        np.testing.assert_array_equal(out[:, :2], ref[:, :2])   # r best/2nd
        np.testing.assert_array_equal(out[:, 3:5], ref[:, 3:5])  # 2r
        # argbest must agree wherever a real (non-BIG) best exists
        for c in (2, 5):
            has = ref[:, c - 2] < 1e8
            np.testing.assert_array_equal(out[has, c], ref[has, c])


def test_empty_gates_interpret():
    """No target within either radius -> BIG distances, no matches."""
    a_desc, b_desc, a_uv, b_xy = _case(128, 128, 3)
    out = np.asarray(_topk2_pallas(a_desc, b_desc, a_uv + 1e6, b_xy, 25.0,
                                   interpret=True))
    assert (out[:, 0] >= 1e8).all() and (out[:, 3] >= 1e8).all()


def test_public_entry_cpu():
    a_desc, b_desc, a_uv, b_xy = _case(128, 256, 4)
    out = np.asarray(topk2_match(a_desc, b_desc, a_uv, b_xy, 25.0))
    ref = np.asarray(_topk2_xla(a_desc, b_desc, a_uv, b_xy, 25.0))
    np.testing.assert_array_equal(out, ref)
