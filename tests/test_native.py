"""Native C++ kernel parity tests (SURVEY.md §2.7): identical contract to
the numpy fallbacks."""

import numpy as np
import pytest

try:
    from colvo.native import voxel_downsample as native_vd, chain_poses

    HAVE_NATIVE = True
except Exception:
    HAVE_NATIVE = False

pytestmark = pytest.mark.skipif(not HAVE_NATIVE, reason="g++ toolchain unavailable")


def test_native_voxel_matches_numpy():
    rng = np.random.default_rng(0)
    pts = rng.normal(size=(20000, 3)).astype(np.float32) * 0.05
    cols = rng.random((20000, 3)).astype(np.float32)

    native_p, native_c = native_vd(pts, 0.01, cols)

    # numpy reference (the recon fallback path)
    import colvo.vo.recon as recon

    keys = np.floor(pts / 0.01).astype(np.int64)
    packed = ((keys[:, 0] & 0x1FFFFF) << 42 | (keys[:, 1] & 0x1FFFFF) << 21
              | (keys[:, 2] & 0x1FFFFF))
    uniq, inv, counts = np.unique(packed, return_inverse=True, return_counts=True)
    acc = np.zeros((len(uniq), 3))
    np.add.at(acc, inv, pts)
    ref_p = acc / counts[:, None]

    assert len(native_p) == len(ref_p)
    # same cell sets → compare as sorted rows
    np.testing.assert_allclose(
        np.sort(native_p, axis=0), np.sort(ref_p, axis=0).astype(np.float32), atol=1e-5
    )
    assert native_c.shape == native_p.shape


def test_native_chain_poses_matches_numpy():
    from colvo.geometry.se3 import se3_exp
    import jax.numpy as jnp

    rng = np.random.default_rng(1)
    xi = rng.normal(size=(100, 6)) * 0.05
    rels = np.asarray(se3_exp(jnp.asarray(xi)), dtype=np.float64)

    out = chain_poses(rels, renorm_every=10)
    assert out.shape == (101, 4, 4)

    t = np.eye(4)
    ref = [t.copy()]
    for r in rels:
        t = t @ np.linalg.inv(r)
        ref.append(t.copy())
    ref = np.stack(ref)
    # renormalization introduces tiny differences; trajectories must agree
    np.testing.assert_allclose(out[:, :3, 3], ref[:, :3, 3], atol=1e-6)
    # rotations remain orthonormal
    r_last = out[-1, :3, :3]
    np.testing.assert_allclose(r_last @ r_last.T, np.eye(3), atol=1e-9)
