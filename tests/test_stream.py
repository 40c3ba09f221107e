"""Streaming VO executor parity (SURVEY.md §4 — the V1 fast path).

The chunked streaming executor (colvo/vo/stream.py) restructures the VO
hot path (uint8 chunked transfers, carried encoder features); these tests
pin it numerically to the reference per-pair coupled inference and to the
legacy per-pair driver loop.
"""

import numpy as np
import pytest

import jax

from colvo.config import ColvoConfig
from colvo.runtime import init_state
from colvo.runtime.infer import InferenceRunner
from colvo.vo import StreamingVO, chain_relative_poses, run_vo
from colvo.vo.driver import VOResult


@pytest.fixture(scope="module")
def tiny_runner():
    cfg = ColvoConfig()
    cfg.model.dtype = "float32"
    cfg.data.height, cfg.data.width = 64, 96
    _, state = init_state(cfg, jax.random.key(0))
    return InferenceRunner(cfg, state.params), cfg


@pytest.fixture(scope="module")
def frames(tiny_runner):
    _, cfg = tiny_runner
    rng = np.random.default_rng(3)
    n = 7  # deliberately not a multiple of chunk_size
    return rng.random((n, cfg.data.height, cfg.data.width, 3)).astype(np.float32)


def test_runner_commits_params_to_device():
    """InferenceRunner must device_put host-numpy params at construction:
    jit re-uploads numpy arguments on EVERY dispatch, which turned the
    130 fps streaming executor into 3 fps for npz-loaded weights (the
    import/eval/VO path — found by the 3000-frame long-video proof)."""
    cfg = ColvoConfig()
    cfg.model.dtype = "float32"
    cfg.data.height, cfg.data.width = 64, 96
    # Any host-numpy pytree exercises the contract — the runner commits
    # params at CONSTRUCTION, before any jitted fn validates them, so
    # building the real model (a ~40 s CPU init compile) adds nothing.
    rng = np.random.default_rng(0)
    np_params = {"params": {"depth": {"encoder": {
        "Conv_0": {"kernel": rng.normal(size=(3, 3, 3, 8)).astype(np.float32)}
    }}}}
    runner = InferenceRunner(cfg, np_params)
    leaves = jax.tree.leaves(runner.params)
    assert leaves and all(isinstance(l, jax.Array) for l in leaves)


def test_stream_matches_per_pair_coupled(tiny_runner, frames):
    """Chunked streaming == per-pair infer_coupled (same params, same frames)."""
    runner, _ = tiny_runner
    depths, rel6 = StreamingVO(runner, chunk_size=3, depth_dtype="float32").run(frames)
    assert len(depths) == len(frames)
    assert rel6.shape == (len(frames) - 1, 6)

    for i in range(len(frames) - 1):
        da, db, aa, tr = runner.infer_coupled(frames[i][None], frames[i + 1][None])
        np.testing.assert_allclose(depths[i], da[0], rtol=1e-4, atol=1e-5)
        np.testing.assert_allclose(rel6[i, :3], aa[0], rtol=1e-4, atol=1e-6)
        np.testing.assert_allclose(rel6[i, 3:], tr[0], rtol=1e-4, atol=1e-6)
    # final frame's depth comes from the last chunk's own forward
    _, db, _, _ = runner.infer_coupled(frames[-2][None], frames[-1][None])
    np.testing.assert_allclose(depths[-1], db[0], rtol=1e-4, atol=1e-5)


def test_stream_keyframe_retention_matches_select(tiny_runner, frames):
    """In-stream keyframe retention (O(N/k) host memory) keeps exactly the
    depths a keep-all run would select at i % k == 0, and identical poses."""
    runner, _ = tiny_runner
    sv = StreamingVO(runner, chunk_size=3, depth_dtype="float32")
    all_d, rel_a = sv.run(frames)
    kf_d, rel_b = sv.run(frames, keyframe_every=3)
    np.testing.assert_array_equal(rel_a, rel_b)
    expect = [all_d[i] for i in range(len(all_d)) if i % 3 == 0]
    assert len(kf_d) == len(expect)
    for a, b in zip(kf_d, expect):
        np.testing.assert_array_equal(a, b)


def test_stream_keep_depths_false_poses_identical(tiny_runner, frames):
    """keep_depths=False (the long-run O(chunk)-host mode) returns no
    depth maps but bit-identical poses — the wire protocol is unchanged."""
    runner, _ = tiny_runner
    d_k, p_k = StreamingVO(runner, chunk_size=3).run(frames)
    d_n, p_n = StreamingVO(runner, chunk_size=3).run(frames, keep_depths=False)
    assert d_n == [] and len(d_k) == len(frames)
    np.testing.assert_array_equal(p_k, p_n)


def test_stream_uint8_close_to_float(tiny_runner, frames):
    """uint8-on-the-wire (device-side /255) ≈ float path (quantization only)."""
    runner, _ = tiny_runner
    frames_u8 = np.clip(frames * 255.0 + 0.5, 0, 255).astype(np.uint8)
    d_f, p_f = StreamingVO(runner, chunk_size=4).run(frames)
    d_u, p_u = StreamingVO(runner, chunk_size=4).run(frames_u8)
    # inputs differ by ≤ 1/510 per pixel; outputs must stay close
    np.testing.assert_allclose(p_f, p_u, atol=5e-3)
    np.testing.assert_allclose(np.stack(d_f), np.stack(d_u), rtol=0.05, atol=5e-3)


def test_stream_f16_wire_depth_close_to_f32(tiny_runner, frames):
    """float16 on-the-wire depth (the production default) ≈ float32."""
    runner, _ = tiny_runner
    d32, p32 = StreamingVO(runner, chunk_size=4, depth_dtype="float32").run(frames)
    d16, p16 = StreamingVO(runner, chunk_size=4, depth_dtype="float16").run(frames)
    np.testing.assert_allclose(p32, p16, atol=1e-6)  # poses stay float32
    np.testing.assert_allclose(np.stack(d32), np.stack(d16), rtol=1e-3)
    assert np.stack(d16).dtype == np.float32  # converted back on host


def test_stream_u8_quantized_wire_depth_close_to_f32(tiny_runner, frames):
    """uint8 quantized-disparity wire: ≤1-step error in disparity space,
    exact float32 poses (colvo/vo/stream.py uint8 mode)."""
    runner, cfg = tiny_runner
    d32, p32 = StreamingVO(runner, chunk_size=4, depth_dtype="float32").run(frames)
    dq, pq = StreamingVO(runner, chunk_size=4, depth_dtype="uint8").run(frames)
    np.testing.assert_allclose(p32, pq, atol=1e-6)  # poses stay float32
    # quantization error bound: one uint8 step of the per-frame disparity
    # span (round-to-nearest → half a step; allow a full step for the
    # device/host float roundoff on top)
    for df, du in zip(d32, dq):
        disp_f, disp_u = 1.0 / df, 1.0 / du
        span = disp_f.max() - disp_f.min()
        assert np.abs(disp_f - disp_u).max() <= span / 255.0 + 1e-5
    assert np.stack(dq).dtype == np.float32


def test_stream_i420_input_close_to_rgb(tiny_runner):
    """Video-native I420 input ≈ RGB input up to 4:2:0 chroma subsampling
    (colvo/vo/stream.py input_format="i420").

    Uses rendered-colon frames: chroma subsampling is only meaningful on
    spatially coherent imagery (on white noise 4:2:0 destroys color by
    construction — real video is never noise).
    """
    from colvo.data import render_sequence
    from colvo.vo.stream import rgb_to_i420, _i420_to_rgb_device

    runner, cfg = tiny_runner
    seq = render_sequence(n_frames=7, height=cfg.data.height,
                          width=cfg.data.width, seed=5)
    frames_u8 = np.clip(seq.frames * 255.0 + 0.5, 0, 255).astype(np.uint8)

    # round-trip: i420 → device RGB must match the host RGB to chroma error
    i420 = rgb_to_i420(frames_u8)
    rt = np.asarray(_i420_to_rgb_device(jax.numpy.asarray(i420)))
    assert rt.shape == frames_u8.shape
    # luma is exact to rounding; chroma smear stays small on coherent frames
    assert np.abs(rt - frames_u8 / 255.0).mean() < 0.02

    d_r, p_r = StreamingVO(runner, chunk_size=4).run(frames_u8)
    d_y, p_y = StreamingVO(runner, chunk_size=4, input_format="i420").run(i420)
    assert len(d_y) == len(frames_u8)
    np.testing.assert_allclose(p_r, p_y, atol=2e-2)
    np.testing.assert_allclose(np.stack(d_r), np.stack(d_y), rtol=0.1, atol=2e-2)


def test_i420_limited_range_matches_cv2_decode():
    """Limited-range I420 device decode (the "i420" default) == cv2's YUV→RGB
    (the format video decoders and cv2.COLOR_RGB2YUV_I420 emit)."""
    import cv2
    from colvo.vo.stream import _i420_to_rgb_device

    h, w = 64, 96
    yy, xx = np.mgrid[0:h, 0:w]
    img = np.stack([(yy * 2) % 256, (xx * 2) % 256, (yy + xx) % 256], -1).astype(np.uint8)
    i420 = cv2.cvtColor(img, cv2.COLOR_RGB2YUV_I420)
    ours = np.asarray(_i420_to_rgb_device(jax.numpy.asarray(i420[None]),
                                          video_range=True))[0]
    cv2_rgb = cv2.cvtColor(i420, cv2.COLOR_YUV2RGB_I420).astype(np.float32) / 255.0
    # cv2 uses fixed-point coefficients + bilinear chroma upsample vs our
    # float + nearest: agree to a few /255 everywhere
    assert np.abs(ours - cv2_rgb).mean() < 0.01
    assert np.abs(ours - img.astype(np.float32) / 255.0).mean() < 0.02


def test_video_source_pixel_formats(tmp_path):
    """Frame sources emit float / uint8 RGB / planar I420 as configured."""
    import cv2
    from colvo.data import FrameDirSource

    d = tmp_path / "frames"
    d.mkdir()
    rng = np.random.default_rng(0)
    for i in range(3):
        img = rng.integers(0, 256, (32, 48, 3), dtype=np.uint8)
        cv2.imwrite(str(d / f"{i:04d}.png"), cv2.cvtColor(img, cv2.COLOR_RGB2BGR))
    f_float = FrameDirSource(str(d), 48, 32)[0]
    assert f_float.dtype == np.float32 and f_float.shape == (32, 48, 3)
    f_u8 = FrameDirSource(str(d), 48, 32, pixel_format="rgb8")[0]
    assert f_u8.dtype == np.uint8 and f_u8.shape == (32, 48, 3)
    np.testing.assert_allclose(f_float, f_u8.astype(np.float32) / 255.0, atol=1e-6)
    f_i420 = FrameDirSource(str(d), 48, 32, pixel_format="i420")[0]
    assert f_i420.dtype == np.uint8 and f_i420.shape == (48, 48)  # (H*3/2, W)


@pytest.mark.slow  # non-default inference path; ~1 min of stream compiles
def test_symmetric_pose_matches_manual_average(tiny_runner, frames):
    """StreamingVO(symmetric_pose=True) == rotation-only Lie-algebra
    average of the two per-pair readings: aa_sym = (aa_fwd − aa_rev)/2,
    t_sym = t_fwd (docs/DRIFT.md — averaging the translation with the
    exact inverse annihilates the forward-motion signal, measured 50×
    gauge collapse, so the translation keeps the forward reading)."""
    runner, _ = tiny_runner
    sv = StreamingVO(runner, chunk_size=3, depth_dtype="float32",
                     symmetric_pose=True)
    _, rel6 = sv.run(frames, keep_depths=False)

    a, b = frames[:-1], frames[1:]
    fwd = np.concatenate([runner.infer_pose(a[i:i+1], b[i:i+1])
                          for i in range(len(a))])
    rev = np.concatenate([runner.infer_pose(b[i:i+1], a[i:i+1])
                          for i in range(len(a))])
    want = np.concatenate(
        [0.5 * (fwd[:, :3] - rev[:, :3]), fwd[:, 3:]], axis=-1
    )
    np.testing.assert_allclose(rel6, want, rtol=1e-4, atol=1e-5)


def test_video_file_decode_roundtrip_run_vo(tiny_runner, tmp_path):
    """D1 end-to-end: an actual ENCODED video file streams through
    `VideoFrameSource` (cv2.VideoCapture) into `run_vo` — the last
    untested I/O boundary (VERDICT r4 missing #4; the reference's input
    is colonoscopy video, /root/reference/README.md:13).

    FFV1 (lossless) pins decode fidelity bit-exactly and makes the
    video-vs-array VO runs identical; MJPG exercises a real lossy DCT
    codec (the closest this cv2 build gets to H.26x) with a tolerance.
    """
    import cv2
    from colvo.data import VideoFrameSource

    runner, cfg = tiny_runner
    h, w = cfg.data.height, cfg.data.width
    # smooth synthetic frames (codecs are honest on natural content)
    yy, xx = np.mgrid[0:h, 0:w]
    base = np.stack(
        [np.sin(xx / 15), np.cos(yy / 9), np.sin((xx + yy) / 20)], -1
    ) * 0.4 + 0.5
    shift = np.linspace(0, 0.15, 7)[:, None, None, None]
    arr = np.clip((base[None] + shift) * 255, 0, 255).astype(np.uint8)

    def write(path, fourcc):
        vw = cv2.VideoWriter(str(path), cv2.VideoWriter_fourcc(*fourcc),
                             30, (w, h))
        assert vw.isOpened()
        for f in arr:
            vw.write(cv2.cvtColor(f, cv2.COLOR_RGB2BGR))
        vw.release()

    ffv1 = tmp_path / "seq_ffv1.avi"
    write(ffv1, "FFV1")
    src = VideoFrameSource(str(ffv1), w, h, pixel_format="rgb8")
    assert len(src) == 7
    decoded = np.stack(list(src))
    # lossless codec → bit-exact decode (RGB<->BGR only)
    np.testing.assert_array_equal(decoded, arr)
    # streaming contract: the source holds no frame buffers (O(1) memory)
    assert not any(isinstance(v, np.ndarray) for v in vars(src).values())

    vo_video = run_vo(runner, src, chunk_size=3, depth_dtype="float32")
    vo_array = run_vo(runner, arr, chunk_size=3, depth_dtype="float32")
    assert vo_video.poses.shape == (7, 4, 4)
    np.testing.assert_allclose(vo_video.poses, vo_array.poses,
                               rtol=1e-5, atol=1e-6)

    # stride decimation: ceil(count/stride) frames, len == #yielded
    src2 = VideoFrameSource(str(ffv1), w, h, stride=2, pixel_format="rgb8")
    dec2 = list(src2)
    assert len(dec2) == len(src2) == 4  # ceil(7/2)
    np.testing.assert_array_equal(np.stack(dec2), arr[::2])

    # lossy DCT codec: decode within tolerance, VO still runs end-to-end
    mjpg = tmp_path / "seq_mjpg.avi"
    write(mjpg, "MJPG")
    src3 = VideoFrameSource(str(mjpg), w, h, pixel_format="rgb8")
    dec3 = np.stack(list(src3))
    assert dec3.shape == arr.shape
    assert np.abs(dec3.astype(int) - arr.astype(int)).max() <= 40
    vo_mjpg = run_vo(runner, src3, chunk_size=3, depth_dtype="float32")
    assert vo_mjpg.poses.shape == (7, 4, 4)
    assert np.all(np.isfinite(vo_mjpg.poses))


def test_run_vo_fast_path_matches_legacy_loop(tiny_runner, frames):
    """run_vo(InferenceRunner) streaming result == the per-pair driver loop."""
    runner, _ = tiny_runner
    fast = run_vo(runner, frames, keyframe_every=2, chunk_size=3, depth_dtype="float32")

    # reproduce the legacy loop through the same public API by hiding the
    # runner type (duck-typed oracle path)
    class Wrapped:
        def __init__(self, r):
            self._r = r

        def infer_coupled(self, a, b):
            return self._r.infer_coupled(a, b)

    legacy = run_vo(Wrapped(runner), frames, keyframe_every=2)
    assert isinstance(fast, VOResult)
    assert fast.keyframe_ids == legacy.keyframe_ids
    np.testing.assert_allclose(fast.poses, legacy.poses, rtol=1e-4, atol=1e-5)
    assert len(fast.depths) == len(legacy.depths)
    for df, dl in zip(fast.depths, legacy.depths):
        np.testing.assert_allclose(df, dl, rtol=1e-4, atol=1e-5)


def test_chain_relative_poses_identity_and_inverse():
    rel6 = np.zeros((5, 6), np.float32)
    poses = chain_relative_poses(rel6)
    assert poses.shape == (6, 4, 4)
    np.testing.assert_allclose(poses, np.eye(4)[None].repeat(6, 0), atol=1e-12)

    # pure +z translation of the *relative* prev→cur transform moves the
    # camera along −z in world (cam→world is the inverse chain)
    rel6 = np.zeros((3, 6), np.float64)
    rel6[:, 5] = 0.1
    poses = chain_relative_poses(rel6)
    np.testing.assert_allclose(
        poses[:, 2, 3], [0.0, -0.1, -0.2, -0.3], atol=1e-12
    )


def test_chain_relative_poses_renorm_zero_means_never():
    """renorm_every=0 (the drift-A/B arm) must mean 'never renormalize',
    not a modulo-by-zero — the native chain used to SIGFPE on it (found
    by the long-video proof run), killing the process without a
    traceback."""
    rng = np.random.default_rng(3)
    rel6 = 0.01 * rng.standard_normal((64, 6))
    p0 = chain_relative_poses(rel6, renorm_every=0)
    p50 = chain_relative_poses(rel6, renorm_every=50)
    assert p0.shape == p50.shape == (65, 4, 4)
    assert np.all(np.isfinite(p0))
    # over 64 small steps a single renorm barely moves the chain
    np.testing.assert_allclose(p0, p50, atol=1e-6)
