"""Chunked streaming VO executor — the TPU-native config-5 hot path.

The naive per-pair VO loop (one ``infer_coupled`` call per frame pair with
host numpy inputs) is host-link bound: feeding float32 frame batches from
host per pair costs far more than the coupled depth+pose compute. This
module restructures streaming VO around the hardware:

  * **uint8 on the wire in** — frames cross host→HBM as uint8 (4× less
    link traffic than float32; decoders produce uint8 anyway) and are
    converted + normalized on device inside the jitted chunk program;
  * **video-native I420 input** (``input_format="i420"``) — H.26x/VP9
    decoders emit YUV 4:2:0, not RGB: accepting the decoder's planar I420
    buffer directly is another 2× off host→device bytes (1.5 B/px vs 3),
    with the BT.601 color transform (limited-range by default — the video
    convention; ``"i420full"`` for JPEG-range sources) + chroma upsample
    done on device (a
    few VPU multiplies). Chroma subsampling is a property of the source
    video, so this is byte-for-byte what an RGB-converting decode path
    would feed the model anyway;
  * **chunked transfers** — frames move in chunks of ``chunk_size`` (one
    ``device_put`` per chunk amortizes per-transfer latency);
  * **each frame's encoder runs exactly once** — the previous chunk's last
    normalized frame and its depth bottleneck are carried device-resident
    into the next chunk, so consecutive pairs share per-frame work instead
    of recomputing the shared frame (the naive pair loop runs every
    encoder twice);
  * **float16 depth out, one fetch per chunk** — device→host is the
    scarce resource; depth maps cross as float16 (~5e-4 relative error,
    ample for reconstruction/viz of 8-bit video) and each chunk's depth +
    pose outputs are bit-packed into a single uint16 buffer so the chunk
    pays one device→host fixed cost, not two. Poses stay exact float32
    (bit-cast, not rounded) — trajectory chaining is precision-critical.
  * **O(chunk) device memory** — a full colonoscopy (thousands of frames)
    streams through without ever materializing on device (SURVEY.md §5.7).

Per chunk of W new frames the jitted program computes W depth maps, W
DCDP-fused poses (pairs: carry→f0, f0→f1, …), and the new carry. Pose
chaining stays on host in float64 (SURVEY.md §3.3 boundary note).

The jitted programs are memoized on the runner, so repeated ``run_vo``
calls (and the eval pipelines) reuse one compiled executable per
(depth_dtype, chunk shape).

Capability parity: this is the rebuilt V1 fast path (SURVEY.md §2.6);
reference capability claim README.md:21,29 (full-sequence trajectories,
stitched reconstruction).
"""

from __future__ import annotations

from concurrent.futures import ThreadPoolExecutor
from typing import Iterable, Iterator, List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from colvo.geometry import disp_to_depth
from colvo.runtime.infer import InferenceRunner


def _to_u16_bits(x: jnp.ndarray) -> jnp.ndarray:
    """Bit-cast any 2- or 4-byte array to a flat uint16 container."""
    return jax.lax.bitcast_convert_type(x, jnp.uint16).reshape(-1)


def _to_u8_bits(x: jnp.ndarray) -> jnp.ndarray:
    """Bit-cast any array to a flat uint8 container."""
    if x.dtype == jnp.uint8:
        return x.reshape(-1)
    return jax.lax.bitcast_convert_type(x, jnp.uint8).reshape(-1)


def rgb_to_i420(frames: np.ndarray, video_range: bool = True) -> np.ndarray:
    """Pack uint8 RGB frames (N, H, W, 3) into planar I420 (N, H·3/2, W).

    ``video_range=True`` (default): limited-range (studio-swing) BT.601,
    Y∈[16,235] — the convention H.26x/VP9 decoders and cv2 use, and what
    ``input_format="i420"`` decodes. ``video_range=False``: full-range
    (the JPEG/MJPEG convention), pair with ``input_format="i420full"``.
    H must be a multiple of 4 and W even — the (H·3/2, W) row-packed view
    of the planar buffer requires the U/V planes to land on row
    boundaries. Host-side helper for tests/benchmarks — real deployments
    take I420 straight from the video decoder, which emits it natively.
    """
    n, h, w, _ = frames.shape
    if h % 4 or w % 2:
        raise ValueError(
            f"I420 (H*3/2, W) packing needs H % 4 == 0 and W % 2 == 0, got {(h, w)}"
        )
    f = frames.astype(np.float32)
    r, g, b = f[..., 0], f[..., 1], f[..., 2]
    y = 0.299 * r + 0.587 * g + 0.114 * b
    u = -0.168736 * r - 0.331264 * g + 0.5 * b
    v = 0.5 * r - 0.418688 * g - 0.081312 * b
    if video_range:
        y = 16.0 + y * (219.0 / 255.0)
        u = u * (224.0 / 255.0)
        v = v * (224.0 / 255.0)
    u, v = u + 128.0, v + 128.0
    # 2×2 chroma average then subsample (the standard 4:2:0 down-filter)
    u = u.reshape(n, h // 2, 2, w // 2, 2).mean(axis=(2, 4))
    v = v.reshape(n, h // 2, 2, w // 2, 2).mean(axis=(2, 4))
    out = np.empty((n, h * 3 // 2, w), np.uint8)
    out[:, :h] = np.clip(y + 0.5, 0, 255).astype(np.uint8)
    out[:, h:h + h // 4] = np.clip(u + 0.5, 0, 255).astype(np.uint8).reshape(n, h // 4, w)
    out[:, h + h // 4:] = np.clip(v + 0.5, 0, 255).astype(np.uint8).reshape(n, h // 4, w)
    return out


def _i420_to_rgb_device(x: jnp.ndarray, video_range: bool = True) -> jnp.ndarray:
    """Planar I420 (B, H·3/2, W) uint8 → RGB float (B, H, W, 3) in [0, 1].

    ``video_range=True`` (default, ``input_format="i420"``): limited-range
    (studio-swing) BT.601, Y∈[16,235] — what H.26x decoders and
    ``cv2.COLOR_RGB2YUV_I420`` emit. ``video_range=False``
    (``input_format="i420full"``): full-range BT.601, the JPEG/MJPEG
    convention. Nearest chroma upsample; pure VPU elementwise + broadcast
    — negligible next to the conv stacks it feeds.
    """
    b, h32, w = x.shape
    h = h32 * 2 // 3
    y = x[:, :h, :].astype(jnp.float32)
    u = x[:, h:h + h // 4, :].reshape(b, h // 2, w // 2).astype(jnp.float32) - 128.0
    v = x[:, h + h // 4:, :].reshape(b, h // 2, w // 2).astype(jnp.float32) - 128.0
    if video_range:
        y = (y - 16.0) * (255.0 / 219.0)
        u = u * (255.0 / 224.0)
        v = v * (255.0 / 224.0)

    def up2(c):  # nearest 2× chroma upsample, broadcast-only
        c = jnp.broadcast_to(c[:, :, None, :, None], (b, h // 2, 2, w // 2, 2))
        return c.reshape(b, h, w)

    u, v = up2(u), up2(v)
    r = y + 1.402 * v
    g = y - 0.344136 * u - 0.714136 * v
    bl = y + 1.772 * u
    return jnp.clip(jnp.stack([r, g, bl], axis=-1), 0.0, 255.0) / 255.0


def _build_stream_fns(runner: InferenceRunner, wire_dt: jnp.dtype,
                      input_format: str = "rgb", symmetric_pose: bool = False):
    cfg = runner.cfg
    model = runner.model
    quantized = wire_dt == jnp.uint8

    def _normalize(frames):
        if input_format in ("i420", "i420full"):
            return _i420_to_rgb_device(frames, video_range=input_format == "i420")
        imgs = frames.astype(jnp.float32)
        if frames.dtype == jnp.uint8:
            imgs = imgs / 255.0
        return imgs

    def _sdisp_of(disps):
        """Scaled disparity (B, H, W) — depth = 1/sdisp (colvo.geometry)."""
        sdisp, _ = disp_to_depth(
            disps[0][..., 0], cfg.model.min_depth, cfg.model.max_depth
        )
        return sdisp

    @jax.jit
    def init_fn(params, frame):
        """First frame: float32 depth + carry (normalized img, bottleneck)."""
        img = _normalize(frame)
        disps, bneck = model.apply(params, img, method=model.depth)
        return 1.0 / _sdisp_of(disps), img, bneck

    @jax.jit
    def chunk_fn(params, carry_img, carry_bneck, new_frames):
        """W new frames → one packed wire buffer (depths+poses), next carry.

        Pairs are (carry→new0), (new0→new1), … — each frame's depth
        encoder runs once; the pose branch reuses the carried depth
        bottleneck for DCDP fusion (README.md:7 coupling).
        """
        imgs = _normalize(new_frames)
        disps, bnecks = model.apply(params, imgs, method=model.depth)
        img_a = jnp.concatenate([carry_img, imgs[:-1]], axis=0)
        bneck_a = jnp.concatenate([carry_bneck, bnecks[:-1]], axis=0)
        feats = [bneck_a, bnecks] if cfg.model.dcdp_fusion else None
        aa, tr = model.apply(params, img_a, imgs, feats, method=model.pose)
        if symmetric_pose:
            # Symmetrized inference, ROTATION ONLY: read each pair BOTH
            # ways and average the rotation in the Lie algebra. The pose
            # net sees (target, source) in a fixed order; its learned
            # order asymmetry becomes a constant directed rotation offset
            # that integrates into trajectory drift — averaging with the
            # reversed reading cancels it exactly, no calibration constant
            # fitted, exact to O(θ²) at ≤1°/frame (docs/DRIFT.md: 2.9×
            # lower per-frame rotation error). The TRANSLATION keeps the
            # forward reading: the corpus moves forward only, so the net
            # carries a forward-motion prior — it predicts forward-signed
            # t for BOTH reading orders, and averaging with the exact
            # inverse −R_baᵀ t_ba annihilates the signal instead of the
            # bias (measured: mean‖t‖ 0.0351 → 0.0007, a 50× collapse of
            # the inference gauge r that blew polyp-e up 20× while ATE
            # stayed fine because sim(3) absorbs trajectory scale).
            # Costs one extra pose pass per pair (depth encoder untouched).
            feats_r = ([bnecks, bneck_a] if cfg.model.dcdp_fusion else None)
            aa_r, _ = model.apply(params, imgs, img_a, feats_r,
                                  method=model.pose)
            aa = 0.5 * (aa - aa_r)
        pose6 = jnp.concatenate([aa, tr], axis=-1).astype(jnp.float32)
        sdisp = _sdisp_of(disps)
        if quantized:
            # uint8 wire: per-frame linear quantization in disparity space
            # (error roughly uniform in *relative* depth; ≤0.5/255 of the
            # frame's disparity span). Per-frame (lo, span) ride along as
            # float32 — 8 bytes against ~80 KB of payload per frame.
            lo = sdisp.min(axis=(1, 2))
            span = sdisp.max(axis=(1, 2)) - lo
            step = jnp.maximum(span / 255.0, 1e-12)
            # Clip before the cast: float roundoff can push the top bin a
            # hair past 255.0, and an unclipped uint8 cast would wrap to 0
            # (decoding as wildly wrong depth) instead of saturating.
            q = jnp.clip(jnp.round(
                (sdisp - lo[:, None, None]) / step[:, None, None]
            ), 0, 255).astype(jnp.uint8)
            meta = jnp.stack([lo, step], axis=-1).astype(jnp.float32)
            wire = jnp.concatenate(
                [_to_u8_bits(q), _to_u8_bits(meta), _to_u8_bits(pose6)]
            )
        else:
            depth = (1.0 / sdisp).astype(wire_dt)
            wire = jnp.concatenate(
                [_to_u16_bits(depth), _to_u16_bits(pose6)]
            )
        return wire, imgs[-1:], bnecks[-1:]

    return init_fn, chunk_fn


class StreamingVO:
    """Chunked streaming depth+pose executor over an InferenceRunner.

    ``depth_dtype`` sets the on-the-wire dtype of fetched depth maps:
    float16 (default) halves device→host traffic at ~5e-4 relative depth
    error; float32 gives bit-exact parity with the per-pair path (the CPU
    test suite uses it); uint8 quantizes disparity per frame (error ≤
    1/510 of the frame's disparity span, ~0.2–0.4% relative depth) for
    another 2× off the device→host bytes — the wire is the throughput
    bound through a host link, so this buys real fps when depth is
    consumed for viz/recon of 8-bit video. Poses are exact float32 in
    every mode (trajectory chaining is precision-critical).
    """

    def __init__(
        self,
        runner: InferenceRunner,
        chunk_size: int = 16,
        depth_dtype: str = "float16",
        fetch_workers: int = 4,
        input_format: str = "rgb",
        symmetric_pose: bool = False,
    ):
        self.runner = runner
        self.chunk_size = int(chunk_size)
        self.fetch_workers = int(fetch_workers)
        self.input_format = input_format
        assert input_format in ("rgb", "i420", "i420full"), input_format
        self.wire_dt = jnp.dtype(depth_dtype)
        assert self.wire_dt.itemsize in (1, 2, 4), depth_dtype
        cache = runner.__dict__.setdefault("_stream_fn_cache", {})
        key = (str(self.wire_dt), input_format, bool(symmetric_pose))
        if key not in cache:
            cache[key] = _build_stream_fns(runner, self.wire_dt, input_format,
                                           symmetric_pose)
        self._init_fn, self._chunk_fn = cache[key]

    def _chunks(
        self, it: Iterator[np.ndarray]
    ) -> Iterator[Tuple[np.ndarray, int]]:
        """Group the remaining frames into (chunk array, n_valid) blocks.

        The final partial chunk is padded by repeating its last frame so
        every chunk has the same static shape (one compiled program).
        """
        w = self.chunk_size
        buf: List[np.ndarray] = []
        for f in it:
            buf.append(f)
            if len(buf) == w:
                yield np.stack(buf), w
                buf = []
        if buf:
            n = len(buf)
            buf.extend([buf[-1]] * (w - n))
            yield np.stack(buf), n

    def _decode_wire(
        self, wire: np.ndarray, hw: Tuple[int, int]
    ) -> Tuple[np.ndarray, np.ndarray]:
        """Split a fetched wire buffer into (float32 depths, pose6)."""
        w = self.chunk_size
        if self.wire_dt == jnp.uint8:
            n_d = w * hw[0] * hw[1]
            q = wire[:n_d].reshape(w, *hw)
            meta = wire[n_d:n_d + w * 8].view(np.float32).reshape(w, 2)
            lo, step = meta[:, 0, None, None], meta[:, 1, None, None]
            depths = 1.0 / (lo + q.astype(np.float32) * step)
            pose6 = wire[n_d + w * 8:].view(np.float32).reshape(w, 6)
            return depths, pose6
        units = self.wire_dt.itemsize // 2
        n_d = w * hw[0] * hw[1] * units
        depths = (
            wire[:n_d]
            .view(np.dtype(self.wire_dt.name))
            .reshape(w, *hw)
            .astype(np.float32)
        )
        pose6 = wire[n_d:].view(np.float32).reshape(w, 6)
        return depths, pose6

    def run(
        self, frames: Iterable[np.ndarray], keep_depths: bool = True,
        keyframe_every: Optional[int] = None,
    ) -> Tuple[List[np.ndarray], np.ndarray]:
        """Stream frames → (per-frame depth maps, (N-1, 6) relative poses).

        Frames may be uint8 HWC (preferred: 4× cheaper on the wire) or
        float in [0, 1]; normalization happens on device either way.

        ``keep_depths=False`` drops each decoded depth map after fetch
        (returns an empty list): a multi-thousand-frame trajectory run
        stays O(chunk) on the host too, instead of retaining N full-res
        maps nobody asked for. The wire still carries depth — the
        executor protocol (and its cost) is identical in both modes.

        ``keyframe_every=k`` retains only depth maps of frames whose
        global index is a multiple of k (the reconstruction keyframe
        protocol, vo/driver.py) — O(N/k) host memory for full-sequence
        stitching (README.md:29) instead of O(N). Frame 0 is always a
        keyframe. Implies keep_depths.
        """
        ke = int(keyframe_every) if keyframe_every else 1
        if keyframe_every:
            keep_depths = True
        it = iter(frames)
        try:
            first = np.asarray(next(it))
        except StopIteration:
            return [], np.zeros((0, 6), np.float32)

        if self.input_format in ("i420", "i420full"):
            # planar (H·3/2, W) uint8 in; depths decode at the RGB size
            hw = (first.shape[0] * 2 // 3, first.shape[1])
        else:
            hw = first.shape[:2]
        params = self.runner.params
        d0, carry_img, carry_bneck = self._init_fn(
            params, jax.device_put(first[None])
        )

        # Wire fetches run on a thread pool: a main-thread fetch serializes
        # against the queued device work through the host link, while
        # fetches from other threads overlap with it (measured: the same
        # fetch pattern off-thread left the step loop 1000× faster).
        # Multiple workers overlap D2H transfers with each other too —
        # the link sustains ~34 MB/s per stream but ~2× that with 2 in
        # flight and ~76 MB/s with 6 (measured on the v5e tunnel).
        def fetch(args):
            wire, n = args
            dn, pn = self._decode_wire(np.asarray(wire), hw)
            return dn, pn, n

        depths: List[np.ndarray] = []
        poses: List[np.ndarray] = []
        next_idx = 1  # global frame index of dn[0] in the next drained chunk

        def drain(fut):
            nonlocal next_idx
            dn, pn, n = fut.result()
            if keep_depths:
                depths.extend(
                    dn[i] for i in range(n) if (next_idx + i) % ke == 0
                )
            next_idx += n
            poses.append(pn[:n])

        # bounds device-resident wire buffers (O(chunk) memory each)
        max_in_flight = max(8, 2 * self.fetch_workers)
        futures: List = []
        with ThreadPoolExecutor(max_workers=self.fetch_workers) as pool:
            for chunk, n_valid in self._chunks(it):
                dev_chunk = jax.device_put(chunk)  # async H2D
                wire, carry_img, carry_bneck = self._chunk_fn(
                    params, carry_img, carry_bneck, dev_chunk
                )
                futures.append(pool.submit(fetch, (wire, n_valid)))
                if len(futures) > max_in_flight:
                    drain(futures.pop(0))  # ordered reassembly
            for fut in futures:
                drain(fut)

        all_depths = (
            [np.asarray(d0).astype(np.float32)[0]] + depths
            if keep_depths else []
        )
        rel = (
            np.concatenate(poses, axis=0)
            if poses
            else np.zeros((0, 6), np.float32)
        )
        return all_depths, rel
