"""Pallas TPU bilinear-sampling kernel with FULL gradients (SURVEY.md K2;
VERDICT r1 weak #3 / next-step 3).

The geometric-consistency loss (SC-Depth form, losses/total.py) warps the
*source depth map* and needs gradients w.r.t. BOTH the sampling
coordinates and the sampled source plane. XLA lowers the source-cotangent
to a serialized scatter-add — measured +172 ms/step at the uncapped
native-scale protocol (scripts/bench_decompose.py: 293 ms vs 121 ms
capped), which is why round 1 capped the geo grid (changing the trained
objective). This kernel makes the honest protocol affordable.

Forward + coordinate gradient reuse the lane-gather sampler
(colvo.kernels.sampler). The new piece is the **source-cotangent
scatter**, built on a TPU-native decomposition instead of per-element
scatter-adds:

  d src[r, c] = Σ_p g_p · w_p  over out-pixels p whose bilinear stencil
                               touches (r, c)

* Each of the 4 stencil terms targets (ty, tx) = (y0/y1, x0/x1) with
  weight v. Write the target as (i + e, l + d): offsets of the target
  from the out-pixel's own (row i, lane l).
* VO warp fields are smooth, so within a (TILE_H × 128) out-tile the
  offsets span a SMALL dynamic range [emin, emax] × [dmin, dmax]. The
  kernel loops over offset classes (dynamic trip counts — cost adapts to
  the actual local spread, stays exact for ANY warp): every class is a
  *uniform* 2-D shift, i.e. a mask + ``pltpu.roll`` — no gather, no
  scatter, plain VPU work.
* Class contributions accumulate into a local (TILE_H+8, LOCAL_W) tile,
  then one read-modify-write lands it in the full source plane, which
  stays resident in VMEM across the plane's out-tiles (constant output
  index_map → block revisiting).

Alignment: vertical placement splits into an 8-aligned dynamic base plus
a fine circular roll; wrapped rows are provably zero (targets are clamped
to the true image, masked rows carry no contribution). Horizontal
coverage is the full padded width for every colvo resolution
(LOCAL_W = min(512, W_pad)), so the scatter is exact; sources wider than
512 px would drop contributions whose within-tile lane spread exceeds
LOCAL_W − 128 (physically implausible for VO warps; documented cap).

Parity is pinned against the XLA fallback's autodiff (gather +
scatter-add) in tests/test_kernels.py, fwd + both gradients.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from colvo.kernels.sampler import (
    LANES,
    _from_planes,
    _plane_call,
    _to_planes,
)

# Output-tile height. Opposite optimum to the sampler (which wants the
# narrowest tile): the scatter's per-tile offset-class discovery
# (min/max scans + class loop setup) amortizes over the tile, so WIDE
# wins — round-4 on-chip sweep, B=12 256x320x1 fullgrad fwd+bwd, serial
# chain: tile_h 8/16/32/64/128 → 26.9/17.1/11.0/8.4/9.7 ms.
DEFAULT_TILE_H = 64
# Forward-gather tile, decoupled from the scatter tile above (round 5).
# Conflicting measurements, step level wins: ISOLATED serial-chain says
# 8 beats 64 for the fwd gather (geo_fwdbwd@256 7.97 vs 8.59 ms; geo_fwd
# 2.87 vs 3.44), but the full train step measured 88.6 ms with fwd=8 vs
# 82.3 with fwd=64 in the same session window — the extra kernel shape
# appears to cost more in-program (scheduling/recompile boundaries) than
# the isolated win. Default stays 64 (= the scatter tile); the
# decoupling knob remains for future toolchains.
FWD_TILE_H = 64
LOCAL_W_MAX = 512  # max lanes covered by one local accumulation tile
# Static caps on visited offset classes per tile (see cap note in-kernel).
# Sized to stay EXACT for any physical warp: vertical spans reach
# tile_h + local row-displacement spread (border clamp pileups + fast
# motion ⇒ ~64+2*30 = 124 at the default tile), horizontal spans reach
# ~129 when a whole lane-tile clamps onto one image column. Only
# diverged/garbage warps (spread over the full image, spans ~288 x ~448)
# exceed them. Caps bound the worst case only — trip counts are
# data-dependent, so raising V_CAP with the tile costs nothing typical.
V_CAP = 128
H_CAP = 160


def _scatter_kernel(hw_true, hw_out_true, tile_h, local_w,
                    x_ref, y_ref, g_ref, out_ref):
    """Accumulate one out-tile's source-cotangent into the plane block."""
    h_true, w_true = hw_true
    h_out_true, w_out_true = hw_out_true
    j = pl.program_id(1)
    k = pl.program_id(2)

    @pl.when((j == 0) & (k == 0))
    def _init():
        out_ref[0] = jnp.zeros_like(out_ref[0])

    x = x_ref[0]
    y = y_ref[0]
    g = g_ref[0]
    th, lanes = x.shape
    h_pad_out = out_ref.shape[1]
    w_pad_out = out_ref.shape[2]

    x0f = jnp.floor(x)
    y0f = jnp.floor(y)
    wx = x - x0f
    wy = y - y0f
    x0 = jnp.clip(x0f.astype(jnp.int32), 0, w_true - 1)
    x1 = jnp.clip(x0f.astype(jnp.int32) + 1, 0, w_true - 1)
    y0 = jnp.clip(y0f.astype(jnp.int32), 0, h_true - 1)
    y1 = jnp.clip(y0f.astype(jnp.int32) + 1, 0, h_true - 1)

    row_i = jax.lax.broadcasted_iota(jnp.int32, (th, lanes), 0)
    lane_i = jax.lax.broadcasted_iota(jnp.int32, (th, lanes), 1)
    # Partial out-tiles: block padding values are unspecified, and this
    # kernel ACCUMULATES — contributions must be masked to the true
    # output grid explicitly.
    inb = ((row_i + j * th) < h_out_true) & ((lane_i + k * lanes) < w_out_true)
    nz = inb & (g != 0.0)

    terms = (
        (y0, x0, g * (1.0 - wx) * (1.0 - wy)),
        (y0, x1, g * wx * (1.0 - wy)),
        (y1, x0, g * (1.0 - wx) * wy),
        (y1, x1, g * wx * wy),
    )
    BIG = jnp.int32(1) << 28
    es = [jnp.where(nz, ty - row_i, BIG) for ty, _, _ in terms]
    ds = [jnp.where(nz, tx - lane_i - k * lanes, BIG) for _, tx, _ in terms]
    emin = functools.reduce(jnp.minimum, [jnp.min(e) for e in es])
    emax = functools.reduce(
        jnp.maximum, [jnp.max(jnp.where(nz, e, -BIG)) for e in es]
    )
    dmin = functools.reduce(jnp.minimum, [jnp.min(d) for d in ds])
    dmax = functools.reduce(
        jnp.maximum, [jnp.max(jnp.where(nz, d, -BIG)) for d in ds]
    )
    # Static caps on the visited offset-class spans. The trip counts are
    # DATA-dependent: a sane VO warp spans a handful of classes, but a
    # diverged model (pre-NaN-guard steps) scatters across the whole
    # image — up to ~(H+TILE)x(W+128) classes, ~10^4x the typical cost,
    # which crawls the device while the async dispatch loop keeps
    # queueing steps: device->host fetches then starve and training
    # wedges (observed: exposure-jitter cell, round 2). Classes beyond
    # the caps are dropped — exact for any physical warp (at the default
    # 64-row tile the worst physical vertical span is ~tile_h + 2*30 =
    # 124 vs V_CAP=128, a ~3% margin — see the header cap note; a future
    # tile_h > 68 must raise V_CAP with it), garbage-gradient-only for
    # diverged ones, and the loop's NaN guard is the backstop.
    n_vert = jnp.minimum(jnp.maximum(emax - emin + 1, 0), V_CAP)
    n_horz = jnp.minimum(jnp.maximum(dmax - dmin + 1, 0), H_CAP)

    # Lane window covered by the local tile (128-aligned, clipped).
    cbase = pl.multiple_of(
        jnp.clip(((k * lanes + dmin) // lanes) * lanes, 0, w_pad_out - local_w),
        lanes,
    )

    def vert_body(m, _):
        s = emin + m  # this class's uniform row offset: target row = i + s

        def horz_body(kk, local):
            dd = dmin + kk  # uniform lane offset: target lane = l + dd
            contrib = jnp.zeros((th, lanes), jnp.float32)
            for (ty, tx, v), e_t, d_t in zip(terms, es, ds):
                contrib = contrib + jnp.where((e_t == s) & (d_t == dd), v, 0.0)
            # local column of target = (k*128 + lane + dd) - cbase
            sh = k * lanes + dd - cbase
            ok = (lane_i[:1] + sh >= 0) & (lane_i[:1] + sh < local_w)
            contrib = jnp.where(ok, contrib, 0.0)
            if local_w > lanes:
                contrib = jnp.concatenate(
                    [contrib, jnp.zeros((th, local_w - lanes), jnp.float32)],
                    axis=1,
                )
            # Roll by the non-negative residue: negative dynamic rotate
            # amounts are unreliable in compiled Mosaic (circular semantics
            # hold in interpret mode but not on-chip).
            return local + pltpu.roll(contrib, sh % local_w, axis=1)

        local = jax.lax.fori_loop(
            0, n_horz, horz_body, jnp.zeros((th, local_w), jnp.float32)
        )
        # Vertical placement: 8-aligned dynamic base + fine circular roll.
        # Wrapped rows are zero: targets are clamped to [0, h_true) and
        # masked rows contribute nothing (module docstring).
        base = pl.multiple_of(
            jnp.clip((s // 8) * 8, 0, h_pad_out - (th + 8)), 8
        )
        fine = (s - base) % (th + 8)  # non-negative residue (see above)
        local = jnp.concatenate(
            [local, jnp.zeros((8, local_w), jnp.float32)], axis=0
        )
        local = pltpu.roll(local, fine, axis=0)
        blk = out_ref[0, pl.ds(base, th + 8), pl.ds(cbase, local_w)]
        out_ref[0, pl.ds(base, th + 8), pl.ds(cbase, local_w)] = blk + local
        return 0

    jax.lax.fori_loop(0, n_vert, vert_body, 0)


def _scatter_call(x, y, g, h_src, w_src, tile_h):
    """Per-plane source cotangent: (N, h_out, w_out) coords/cot →
    (N, H_pad, W_pad) accumulated plane gradients."""
    n, h_out, w_out = x.shape
    w_pad = max((w_src + LANES - 1) // LANES * LANES, LANES)
    h_pad = max((h_src + 7) // 8 * 8, tile_h + 8)
    local_w = min(LOCAL_W_MAX, w_pad)
    grid = (n, pl.cdiv(h_out, tile_h), pl.cdiv(w_out, LANES))
    tile_spec = pl.BlockSpec((1, tile_h, LANES), lambda i, j, k: (i, j, k),
                             memory_space=pltpu.VMEM)
    return pl.pallas_call(
        functools.partial(
            _scatter_kernel, (h_src, w_src), (h_out, w_out), tile_h, local_w
        ),
        grid=grid,
        in_specs=[tile_spec, tile_spec, tile_spec],
        out_specs=pl.BlockSpec((1, h_pad, w_pad), lambda i, j, k: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((n, h_pad, w_pad), jnp.float32),
    )(x, y, g)


def scatter_cap_overflow(
    coords: jnp.ndarray,
    src_hw: tuple,
    tile_h: int = DEFAULT_TILE_H,
) -> jnp.ndarray:
    """Count offset classes the scatter kernel would DROP for this warp.

    The kernel's exactness contract rests on static caps (V_CAP/H_CAP) on
    the per-tile offset-class spans; classes beyond them are silently
    dropped (module docstring). This audit recomputes the spans in plain
    XLA from the sampling ``coords`` alone — the spans are a function of
    the warp field, not of the cotangent — and returns the total number of
    dropped classes (i32 scalar, 0 for any physical warp). Conservative
    upper bound: the kernel additionally masks zero-cotangent pixels out
    of its spans, the audit assumes every pixel contributes. Exposed as a
    train-time aux metric via ``loss.scatter_audit`` (ADVICE r2 medium /
    VERDICT r2 #10) so a quiet gradient bias is observable, not asserted.

    coords: (B, h, w, 2) pixel-space (x, y); src_hw: true source (H, W).
    """
    h_true, w_true = src_hw
    x = coords[..., 0]
    y = coords[..., 1]
    b, h_out, w_out = x.shape
    hp = (h_out + tile_h - 1) // tile_h * tile_h
    wp = (w_out + LANES - 1) // LANES * LANES
    valid = jnp.ones((b, h_out, w_out), bool)
    if hp != h_out or wp != w_out:
        pad = ((0, 0), (0, hp - h_out), (0, wp - w_out))
        x = jnp.pad(x, pad)
        y = jnp.pad(y, pad)
        valid = jnp.pad(valid, pad)

    x0 = jnp.clip(jnp.floor(x).astype(jnp.int32), 0, w_true - 1)
    x1 = jnp.clip(jnp.floor(x).astype(jnp.int32) + 1, 0, w_true - 1)
    y0 = jnp.clip(jnp.floor(y).astype(jnp.int32), 0, h_true - 1)
    y1 = jnp.clip(jnp.floor(y).astype(jnp.int32) + 1, 0, h_true - 1)

    # Same offset definitions as the kernel: e = target row − within-tile
    # row; d = target col − absolute output col.
    row_w = (jnp.arange(hp) % tile_h)[None, :, None]
    col_a = jnp.arange(wp)[None, None, :]
    BIG = jnp.int32(1) << 28

    def tile_minmax(v, big_for_min):
        # (B, hp, wp) → per-tile (B, nj, nk) min or max
        t = v.reshape(b, hp // tile_h, tile_h, wp // LANES, LANES)
        return t.min(axis=(2, 4)) if big_for_min else t.max(axis=(2, 4))

    emins, emaxs, dmins, dmaxs = [], [], [], []
    for ty, tx in ((y0, x0), (y0, x1), (y1, x0), (y1, x1)):
        e = ty - row_w
        d = tx - col_a
        emins.append(tile_minmax(jnp.where(valid, e, BIG), True))
        emaxs.append(tile_minmax(jnp.where(valid, e, -BIG), False))
        dmins.append(tile_minmax(jnp.where(valid, d, BIG), True))
        dmaxs.append(tile_minmax(jnp.where(valid, d, -BIG), False))
    emin = functools.reduce(jnp.minimum, emins)
    emax = functools.reduce(jnp.maximum, emaxs)
    dmin = functools.reduce(jnp.minimum, dmins)
    dmax = functools.reduce(jnp.maximum, dmaxs)
    v_need = jnp.maximum(emax - emin + 1, 0)
    h_need = jnp.maximum(dmax - dmin + 1, 0)
    dropped = jnp.maximum(v_need - V_CAP, 0) + jnp.maximum(h_need - H_CAP, 0)
    return jnp.sum(dropped).astype(jnp.int32)


@functools.partial(jax.custom_vjp, nondiff_argnums=(2,))
def bilinear_sample_fullgrad(
    img: jnp.ndarray, coords: jnp.ndarray, tile_h: int = DEFAULT_TILE_H
) -> jnp.ndarray:
    """Bilinear sampling with gradients to coords AND source (Pallas).

    Same semantics as ``geometry.ops.bilinear_sample`` (border clamp);
    the backward runs the offset-class scatter kernel instead of XLA's
    serialized scatter-add. img (B, H, W, C) f32; coords (B, h, w, 2).
    """
    planes, x, y, shape = _to_planes(img, coords)
    out = _plane_call(planes, x, y, FWD_TILE_H, False, img.shape[1:3])
    return _from_planes(out, shape)


def _fwd(img, coords, tile_h):
    planes, x, y, shape = _to_planes(img, coords)
    out, dx, dy = _plane_call(planes, x, y, FWD_TILE_H, True, img.shape[1:3])
    return _from_planes(out, shape), (
        _from_planes(dx, shape),
        _from_planes(dy, shape),
        coords,
        img.shape,
    )


def _bwd(tile_h, res, g):
    dx, dy, coords, img_shape = res
    b, h_src, w_src, c = img_shape
    gx = jnp.sum(g * dx, axis=-1)
    gy = jnp.sum(g * dy, axis=-1)
    d_coords = jnp.stack([gx, gy], axis=-1)

    # source cotangent via the scatter kernel, one plane per (batch, chan)
    g_planes = jnp.transpose(g, (0, 3, 1, 2)).reshape(
        b * c, g.shape[1], g.shape[2]
    ).astype(jnp.float32)
    x = coords[..., 0]
    y = coords[..., 1]
    if c > 1:
        x = jnp.repeat(x, c, axis=0)
        y = jnp.repeat(y, c, axis=0)
    acc = _scatter_call(x, y, g_planes, h_src, w_src, tile_h)
    d_img = jnp.transpose(
        acc[:, :h_src, :w_src].reshape(b, c, h_src, w_src), (0, 2, 3, 1)
    ).astype(g.dtype)
    return d_img, d_coords


bilinear_sample_fullgrad.defvjp(_fwd, _bwd)
