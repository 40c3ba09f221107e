"""Pallas TPU bilinear-sampling kernel (SURVEY.md component K1, first stage).

XLA's general gather lowering dominates the warp+loss path on TPU
(measured with the serial-chain slope protocol: 29.3 ms forward for one
B=12 256×320×3 warp vs 5.6 ms for this kernel; the XLA full-gradient
variant — gather + scatter-add backward — costs 187 ms). This kernel
replaces the four flat gathers of ``colvo.geometry.ops.bilinear_sample`` with a TPU-native scheme
built on the one gather Mosaic supports natively: **lane-dimension
(within-row) dynamic gather**.

Mosaic's ``tpu.dynamic_gather`` is a **within-vreg** lane shuffle: it only
compiles for 128-lane-wide operands (measured: W=128 compiles, 256/320/384
fail). The kernel is therefore structured around (TILE_H, 128) output
tiles, per (plane, row-tile, col-tile) grid cell:

  * the full source plane (H, W) sits in VMEM (a 256×320 f32 plane is
    320 KB — whole colonoscopy frames fit comfortably) and is fetched
    once per plane (constant index_map across row/col tiles);
  * the kernel computes the tile's referenced source-row span
    [rmin, rmax] at runtime and loops **only over that span** with
    ``fori_loop`` (dynamic trip count ≈ tile height + vertical
    displacement, small for VO warps);
  * for each source row r, the referenced source-column span (≤ 3×128
    columns, rebased at min x0) is covered by a static 3-group loop:
    each group does one 128-wide row read and two lane gathers with
    group-rebased indices, exclusively masked by the index's true group
    so clamped windows at the right border never double-count;
  * horizontal lerp on the VPU, masked accumulation into the output rows
    whose floor(y) or floor(y)+1 equals r (vertical lerp).

The 3-group window bounds the per-tile horizontal source span at 384
columns — ample for VO warps (a 128-px tile under forward colonoscope
motion stretches by the depth ratio, far below 3×). ``span_groups`` is a
parameter for extreme callers.

Border-clamp semantics match the XLA fallback exactly (same clamping of
x0/x1/y0/y1), pinned by the parity tests in tests/test_kernels.py
(SURVEY.md §4.6).

Negative result (bf16 gather): running the in-kernel gather in bf16 to
halve vreg work does not compile on this toolchain — Mosaic requires
gather index bitwidth == data bitwidth ("Gather indices and result have
different bitwidths") and jnp.take_along_axis canonicalizes indices to
i32 even when cast to i16 first. Gathers stay f32.

Gradient: the same loop accumulates the four bilinear partial products, so
the kernel emits the **exact analytic** ∂out/∂x = (1−wy)(g1−g0)|y0 +
wy(g1−g0)|y1 and ∂out/∂y = h|y1 − h|y0 alongside the forward value; the
custom VJP contracts them with the cotangent. The source-image cotangent
is a lane *scatter* (no native support); the training loss only
differentiates image warps through coordinates (frames are data), so the
VJP returns a zero source cotangent — sampling that needs source
gradients (the geometric-consistency depth warp) uses the XLA fallback
(see colvo/losses/total.py).
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


# Output-tile height. Counter-intuitively SMALLER is faster on this
# kernel (round-4 on-chip sweep, B=12 256x320x3 fwd+bwd via vjp, serial
# chain: tile_h=8 -> 5.62 ms, 16 -> 6.73, 32 -> 7.75, 64 -> 9.96,
# 128 -> 14.68): the row sweep's 4 (tile_h, 128) f32 carry accumulators
# dominate vreg pressure, so the narrowest legal tile (one 8-row sublane
# block) wins despite its longer relative source-row span. 8 is the
# sublane minimum — this is the bottom of the curve, not a compromise.
DEFAULT_TILE_H = 8
LANES = 128  # tpu.dynamic_gather operates within one 128-lane vreg
SPAN_GROUPS = 3  # max horizontal source span per 128-wide tile, in vregs


def _gather_block(hw_true, src_ref, x, y, with_grads: bool = True):
    """Bilinear gather of one (tile_h, LANES) coord block from a
    VMEM-resident source plane ref → (out, dx, dy).

    ``x``/``y`` are plain (tile_h, LANES) arrays; ``src_ref`` is the
    (1, H_pad, W_pad) plane ref (dynamic 8-row-aligned loads inside).
    Shared by the sampler kernels below and the fused loss kernel
    (colvo.kernels.fused_loss). ``hw_true`` is the unpadded source
    (H, W) — border clamp must not select pad rows/lanes.

    ``with_grads=False`` drops the two coordinate-gradient accumulators
    (dt/db) and their per-row masked adds — a measurable VPU saving on
    the forward-only paths (VO/inference, stop-grad warps); dx/dy return
    as None.
    """
    h_true, w_true = hw_true
    w_src = src_ref.shape[2]
    tile_h = x.shape[0]
    x0f = jnp.floor(x)
    y0f = jnp.floor(y)
    wx = x - x0f
    wy = y - y0f
    x0 = jnp.clip(x0f.astype(jnp.int32), 0, w_true - 1)
    x1 = jnp.clip(x0f.astype(jnp.int32) + 1, 0, w_true - 1)
    y0 = jnp.clip(y0f.astype(jnp.int32), 0, h_true - 1)
    y1 = jnp.clip(y0f.astype(jnp.int32) + 1, 0, h_true - 1)

    rmin = jnp.min(y0)
    rmax = jnp.max(y1)
    # Lane-dim vector loads must start at a vreg boundary: align the
    # rebased window down to a multiple of 128. (w_src is padded to a
    # multiple of 128 by the wrapper for the same reason.)
    cbase = (jnp.min(x0) // LANES) * LANES
    # group id of each index relative to the aligned window
    gidx0 = (x0 - cbase) // LANES
    gidx1 = (x1 - cbase) // LANES

    # Dynamic VMEM vector loads need sublane-aligned starts: walk the source
    # rows in 8-row-aligned blocks (one aligned (8, 128) load per group per
    # block) and statically unroll the 8 rows inside.
    SUB = 8

    def body(rb, carry):
        r0 = pl.multiple_of(rb * SUB, SUB)
        segs = []
        for g in range(SPAN_GROUPS):  # static unroll
            base = jnp.clip(cbase + g * LANES, 0, max(w_src - LANES, 0))
            base = pl.multiple_of(base, LANES)
            segs.append(src_ref[0, pl.ds(r0, SUB), pl.ds(base, LANES)])
        for i in range(SUB):  # static unroll
            r = r0 + i
            g0 = jnp.zeros((tile_h, LANES), jnp.float32)
            g1 = jnp.zeros((tile_h, LANES), jnp.float32)
            for g in range(SPAN_GROUPS):
                base = jnp.clip(cbase + g * LANES, 0, max(w_src - LANES, 0))
                seg_b = jnp.broadcast_to(segs[g][i : i + 1], (tile_h, LANES))
                # Exclusive group masks keep clamped right-border windows
                # from double-counting; for selected lanes the rebased index
                # is always in [0, LANES) (see module docstring).
                loc0 = jnp.clip(x0 - base, 0, LANES - 1)
                loc1 = jnp.clip(x1 - base, 0, LANES - 1)
                v0 = jnp.take_along_axis(seg_b, loc0, axis=1)
                v1 = jnp.take_along_axis(seg_b, loc1, axis=1)
                g0 = g0 + jnp.where(gidx0 == g, v0, 0.0)
                g1 = g1 + jnp.where(gidx1 == g, v1, 0.0)
            hval = g0 + wx * (g1 - g0)  # horizontal lerp at source row r
            is_t = y0 == r
            is_b = y1 == r
            if with_grads:
                ht, hb, dt, db = carry
                dval = g1 - g0  # ∂hval/∂x within the cell
                carry = (
                    ht + jnp.where(is_t, hval, 0.0),
                    hb + jnp.where(is_b, hval, 0.0),
                    dt + jnp.where(is_t, dval, 0.0),
                    db + jnp.where(is_b, dval, 0.0),
                )
            else:
                ht, hb = carry
                carry = (
                    ht + jnp.where(is_t, hval, 0.0),
                    hb + jnp.where(is_b, hval, 0.0),
                )
        return carry

    zeros = jnp.zeros((tile_h, LANES), jnp.float32)
    init = (zeros,) * (4 if with_grads else 2)
    acc = jax.lax.fori_loop(rmin // SUB, rmax // SUB + 1, body, init)
    if with_grads:
        ht, hb, dt, db = acc
        out = ht + wy * (hb - ht)
        dx = dt + wy * (db - dt)
        dy = hb - ht
        return out, dx, dy
    ht, hb = acc
    return ht + wy * (hb - ht), None, None


def _gather_block_mc(hw_true, src_ref, x, y, n_chan, with_grads=True):
    """Multi-channel bilinear gather: index math once, per channel only
    the two lane gathers + masked accumulates.

    The plane-per-channel formulation repeats the whole inner loop —
    floor/clip, group ids, exclusive masks, lerp weights — for every
    channel with identical coords; at C=3 that work is ~a third of the
    production warp's cost (the step's dominant term, README roofline
    note). ``src_ref`` is a (1, C, H_pad, W_pad) VMEM block; returns
    per-channel lists (outs, dxs, dys). Group-skipping and offset-class
    variants below (COLVO_SAMPLER_SKIPG / COLVO_SAMPLER_SWEEP).
    """
    h_true, w_true = hw_true
    w_src = src_ref.shape[3]
    tile_h = x.shape[0]
    x0f = jnp.floor(x)
    y0f = jnp.floor(y)
    wx = x - x0f
    wy = y - y0f
    x0 = jnp.clip(x0f.astype(jnp.int32), 0, w_true - 1)
    x1 = jnp.clip(x0f.astype(jnp.int32) + 1, 0, w_true - 1)
    y0 = jnp.clip(y0f.astype(jnp.int32), 0, h_true - 1)
    y1 = jnp.clip(y0f.astype(jnp.int32) + 1, 0, h_true - 1)

    rmin = jnp.min(y0)
    rmax = jnp.max(y1)
    cbase = (jnp.min(x0) // LANES) * LANES
    gidx0 = (x0 - cbase) // LANES
    gidx1 = (x1 - cbase) // LANES
    SUB = 8
    C = n_chan

    def body(rb, carry):
        r0 = pl.multiple_of(rb * SUB, SUB)
        segs = []  # [group][channel]: one aligned (SUB, LANES) load each
        for g in range(SPAN_GROUPS):
            base = jnp.clip(cbase + g * LANES, 0, max(w_src - LANES, 0))
            base = pl.multiple_of(base, LANES)
            segs.append([src_ref[0, c, pl.ds(r0, SUB), pl.ds(base, LANES)]
                         for c in range(C)])
        for i in range(SUB):  # static unroll
            r = r0 + i
            g0 = [jnp.zeros((tile_h, LANES), jnp.float32) for _ in range(C)]
            g1 = [jnp.zeros((tile_h, LANES), jnp.float32) for _ in range(C)]
            for g in range(SPAN_GROUPS):
                base = jnp.clip(cbase + g * LANES, 0, max(w_src - LANES, 0))
                # shared per-group index math (channel-independent)
                loc0 = jnp.clip(x0 - base, 0, LANES - 1)
                loc1 = jnp.clip(x1 - base, 0, LANES - 1)
                m0 = gidx0 == g
                m1 = gidx1 == g
                for c in range(C):
                    seg_b = jnp.broadcast_to(segs[g][c][i:i + 1],
                                             (tile_h, LANES))
                    v0 = jnp.take_along_axis(seg_b, loc0, axis=1)
                    v1 = jnp.take_along_axis(seg_b, loc1, axis=1)
                    g0[c] = g0[c] + jnp.where(m0, v0, 0.0)
                    g1[c] = g1[c] + jnp.where(m1, v1, 0.0)
            is_t = y0 == r
            is_b = y1 == r
            if with_grads:
                ht, hb, dt, db = carry
                ht = tuple(ht[c] + jnp.where(is_t, g0[c] + wx * (g1[c] - g0[c]), 0.0) for c in range(C))
                hb = tuple(hb[c] + jnp.where(is_b, g0[c] + wx * (g1[c] - g0[c]), 0.0) for c in range(C))
                dt = tuple(dt[c] + jnp.where(is_t, g1[c] - g0[c], 0.0) for c in range(C))
                db = tuple(db[c] + jnp.where(is_b, g1[c] - g0[c], 0.0) for c in range(C))
                carry = (ht, hb, dt, db)
            else:
                ht, hb = carry
                ht = tuple(ht[c] + jnp.where(is_t, g0[c] + wx * (g1[c] - g0[c]), 0.0) for c in range(C))
                hb = tuple(hb[c] + jnp.where(is_b, g0[c] + wx * (g1[c] - g0[c]), 0.0) for c in range(C))
                carry = (ht, hb)
        return carry

    zeros = tuple(jnp.zeros((tile_h, LANES), jnp.float32) for _ in range(C))
    init = (zeros,) * (4 if with_grads else 2)
    acc = jax.lax.fori_loop(rmin // SUB, rmax // SUB + 1, body, init)
    if with_grads:
        ht, hb, dt, db = acc
        outs = [ht[c] + wy * (hb[c] - ht[c]) for c in range(C)]
        dxs = [dt[c] + wy * (db[c] - dt[c]) for c in range(C)]
        dys = [hb[c] - ht[c] for c in range(C)]
        return outs, dxs, dys
    ht, hb = acc
    return [ht[c] + wy * (hb[c] - ht[c]) for c in range(C)], None, None


def _gather_block_mc_skipg(hw_true, src_ref, x, y, n_chan, with_grads=True):
    """Group-skipping variant of ``_gather_block_mc``.

    The accumulation is LINEAR in each (row, group)'s gathered values
    (hval = (1−wx)·Σ_g m0_g·v0_g + wx·Σ_g m1_g·v1_g, and the vertical
    carries are masked sums of hval), so the group loop hoists OUTSIDE
    the row unroll and each group's whole contribution — seg loads,
    broadcasts, gathers, accumulates — sits under ONE ``lax.cond`` on a
    tile-uniform scalar (does ANY lane reference this group?). A typical
    VO tile spans ~129 source columns = 2 of the 3 static groups, so the
    third group's work is branched around entirely. Same arithmetic
    regrouped (f32 association order differs — parity within test
    tolerances). Experimental: COLVO_SAMPLER_SKIPG=1; measured before
    any default change.
    """
    h_true, w_true = hw_true
    w_src = src_ref.shape[3]
    tile_h = x.shape[0]
    x0f = jnp.floor(x)
    y0f = jnp.floor(y)
    wx = x - x0f
    wy = y - y0f
    x0 = jnp.clip(x0f.astype(jnp.int32), 0, w_true - 1)
    x1 = jnp.clip(x0f.astype(jnp.int32) + 1, 0, w_true - 1)
    y0 = jnp.clip(y0f.astype(jnp.int32), 0, h_true - 1)
    y1 = jnp.clip(y0f.astype(jnp.int32) + 1, 0, h_true - 1)

    rmin = jnp.min(y0)
    rmax = jnp.max(y1)
    cbase = (jnp.min(x0) // LANES) * LANES
    gidx0 = (x0 - cbase) // LANES
    gidx1 = (x1 - cbase) // LANES
    SUB = 8
    C = n_chan
    wxc = 1.0 - wx

    def body(rb, carry):
        r0 = pl.multiple_of(rb * SUB, SUB)

        def add_group(g, carry):
            base = jnp.clip(cbase + g * LANES, 0, max(w_src - LANES, 0))
            base_a = pl.multiple_of(base, LANES)
            segs = [src_ref[0, c, pl.ds(r0, SUB), pl.ds(base_a, LANES)]
                    for c in range(C)]
            loc0 = jnp.clip(x0 - base, 0, LANES - 1)
            loc1 = jnp.clip(x1 - base, 0, LANES - 1)
            m0 = gidx0 == g
            m1 = gidx1 == g
            for i in range(SUB):  # static unroll
                r = r0 + i
                is_t = y0 == r
                is_b = y1 == r
                for c in range(C):
                    seg_b = jnp.broadcast_to(segs[c][i:i + 1],
                                             (tile_h, LANES))
                    v0 = jnp.where(m0, jnp.take_along_axis(seg_b, loc0,
                                                           axis=1), 0.0)
                    v1 = jnp.where(m1, jnp.take_along_axis(seg_b, loc1,
                                                           axis=1), 0.0)
                    hv = wxc * v0 + wx * v1
                    if with_grads:
                        ht, hb, dt, db = carry
                        dv = v1 - v0
                        carry = (
                            _tup_add(ht, c, jnp.where(is_t, hv, 0.0)),
                            _tup_add(hb, c, jnp.where(is_b, hv, 0.0)),
                            _tup_add(dt, c, jnp.where(is_t, dv, 0.0)),
                            _tup_add(db, c, jnp.where(is_b, dv, 0.0)),
                        )
                    else:
                        ht, hb = carry
                        carry = (
                            _tup_add(ht, c, jnp.where(is_t, hv, 0.0)),
                            _tup_add(hb, c, jnp.where(is_b, hv, 0.0)),
                        )
            return carry

        for g in range(SPAN_GROUPS):
            used = jnp.any(gidx0 == g) | jnp.any(gidx1 == g)
            carry = jax.lax.cond(
                used, lambda cc, g=g: add_group(g, cc), lambda cc: cc, carry
            )
        return carry

    zeros = tuple(jnp.zeros((tile_h, LANES), jnp.float32) for _ in range(C))
    init = (zeros,) * (4 if with_grads else 2)
    acc = jax.lax.fori_loop(rmin // SUB, rmax // SUB + 1, body, init)
    if with_grads:
        ht, hb, dt, db = acc
        outs = [ht[c] + wy * (hb[c] - ht[c]) for c in range(C)]
        dxs = [dt[c] + wy * (db[c] - dt[c]) for c in range(C)]
        dys = [hb[c] - ht[c] for c in range(C)]
        return outs, dxs, dys
    ht, hb = acc
    return [ht[c] + wy * (hb[c] - ht[c]) for c in range(C)], None, None


def _tup_add(t, c, v):
    """Tuple-of-vregs carry update: t[c] += v (new tuple)."""
    return tuple(t[i] + v if i == c else t[i] for i in range(len(t)))


def _gather_block_mc_cls(hw_true, src_ref, x, y, n_chan, with_grads=True):
    """Offset-class variant of ``_gather_block_mc``: sweep row-offset
    CLASSES, not rows.

    The row sweep pays 8 statically-unrolled rows per touched source
    block, but a smooth VO warp's vertical offset c = y0 − (block row)
    spans only 2–4 distinct values within an (8, 128) tile — most of the
    unrolled rows contribute nothing while still paying their gathers.
    This walks the same 8-row-aligned blocks and, inside each, runs a
    DYNAMIC fori_loop over the live class range [dlo, dhi] only: one
    sublane roll per (group, channel) aligns source row r0+i+d with
    output row i (non-negative canonicalized shift — negative dynamic
    rotates miscompile, see colvo.kernels.scatter), then the usual two
    lane gathers + masked accumulate. Exact for ALL inputs (classes are
    bounded by construction to [-7, 7] ⇒ ≤ 15 iterations even for
    garbage warps, vs 8 for the row sweep); measured on chip vs the row
    sweep at the production warp shapes before becoming the default
    (COLVO_SAMPLER_SWEEP=rows restores the old path).
    """
    h_true, w_true = hw_true
    w_src = src_ref.shape[3]
    tile_h = x.shape[0]
    x0f = jnp.floor(x)
    y0f = jnp.floor(y)
    wx = x - x0f
    wy = y - y0f
    x0 = jnp.clip(x0f.astype(jnp.int32), 0, w_true - 1)
    x1 = jnp.clip(x0f.astype(jnp.int32) + 1, 0, w_true - 1)
    y0 = jnp.clip(y0f.astype(jnp.int32), 0, h_true - 1)
    y1 = jnp.clip(y0f.astype(jnp.int32) + 1, 0, h_true - 1)

    rmin = jnp.min(y0)
    rmax = jnp.max(y1)
    cbase = (jnp.min(x0) // LANES) * LANES
    gidx0 = (x0 - cbase) // LANES
    gidx1 = (x1 - cbase) // LANES
    SUB = 8
    C = n_chan
    i_row = jax.lax.broadcasted_iota(jnp.int32, (tile_h, LANES), 0)
    BIG = jnp.int32(1 << 20)

    # group-shared lane indices/masks (class- and row-independent)
    locs, msks = [], []
    for g in range(SPAN_GROUPS):
        base = jnp.clip(cbase + g * LANES, 0, max(w_src - LANES, 0))
        locs.append((jnp.clip(x0 - base, 0, LANES - 1),
                     jnp.clip(x1 - base, 0, LANES - 1)))
        msks.append((gidx0 == g, gidx1 == g))

    def block_body(rb, carry):
        r0 = pl.multiple_of(rb * SUB, SUB)
        segs = []  # [group][channel]: one aligned (SUB, LANES) load each
        for g in range(SPAN_GROUPS):
            base = jnp.clip(cbase + g * LANES, 0, max(w_src - LANES, 0))
            base = pl.multiple_of(base, LANES)
            segs.append([src_ref[0, c, pl.ds(r0, SUB), pl.ds(base, LANES)]
                         for c in range(C)])
        # live offset classes of this block: c = y − r0 − i for the top
        # (y0) and bottom (y1) source rows, counted only where the row
        # actually falls inside [r0, r0+8)
        c0 = y0 - r0 - i_row
        c1 = y1 - r0 - i_row
        in0 = (y0 >= r0) & (y0 < r0 + SUB)
        in1 = (y1 >= r0) & (y1 < r0 + SUB)
        dlo = jnp.minimum(jnp.min(jnp.where(in0, c0, BIG)),
                          jnp.min(jnp.where(in1, c1, BIG)))
        dhi = jnp.maximum(jnp.max(jnp.where(in0, c0, -BIG)),
                          jnp.max(jnp.where(in1, c1, -BIG)))

        def cls_body(d, carry):
            shift = (-d) % SUB  # roll: out[i] = seg[(i + d) mod 8]
            m0 = in0 & (c0 == d)
            m1 = in1 & (c1 == d)
            g0 = [jnp.zeros((tile_h, LANES), jnp.float32) for _ in range(C)]
            g1 = [jnp.zeros((tile_h, LANES), jnp.float32) for _ in range(C)]
            for g in range(SPAN_GROUPS):
                loc0, loc1 = locs[g]
                gm0, gm1 = msks[g]
                for c in range(C):
                    rolled = pltpu.roll(segs[g][c], shift, axis=0)
                    v0 = jnp.take_along_axis(rolled, loc0, axis=1)
                    v1 = jnp.take_along_axis(rolled, loc1, axis=1)
                    g0[c] = g0[c] + jnp.where(gm0, v0, 0.0)
                    g1[c] = g1[c] + jnp.where(gm1, v1, 0.0)
            if with_grads:
                ht, hb, dt, db = carry
                hv = [g0[c] + wx * (g1[c] - g0[c]) for c in range(C)]
                ht = tuple(ht[c] + jnp.where(m0, hv[c], 0.0) for c in range(C))
                hb = tuple(hb[c] + jnp.where(m1, hv[c], 0.0) for c in range(C))
                dt = tuple(dt[c] + jnp.where(m0, g1[c] - g0[c], 0.0)
                           for c in range(C))
                db = tuple(db[c] + jnp.where(m1, g1[c] - g0[c], 0.0)
                           for c in range(C))
                return (ht, hb, dt, db)
            ht, hb = carry
            hv = [g0[c] + wx * (g1[c] - g0[c]) for c in range(C)]
            ht = tuple(ht[c] + jnp.where(m0, hv[c], 0.0) for c in range(C))
            hb = tuple(hb[c] + jnp.where(m1, hv[c], 0.0) for c in range(C))
            return (ht, hb)

        return jax.lax.fori_loop(dlo, dhi + 1, cls_body, carry)

    zeros = tuple(jnp.zeros((tile_h, LANES), jnp.float32) for _ in range(C))
    init = (zeros,) * (4 if with_grads else 2)
    acc = jax.lax.fori_loop(rmin // SUB, rmax // SUB + 1, block_body, init)
    if with_grads:
        ht, hb, dt, db = acc
        outs = [ht[c] + wy * (hb[c] - ht[c]) for c in range(C)]
        dxs = [dt[c] + wy * (db[c] - dt[c]) for c in range(C)]
        dys = [hb[c] - ht[c] for c in range(C)]
        return outs, dxs, dys
    ht, hb = acc
    return [ht[c] + wy * (hb[c] - ht[c]) for c in range(C)], None, None


def _gather_block_cls(hw_true, src_ref, x, y, with_grads: bool = True):
    """Offset-class sweep for the single-plane gather (see
    ``_gather_block_mc_cls``): src_ref is a (1, H_pad, W_pad) plane ref.
    Serves ``_plane_call`` (the full-gradient geo sampler's forward,
    colvo.kernels.scatter) and the fused loss kernel's in-tile warps."""
    h_true, w_true = hw_true
    w_src = src_ref.shape[2]
    tile_h = x.shape[0]
    x0f = jnp.floor(x)
    y0f = jnp.floor(y)
    wx = x - x0f
    wy = y - y0f
    x0 = jnp.clip(x0f.astype(jnp.int32), 0, w_true - 1)
    x1 = jnp.clip(x0f.astype(jnp.int32) + 1, 0, w_true - 1)
    y0 = jnp.clip(y0f.astype(jnp.int32), 0, h_true - 1)
    y1 = jnp.clip(y0f.astype(jnp.int32) + 1, 0, h_true - 1)

    rmin = jnp.min(y0)
    rmax = jnp.max(y1)
    cbase = (jnp.min(x0) // LANES) * LANES
    gidx0 = (x0 - cbase) // LANES
    gidx1 = (x1 - cbase) // LANES
    SUB = 8
    i_row = jax.lax.broadcasted_iota(jnp.int32, x.shape, 0)
    BIG = jnp.int32(1 << 20)

    locs, msks = [], []
    for g in range(SPAN_GROUPS):
        base = jnp.clip(cbase + g * LANES, 0, max(w_src - LANES, 0))
        locs.append((jnp.clip(x0 - base, 0, LANES - 1),
                     jnp.clip(x1 - base, 0, LANES - 1)))
        msks.append((gidx0 == g, gidx1 == g))

    def block_body(rb, carry):
        r0 = pl.multiple_of(rb * SUB, SUB)
        segs = []
        for g in range(SPAN_GROUPS):
            base = jnp.clip(cbase + g * LANES, 0, max(w_src - LANES, 0))
            base = pl.multiple_of(base, LANES)
            segs.append(src_ref[0, pl.ds(r0, SUB), pl.ds(base, LANES)])
        c0 = y0 - r0 - i_row
        c1 = y1 - r0 - i_row
        in0 = (y0 >= r0) & (y0 < r0 + SUB)
        in1 = (y1 >= r0) & (y1 < r0 + SUB)
        dlo = jnp.minimum(jnp.min(jnp.where(in0, c0, BIG)),
                          jnp.min(jnp.where(in1, c1, BIG)))
        dhi = jnp.maximum(jnp.max(jnp.where(in0, c0, -BIG)),
                          jnp.max(jnp.where(in1, c1, -BIG)))

        def cls_body(d, carry):
            shift = (-d) % SUB
            m0 = in0 & (c0 == d)
            m1 = in1 & (c1 == d)
            g0 = jnp.zeros(x.shape, jnp.float32)
            g1 = jnp.zeros(x.shape, jnp.float32)
            for g in range(SPAN_GROUPS):
                loc0, loc1 = locs[g]
                gm0, gm1 = msks[g]
                rolled = pltpu.roll(segs[g], shift, axis=0)
                v0 = jnp.take_along_axis(rolled, loc0, axis=1)
                v1 = jnp.take_along_axis(rolled, loc1, axis=1)
                g0 = g0 + jnp.where(gm0, v0, 0.0)
                g1 = g1 + jnp.where(gm1, v1, 0.0)
            hval = g0 + wx * (g1 - g0)
            if with_grads:
                ht, hb, dt, db = carry
                dval = g1 - g0
                return (
                    ht + jnp.where(m0, hval, 0.0),
                    hb + jnp.where(m1, hval, 0.0),
                    dt + jnp.where(m0, dval, 0.0),
                    db + jnp.where(m1, dval, 0.0),
                )
            ht, hb = carry
            return (
                ht + jnp.where(m0, hval, 0.0),
                hb + jnp.where(m1, hval, 0.0),
            )

        return jax.lax.fori_loop(dlo, dhi + 1, cls_body, carry)

    zeros = jnp.zeros(x.shape, jnp.float32)
    init = (zeros,) * (4 if with_grads else 2)
    acc = jax.lax.fori_loop(rmin // SUB, rmax // SUB + 1, block_body, init)
    if with_grads:
        ht, hb, dt, db = acc
        out = ht + wy * (hb - ht)
        dx = dt + wy * (db - dt)
        dy = hb - ht
        return out, dx, dy
    ht, hb = acc
    return ht + wy * (hb - ht), None, None


# Which inner sweep the kernels use — MEASURED NEGATIVE for "classes"
# (round 5, on-chip serial-chain at the production shapes): the
# offset-class roll sweep does 2.5-3x fewer gather iterations on smooth
# VO warps (2-4 live classes vs 8 statically-unrolled rows per block) yet
# runs ~30% SLOWER everywhere — photo fwd 7.36 vs 5.73 ms, geo_fwd@256
# 5.82 vs 2.87 — because the dynamic-trip inner fori_loop with a
# dynamic-shift roll on its critical path defeats the static unroll's
# instruction-level pipelining; iteration count is not the bottleneck,
# issue-slot utilization is. Bit-exact parity both ways
# (scripts/chip_parity.py). "rows" stays the default; the classes
# implementation is kept as the recorded experiment
# (COLVO_SAMPLER_SWEEP=classes to re-measure on future toolchains).
import os as _os

SWEEP_MODE = _os.environ.get("COLVO_SAMPLER_SWEEP", "rows")
SKIP_GROUPS = _os.environ.get("COLVO_SAMPLER_SKIPG", "0") == "1"


def _gather_mc(hw_true, src_ref, x, y, n_chan, with_grads=True):
    if SKIP_GROUPS:
        return _gather_block_mc_skipg(hw_true, src_ref, x, y, n_chan,
                                      with_grads)
    # the roll trick aligns an (8, LANES) source block with an 8-row
    # coord tile 1:1 — other tile heights keep the row sweep
    if SWEEP_MODE == "rows" or x.shape[0] != 8:
        return _gather_block_mc(hw_true, src_ref, x, y, n_chan, with_grads)
    return _gather_block_mc_cls(hw_true, src_ref, x, y, n_chan, with_grads)


def _gather(hw_true, src_ref, x, y, with_grads=True):
    if SWEEP_MODE == "rows" or x.shape[0] != 8:
        return _gather_block(hw_true, src_ref, x, y, with_grads)
    return _gather_block_cls(hw_true, src_ref, x, y, with_grads)


def _sample_kernel_mc(hw_true, n_chan, src_ref, x_ref, y_ref, out_ref):
    outs, _, _ = _gather_mc(hw_true, src_ref, x_ref[0], y_ref[0],
                            n_chan, with_grads=False)
    for c in range(n_chan):
        out_ref[0, c] = outs[c]


def _sample_grad_kernel_mc(hw_true, n_chan, src_ref, x_ref, y_ref,
                           out_ref, dx_ref, dy_ref):
    outs, dxs, dys = _gather_mc(hw_true, src_ref, x_ref[0], y_ref[0],
                                n_chan, with_grads=True)
    for c in range(n_chan):
        out_ref[0, c] = outs[c]
        dx_ref[0, c] = dxs[c]
        dy_ref[0, c] = dys[c]


def _chan_call(src, x, y, tile_h, with_grads, hw_true, group: int = 1):
    """pallas_call over (plane, row-tile, col-tile) with (1, C, H, W)
    source blocks — all channels of a frame in one grid cell.

    ``group`` > 1 evaluates ``group`` coordinate fields per source frame
    in ONE launch: coords plane ``i`` samples source plane ``i // group``
    (the multi-scale photometric stack — same sources, per-scale warps).
    Consecutive grid steps with an unchanged source block index skip the
    HBM re-fetch, so ordering coords scale-minor keeps each source plane
    VMEM-resident across its ``group`` warps."""
    b, c, h_src, w_src = src.shape
    n, h_out, w_out = x.shape  # n == b * group
    grid = (n, pl.cdiv(h_out, tile_h), pl.cdiv(w_out, LANES))
    tile_spec = pl.BlockSpec((1, tile_h, LANES), lambda i, j, k: (i, j, k),
                             memory_space=pltpu.VMEM)
    out_spec = pl.BlockSpec((1, c, tile_h, LANES), lambda i, j, k: (i, 0, j, k),
                            memory_space=pltpu.VMEM)
    out_sds = jax.ShapeDtypeStruct((n, c, h_out, w_out), jnp.float32)
    src_map = (lambda i, j, k: (i // group, 0, 0, 0)) if group > 1 else (
        lambda i, j, k: (i, 0, 0, 0))
    kwargs = dict(
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, c, h_src, w_src), src_map,
                         memory_space=pltpu.VMEM),
            tile_spec,
            tile_spec,
        ],
    )
    if with_grads:
        return pl.pallas_call(
            functools.partial(_sample_grad_kernel_mc, hw_true, c),
            out_specs=(out_spec, out_spec, out_spec),
            out_shape=(out_sds, out_sds, out_sds),
            **kwargs,
        )(src, x, y)
    return pl.pallas_call(
        functools.partial(_sample_kernel_mc, hw_true, c),
        out_specs=out_spec, out_shape=out_sds, **kwargs
    )(src, x, y)


def _sample_kernel(hw_true, src_ref, x_ref, y_ref, out_ref):
    out, _, _ = _gather(hw_true, src_ref, x_ref[0], y_ref[0],
                        with_grads=False)
    out_ref[0] = out


def _sample_grad_kernel(hw_true, src_ref, x_ref, y_ref, out_ref, dx_ref, dy_ref):
    out, dx, dy = _gather(hw_true, src_ref, x_ref[0], y_ref[0])
    out_ref[0] = out
    dx_ref[0] = dx
    dy_ref[0] = dy


def _plane_call(src, x, y, tile_h, with_grads, hw_true):
    n, h_src, w_src = src.shape
    _, h_out, w_out = x.shape
    grid = (n, pl.cdiv(h_out, tile_h), pl.cdiv(w_out, LANES))
    tile_spec = pl.BlockSpec((1, tile_h, LANES), lambda i, j, k: (i, j, k),
                             memory_space=pltpu.VMEM)
    out_sds = jax.ShapeDtypeStruct((n, h_out, w_out), jnp.float32)
    kwargs = dict(
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, h_src, w_src), lambda i, j, k: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            tile_spec,
            tile_spec,
        ],
    )
    if with_grads:
        return pl.pallas_call(
            functools.partial(_sample_grad_kernel, hw_true),
            out_specs=(tile_spec, tile_spec, tile_spec),
            out_shape=(out_sds, out_sds, out_sds),
            **kwargs,
        )(src, x, y)
    return pl.pallas_call(
        functools.partial(_sample_kernel, hw_true),
        out_specs=tile_spec, out_shape=out_sds, **kwargs
    )(src, x, y)


def _to_planes(img, coords):
    """(B,H,W,C) + (B,h,w,2) → planes (B·C,H,W_pad) and per-plane coords.

    Pads W up to a multiple of 128 (vreg-aligned lane loads). Indices are
    clamped to the true W before padding, so pad values are never selected.
    """
    b, h, w, c = img.shape
    _, ho, wo, _ = coords.shape
    planes = jnp.transpose(img, (0, 3, 1, 2)).reshape(b * c, h, w)
    w_pad = (w + LANES - 1) // LANES * LANES
    h_pad = (h + 7) // 8 * 8  # 8-row-aligned block loads in the kernel
    if w_pad != w or h_pad != h:
        planes = jnp.pad(planes, ((0, 0), (0, h_pad - h), (0, w_pad - w)))
    if c > 1:
        x = jnp.repeat(coords[..., 0], c, axis=0)
        y = jnp.repeat(coords[..., 1], c, axis=0)
    else:
        x, y = coords[..., 0], coords[..., 1]
    return planes.astype(jnp.float32), x, y, (b, c, ho, wo)


def _from_planes(out, shape):
    b, c, ho, wo = shape
    return jnp.transpose(out.reshape(b, c, ho, wo), (0, 2, 3, 1))


def _to_chan_planes(img, coords):
    """(B,H,W,C) + (B,h,w,2) → (B,C,H_pad,W_pad) + per-frame coords.

    The multi-channel layout shares one set of coords across channels
    (no ``jnp.repeat``); pads W to a multiple of 128 and H to a multiple
    of 8 exactly like ``_to_planes``.
    """
    b, h, w, c = img.shape
    _, ho, wo, _ = coords.shape
    planes = jnp.transpose(img, (0, 3, 1, 2))  # (B, C, H, W)
    w_pad = (w + LANES - 1) // LANES * LANES
    h_pad = (h + 7) // 8 * 8
    if w_pad != w or h_pad != h:
        planes = jnp.pad(planes, ((0, 0), (0, 0), (0, h_pad - h), (0, w_pad - w)))
    return (planes.astype(jnp.float32), coords[..., 0], coords[..., 1],
            (b, c, ho, wo))


def _from_chan(out, shape):
    b, c, ho, wo = shape
    return jnp.transpose(out, (0, 2, 3, 1))


@functools.partial(jax.custom_vjp, nondiff_argnums=(2,))
def bilinear_sample_pallas(
    img: jnp.ndarray, coords: jnp.ndarray, tile_h: int = DEFAULT_TILE_H
) -> jnp.ndarray:
    """Drop-in Pallas replacement for ``geometry.ops.bilinear_sample``.

    img (B, H, W, C) float32; coords (B, h, w, 2) pixel-space (x, y).
    Border padding; gradients flow to ``coords`` only (see module note).
    """
    planes, x, y, shape = _to_chan_planes(img, coords)
    out = _chan_call(planes, x, y, tile_h, False, img.shape[1:3])
    return _from_chan(out, shape)


def _fwd(img, coords, tile_h):
    planes, x, y, shape = _to_chan_planes(img, coords)
    out, dx, dy = _chan_call(planes, x, y, tile_h, True, img.shape[1:3])
    return _from_chan(out, shape), (
        _from_chan(dx, shape),
        _from_chan(dy, shape),
        img,
    )


def _bwd(tile_h, res, g):
    dx, dy, img = res
    gx = jnp.sum(g * dx, axis=-1)
    gy = jnp.sum(g * dy, axis=-1)
    d_coords = jnp.stack([gx, gy], axis=-1)
    return jnp.zeros_like(img), d_coords


bilinear_sample_pallas.defvjp(_fwd, _bwd)


@functools.partial(jax.custom_vjp, nondiff_argnums=(2, 3))
def bilinear_sample_pallas_grouped(
    img: jnp.ndarray,
    coords: jnp.ndarray,
    group: int,
    tile_h: int = DEFAULT_TILE_H,
) -> jnp.ndarray:
    """Sample ``group`` coordinate fields per source frame in ONE launch.

    img (B, H, W, C); coords (B·group, h, w, 2) ordered scale-minor:
    coords plane ``i`` samples img plane ``i // group``. One pallas_call
    replaces ``group`` separate launches, and each source plane is
    fetched to VMEM once per ``group`` warps instead of once per warp —
    the multi-scale photometric stack (loss.batched_photo) without the
    round-2 implementation's tiled-source staging. Gradients flow to
    ``coords`` only (same contract as ``bilinear_sample_pallas``).
    """
    planes, x, y, _ = _to_chan_planes(img, coords)
    out = _chan_call(planes, x, y, tile_h, False, img.shape[1:3], group)
    return jnp.transpose(out, (0, 2, 3, 1))


def _fwd_grouped(img, coords, group, tile_h):
    planes, x, y, _ = _to_chan_planes(img, coords)
    out, dx, dy = _chan_call(planes, x, y, tile_h, True, img.shape[1:3], group)
    tr = lambda a: jnp.transpose(a, (0, 2, 3, 1))
    return tr(out), (tr(dx), tr(dy), img)


def _bwd_grouped(group, tile_h, res, g):
    dx, dy, img = res
    gx = jnp.sum(g * dx, axis=-1)
    gy = jnp.sum(g * dy, axis=-1)
    return jnp.zeros_like(img), jnp.stack([gx, gy], axis=-1)


bilinear_sample_pallas_grouped.defvjp(_fwd_grouped, _bwd_grouped)
