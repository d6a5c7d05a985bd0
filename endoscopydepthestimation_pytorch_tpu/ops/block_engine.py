"""Whole-dense-block Pallas engine: forward AND backward in Pallas.

Round-3 design (PERF.md). The round-2 profile pinned the step on lane-tile
traffic: the dense block's growing channel concats (34 ms), the backward's
add_any accumulation into them (32 ms), and per-layer BN reductions
(22 ms). Every XLA-level remedy measured slower (PERF.md results 1-8);
the per-layer Pallas forward (ops/dense_conv.py) lost to the custom-VJP
fusion boundary, and the packed-block forward (ops/dense_block_packed.py)
lost to 12-lane-offset lane concats plus an unfused manual backward.

This engine removes all three costs structurally:

  * The block input ``x`` stays in the proven packed layout
    ``(B/8, 8d, H, G, 8b, C)`` (position-in-array-axis, batch octet in
    sublanes; ops/dense_conv.py) and is consumed by the 30-tap
    position-packed matmuls, K-chunked over channels.
  * Each layer's 12 new features are kept as a SEPARATE packed-96 side
    tensor ``(B/8, H, G, 8b, NF)`` with NF = 8*growth lanes (within-group
    position d and channel f share the lane axis: lane = d*growth + f) —
    exactly the raw kernel output layout, so a layer's output is its
    successors' input with NO transform and NO concatenate, ever.
  * Growth segments enter later layers' convs through block-structured
    (NF, NF) matmuls: per row-tap ky an interior block-tridiagonal matrix
    (within-group position shifts) plus one boundary matrix fed by a
    lane-masked combination of the two neighbor-group row slices (the
    group axis is untiled, so neighbor-group reads are free slices).
  * Per-segment BN statistics (sum, sum-sq) are accumulated inside the
    forward kernel from the output tile already in VMEM and emitted as
    tiny per-tile partials — no XLA re-read of the activations.
  * The BACKWARD is two Pallas kernels per layer. K1 computes, per
    K-chunk of input channels, the transposed-tap cotangent
    (gy @ W^T matmuls), the ReLU/BN-affine mask and scale application,
    and accumulates straight into ALIASED cotangent buffers (the add_any
    chains never exist); it also emits the per-channel (sum dpre,
    sum dpre*x) partials that the BN backward needs. K2 contracts the
    recomputed activation taps against gy in persistent f32 scratch
    (grid sequentiality) and emits the packed weight gradients whole.
    In the backward the K-chunk axis is purely parallel (it indexes
    INPUT channels, the contraction is over the NF output lanes), so K1
    runs it innermost and K2 outermost (under the dW accumulation).
  * The BN backward's through-statistics term is, per layer, AFFINE in
    the streamed buffer values: du = C1[c] + C2[c]*v[c] with
    C1/C2 computed from the (sum dpre, sum dpre*x) byproducts. The
    coefficients are accumulated layer-over-layer in XLA vector math and
    applied lazily — folded into the gy of each earlier layer's K1 pass
    (segments) and into one final elementwise fixup for x — so the
    reference's exact BN-through-batch-stats gradient costs no extra
    passes over the data.

Multi-chip: the kernels are per-shard; the cross-shard reductions (batch
statistics pmean, parameter-gradient psums, the global means inside
C1/C2) happen between pallas calls in XLA, exactly mirroring
ops/dense_block.py's shard_map contract.

Numerics: identical math to BN(concat)+ReLU+conv3x3 per layer (folded
batch norm, biased variance, eps 1e-5 — torch BatchNorm2d semantics);
forward/gradient parity vs the materialized path is tested in
tests/test_block_engine.py. Reference semantics: models.py:19-53 of the
upstream repo (DenseLayer/DenseBlock), utils.py:640-652 (BN init).

Applicability gate (callers check ``supported``): B % 8 == 0, W % 16 == 0
(>= 2 position groups), H % 8 == 0. Within FCDenseNet57 at 256x320 that
covers every block except the 16x20/8x10 levels, which stay on XLA.
"""
from __future__ import annotations

from functools import partial
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .dense_conv import (DELTA, CK, _ceil, pack_tap_weights,
                         to_packed_layout, from_packed_layout)

N_TAPS = 3 * (DELTA + 2)
INTERPRET = False  # flipped by CPU tests

# VMEM budget for picking the row-block size (bytes). Mosaic double-buffers
# pipelined operand blocks, so usable VMEM is well under the 16M cap
# (PERF.md round-2 result 7). Overridable for A/B scans.
import os as _os

_VMEM_TARGET = int(_os.environ.get("BLOCK_ENGINE_VMEM_TARGET",
                                   11 * 1024 * 1024))


def supported(b: int, h: int, w: int, n_layers: int) -> bool:
    """Shape gate for the engine (see module docstring)."""
    return (b % DELTA == 0 and w % (2 * DELTA) == 0 and h % 8 == 0
            and n_layers <= 6)


# ---------------------------------------------------------------------------
# packed-96 layout helpers


def unpack96(seg: jnp.ndarray, growth: int) -> jnp.ndarray:
    """(B/8, H, G, 8b, 8d*growth) -> (B, H, W, growth)."""
    b8, h, g, _, _ = seg.shape
    y = seg.reshape(b8, h, g, DELTA, DELTA, growth)   # (b8, h, g, 8b, 8d, f)
    y = y.transpose(0, 3, 1, 2, 4, 5)                 # (b8, 8b, h, g, 8d, f)
    return y.reshape(b8 * DELTA, h, g * DELTA, growth)


def pack96(y: jnp.ndarray) -> jnp.ndarray:
    """(B, H, W, growth) -> (B/8, H, G, 8b, 8d*growth). Inverse of
    ``unpack96``."""
    b, h, w, f = y.shape
    g = w // DELTA
    yt = y.reshape(b // DELTA, DELTA, h, g, DELTA, f)  # (b8, 8b, h, g, 8d, f)
    yt = yt.transpose(0, 2, 3, 1, 4, 5)                # (b8, h, g, 8b, 8d, f)
    return yt.reshape(b // DELTA, h, g, DELTA, DELTA * f)


def _struct(shape, dtype, operands):
    """ShapeDtypeStruct carrying the union of the operands' varying-axes
    set: under a vma-checked shard_map (jax >= 0.9) pallas_call requires
    out_shape.vma; every kernel output is per-shard compute that varies
    exactly like the data operands (cross-shard reductions happen in XLA
    between pallas calls)."""
    vma = frozenset().union(*(jax.typeof(a).vma for a in operands))
    return jax.ShapeDtypeStruct(shape, dtype, vma=vma)


def _fold(gamma, beta, mu, m2, eps):
    """Folded BN affine in f32: relu(v*scale + shift) == relu(bn(v)).
    Biased variance m2 - mu^2, matching ops/dense_block.py."""
    inv = lax.rsqrt(m2 - jnp.square(mu) + eps)
    scale = gamma * inv
    return scale, beta - mu * scale, inv


def _tile96(v12: jnp.ndarray) -> jnp.ndarray:
    """Per-channel (growth,) vector -> per-lane (8*growth,) vector."""
    return jnp.tile(v12, DELTA)


def _fold_lanes(vnf: jnp.ndarray, growth: int) -> jnp.ndarray:
    """Per-lane (NF,) sums -> per-channel (growth,) sums (sum over the 8
    within-group positions that share each channel)."""
    return vnf.reshape(DELTA, growth).sum(axis=0)


# ---------------------------------------------------------------------------
# growth-segment weight tables
#
# Forward contribution of segment s to a layer's conv output, per row tap
# ky: out[g] += act[g] @ GWI[ky] + cb[g] @ GWB[ky], where
#   GWI[ky][growth*dp + c, growth*d + f] = w[ky, d-dp+1, c, f]  (|d-dp|<=1)
#   GWB[ky]: block (7,0) = w[ky,0] (prev group's pos 7 -> pos 0) and
#            block (0,7) = w[ky,2] (next group's pos 0 -> pos 7)
#   cb[g] = hi-lanes(act[g-1]) + lo-lanes(act[g+1])  (built in-kernel)


# Constant position-selection masks (built once at import): the weight
# tables run INSIDE the train step (every step, weights change), so they
# must be single fused contractions — the earlier .at[].set loops cost
# ~100 tiny scatter/slice ops per step (measured in the step profile).
import numpy as _np

_S_INT = _np.zeros((3, DELTA, DELTA), _np.float32)   # [kx, dp, d]
for _d in range(DELTA):
    for _kx in range(3):
        _dp = _d + _kx - 1
        if 0 <= _dp < DELTA:
            _S_INT[_kx, _dp, _d] = 1.0
_S_BND = _np.zeros((3, DELTA, DELTA), _np.float32)
_S_BND[0, DELTA - 1, 0] = 1.0   # prev group's pos 7 -> pos 0 (kx=0)
_S_BND[2, 0, DELTA - 1] = 1.0   # next group's pos 0 -> pos 7 (kx=2)
_U_WT = _np.zeros((3, DELTA, DELTA), _np.float32)    # [kx, d, dt]
for _d in range(DELTA):
    for _dt in range(_d - 1, _d + 2):
        if 0 <= _dt < DELTA:
            _U_WT[_d - _dt + 1, _d, _dt] = 1.0
_V_WTB = _np.zeros((3, 2, DELTA), _np.float32)       # [kx, slot, dt]
_V_WTB[2, 0, DELTA - 1] = 1.0   # slot 0: d=0 via prev group (kx=2)
_V_WTB[0, 1, 0] = 1.0           # slot 1: d=7 via next group (kx=0)
_M_HI = _np.zeros((3, DELTA, DELTA), _np.float32)    # [kx, d, dp]
_M_HI[0, 0, DELTA - 1] = 1.0
_M_LO = _np.zeros((3, DELTA, DELTA), _np.float32)
_M_LO[2, DELTA - 1, 0] = 1.0
_W_DWP = _np.zeros((3, DELTA + 2, DELTA), _np.float32)  # [kx, q, d]
for _kx in range(3):
    for _d in range(DELTA):
        _W_DWP[_kx, _kx + _d, _d] = 1.0
del _d, _kx, _dp, _dt


def _gw_tables(w: jnp.ndarray) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """w: (3, 3, growth, growth) -> (GWI, GWB), each (3, NF, NF)."""
    growth = w.shape[2]
    nf = DELTA * growth
    gwi = jnp.einsum('xpd,yxcf->ypcdf', _S_INT, w).reshape(3, nf, nf)
    gwb = jnp.einsum('xpd,yxcf->ypcdf', _S_BND, w).reshape(3, nf, nf)
    return gwi, gwb


def _wt_tables(w: jnp.ndarray, cpad: int) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Transposed tap tables for the backward-dx of the x part.

    w: (3, 3, c, growth). Returns:
      WT  (8, 3, NF, cpad): da[pos d] += gy[rows ky-shifted] @ WT[d, ky]
          with WT[d, ky][growth*dt + f, c] = w[ky, d-dt+1, c, f]
      WTB (2, 3, NF, cpad): boundary — row-slot 0: d=0 reading the
          LEFT-shifted gy (prev group pos 7, kx=2); slot 1: d=7 reading
          the RIGHT-shifted gy (next group pos 0, kx=0).
    """
    _, _, c, growth = w.shape
    nf = DELTA * growth
    wt = jnp.einsum('xdt,yxcf->dytfc', _U_WT, w).reshape(DELTA, 3, nf, c)
    wtb = jnp.einsum('xbt,yxcf->bytfc', _V_WTB, w).reshape(2, 3, nf, c)
    pad = [(0, 0)] * 3 + [(0, cpad - c)]
    return jnp.pad(wt, pad), jnp.pad(wtb, pad)


def _gwt_tables(w: jnp.ndarray) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Transposed growth tables for backward-dseg.

    da_seg[g] += sum_ky  gy[g]   @ GWTI[ky]
               + gyr[g] @ GWTB_HI[ky]   (gyr[g] = gy[g+1])
               + gyl[g] @ GWTB_LO[ky]   (gyl[g] = gy[g-1])
    where GWTI = GWI^T per ky, GWTB_HI has block (0,7)=w[ky,0]^T (output
    lanes pos 7 fed by next group's pos 0), GWTB_LO has block
    (7,0)=w[ky,2]^T."""
    gwi, _ = _gw_tables(w)
    growth = w.shape[2]
    nf = DELTA * growth
    gwti = jnp.swapaxes(gwi, 1, 2)
    hi = jnp.einsum('xdp,yxcf->ydfpc', _M_HI, w).reshape(3, nf, nf)
    lo = jnp.einsum('xdp,yxcf->ydfpc', _M_LO, w).reshape(3, nf, nf)
    return gwti, hi, lo


def _unpack_dwp(dwp: jnp.ndarray, c: int, growth: int) -> jnp.ndarray:
    """Packed x-part weight-grad (30, cpad, NF) -> (3, 3, c, growth).
    Inverse of the scatter in dense_conv.pack_tap_weights — one fused
    contraction (runs inside every train step)."""
    cpad = dwp.shape[1]
    dwp_r = dwp.reshape(3, DELTA + 2, cpad, DELTA, growth)
    dw = jnp.einsum('xqd,yqcdf->yxcf', _W_DWP, dwp_r)
    return dw[:, :, :c, :]


def _unpack_dgw(dgwi: jnp.ndarray, dgwb: jnp.ndarray, growth: int
                ) -> jnp.ndarray:
    """Growth weight-grads ((3,NF,NF) interior + boundary) ->
    (3, 3, growth, growth) — two fused contractions."""
    dgwi_r = dgwi.reshape(3, DELTA, growth, DELTA, growth)
    dgwb_r = dgwb.reshape(3, DELTA, growth, DELTA, growth)
    return (jnp.einsum('xpd,ypcdf->yxcf', _S_INT, dgwi_r)
            + jnp.einsum('xpd,ypcdf->yxcf', _S_BND, dgwb_r))


# ---------------------------------------------------------------------------
# row-block sizing


def _pick_rows_db(h: int, g: int, cost_fn) -> Tuple[int, int]:
    """Pick (row-block r, d-block db). The big-CK operands carry the 8d
    position axis, which is split across the grid so the ROW block can
    grow at full resolution — halo read amplification is (r+2)/r, so r
    dominates bandwidth while db only amortizes per-grid-step overhead.
    Lexicographic: maximize r (traffic), then db (fewer grid steps),
    under the VMEM budget. cost_fn(r, db) -> estimated bytes."""
    best = (1, 1)
    for r in range(1, min(h, 16) + 1):
        if h % r or r * 8 * g > 4096:
            continue
        for db in (1, 2, 4, 8):
            if cost_fn(r, db) <= _VMEM_TARGET:
                if (r, db) > best:
                    best = (r, db)
    return best


def _rows_fwd(h: int, g: int, n_seg: int, c: int, growth: int,
              itemsize: int) -> Tuple[int, int]:
    nf = DELTA * growth
    row_seg = n_seg * g * DELTA * nf * itemsize
    fixed = 2 * N_TAPS * CK * nf * itemsize \
        + 2 * 3 * 2 * max(n_seg, 1) * nf * nf * itemsize

    def cost(r, db):
        row_x = db * g * DELTA * CK * itemsize
        scr = (r + 2) * (db + 1) * g * DELTA * CK * itemsize \
            + (r + 2) * (n_seg + 1) * g * DELTA * nf * itemsize \
            + r * g * DELTA * nf * 4  # f32 acc
        out = 2 * r * g * DELTA * nf * itemsize
        return fixed + 2 * (r + 2) * (row_x + row_seg) + scr + out

    return _pick_rows_db(h, g, cost)


def _rows_bwd1(h: int, g: int, n_seg: int, growth: int,
               itemsize: int) -> Tuple[int, int]:
    nf = DELTA * growth
    row_nf = (2 + n_seg) * g * DELTA * nf * itemsize
    fixed = 2 * (DELTA + 2) * 3 * nf * CK * itemsize \
        + 2 * 3 * 3 * max(n_seg, 1) * nf * nf * itemsize

    def cost(r, db):
        row_ck = 3 * db * g * DELTA * CK * itemsize  # xt + gx in/out
        scr = 3 * (r + 2) * g * DELTA * nf * itemsize
        return fixed + 2 * (r + 2) * (row_ck + row_nf) + scr

    return _pick_rows_db(h, g, cost)


def _rows_bwd2(h: int, g: int, n_seg: int, growth: int,
               itemsize: int) -> Tuple[int, int]:
    nf = DELTA * growth
    row_nf = (2 + n_seg) * g * DELTA * nf * itemsize
    fixed = N_TAPS * CK * nf * 4 + 2 * 3 * max(n_seg, 1) * nf * nf * 4

    def cost(r, db):
        row_x = db * g * DELTA * CK * itemsize
        scr = (r + 2) * (db + 1) * g * DELTA * CK * itemsize \
            + (r + 2) * (n_seg + 2) * g * DELTA * nf * itemsize
        return fixed + 2 * (r + 2) * (row_x + row_nf) + scr

    return _pick_rows_db(h, g, cost)


# ---------------------------------------------------------------------------
# forward kernel


def _fwd_kernel(*refs, r, g, c, growth, n_seg, db):
    """Grid (b8, n_t, n_k, n_d), d innermost. The 8d position axis of the
    packed x operand is split across the grid (d-blocks of ``db``) so the
    row block r stays large at full resolution — halo reads cost
    (r+2)/r, and the within-group column taps need no column halo at
    all: position d's tap is wp[ky, d], and the two cross-group boundary
    taps fire only on the edge d-steps (pl.when) from a g-shift of the
    resident slice. See module docstring."""
    nf = DELTA * growth
    (xt_top, xt_mid, xt_bot, sc_x, sh_x, wp) = refs[:6]
    pos = 6
    seg_refs = refs[pos:pos + 3 * n_seg]
    pos += 3 * n_seg
    if n_seg:
        seg_sc, seg_sh, gwi, gwb = refs[pos:pos + 4]
        pos += 4
    bias = refs[pos]
    pos += 1
    out_ref, ssum_ref, ssq_ref = refs[pos:pos + 3]
    pos += 3
    shm, shx, aseg, cb, acc_ref = refs[pos:pos + 5]

    t = pl.program_id(1)
    n_t = pl.num_programs(1)
    k = pl.program_id(2)
    n_k = pl.num_programs(2)
    d = pl.program_id(3)
    n_d = pl.num_programs(3)
    dt = xt_mid.dtype

    scale = sc_x[0].astype(dt)
    shift = sh_x[0].astype(dt)
    lane = jax.lax.broadcasted_iota(jnp.int32, (1, 1, 1, 1, CK), 4)
    valid = lane < (c - k * CK)

    def activate(v):
        v = v.astype(dt)
        a = jnp.maximum(v * scale + shift, jnp.zeros((), dt))
        return jnp.where(valid, a, jnp.zeros((), dt))

    zero_row = jnp.zeros((db, 1, g, DELTA, CK), dt)
    shm[:, 1:r + 1] = activate(xt_mid[0])
    shm[:, 0:1] = jnp.where(t > 0, activate(xt_top[0]), zero_row)
    shm[:, r + 1:r + 2] = jnp.where(t < n_t - 1, activate(xt_bot[0]), zero_row)

    m = r * g * DELTA

    @pl.when(jnp.logical_and(k == 0, d == 0))
    def _():
        acc_ref[...] = jnp.zeros_like(acc_ref)
        if n_seg:
            lane_s = jax.lax.broadcasted_iota(jnp.int32, (1, 1, 1, nf), 3)
            hi = lane_s >= nf - growth
            lo = lane_s < growth
            zrow = jnp.zeros((1, g, DELTA, nf), dt)
            for s in range(n_seg):
                ssc = seg_sc[s].astype(dt)
                ssh = seg_sh[s].astype(dt)

                def act_s(v):
                    return jnp.maximum(v.astype(dt) * ssc + ssh,
                                       jnp.zeros((), dt))

                s_top, s_mid, s_bot = seg_refs[3 * s:3 * s + 3]
                aseg[s, 1:r + 1] = act_s(s_mid[0])
                aseg[s, 0:1] = jnp.where(t > 0, act_s(s_top[0]), zrow)
                aseg[s, r + 1:r + 2] = jnp.where(t < n_t - 1, act_s(s_bot[0]),
                                                 zrow)
            gacc = jnp.zeros((m, nf), jnp.float32)
            for s in range(n_seg):
                av = aseg[s]
                cb[:, 1:g] = jnp.where(hi, av[:, 0:g - 1], jnp.zeros((), dt))
                cb[:, 0:1] = jnp.zeros_like(cb[:, 0:1])
                cb[:, 0:g - 1] = cb[:, 0:g - 1] + jnp.where(
                    lo, av[:, 1:g], jnp.zeros((), dt))
                for ky in range(3):
                    gacc = gacc + jnp.dot(
                        aseg[s, ky:ky + r].reshape(m, nf), gwi[s, ky],
                        preferred_element_type=jnp.float32)
                    gacc = gacc + jnp.dot(
                        cb[ky:ky + r].reshape(m, nf), gwb[s, ky],
                        preferred_element_type=jnp.float32)
            acc_ref[...] = gacc

    acc = acc_ref[...]
    for dd in range(db):
        pos_d = d * db + dd  # global within-group position (traced)
        for ky in range(3):
            acc = acc + jnp.dot(shm[dd, ky:ky + r].reshape(m, CK),
                                wp[ky * (DELTA + 2) + pos_d + 1],
                                preferred_element_type=jnp.float32)
    acc_ref[...] = acc

    # cross-group boundary taps: kxp=-1 (prev group's pos 7 -> pos 0) on
    # the step holding position DELTA-1, kxp=DELTA on the step holding
    # position 0. shx is shared — pl.when bodies run in program order.
    @pl.when(d == n_d - 1)
    def _():
        shx[:, 0:1] = jnp.zeros_like(shx[:, 0:1])
        shx[:, 1:g] = shm[db - 1, :, 0:g - 1]
        a = acc_ref[...]
        for ky in range(3):
            a = a + jnp.dot(shx[ky:ky + r].reshape(m, CK),
                            wp[ky * (DELTA + 2)],
                            preferred_element_type=jnp.float32)
        acc_ref[...] = a

    @pl.when(d == 0)
    def _():
        shx[:, g - 1:g] = jnp.zeros_like(shx[:, g - 1:g])
        shx[:, 0:g - 1] = shm[0, :, 1:g]
        a = acc_ref[...]
        for ky in range(3):
            a = a + jnp.dot(shx[ky:ky + r].reshape(m, CK),
                            wp[ky * (DELTA + 2) + DELTA + 1],
                            preferred_element_type=jnp.float32)
        acc_ref[...] = a

    @pl.when(jnp.logical_and(k == n_k - 1, d == n_d - 1))
    def _():
        # read acc_ref (NOT the local acc): the boundary pl.when bodies
        # above accumulate into the ref after the main store
        y = (acc_ref[...] + bias[0].astype(jnp.float32)).astype(dt)
        out_ref[0, 0] = y.reshape(r, g, DELTA, nf)
        # stats partials keep the batch-octet sublane axis (DELTA, nf) so
        # the output block is Mosaic-legal (trailing dims (8, nf)); XLA
        # folds the remaining axes
        yf = y.astype(jnp.float32).reshape(r * g, DELTA, nf)
        ssum_ref[0, 0] = jnp.sum(yf, axis=0)
        ssq_ref[0, 0] = jnp.sum(yf * yf, axis=0)


def _layer_fwd(xt, segs, sc_x, sh_x, wp, seg_sc, seg_sh, gwi, gwb, bias_nf,
               growth: int):
    """One dense layer: returns (seg_out, sum_partials, sumsq_partials)."""
    b8, _, h, g, _, c = xt.shape
    nf = DELTA * growth
    n_seg = len(segs)
    n_k = _ceil(c, CK)
    r, db = _rows_fwd(h, g, n_seg, c, growth, xt.dtype.itemsize)
    n_d = DELTA // db
    m = r * g * DELTA

    in_specs = [
        pl.BlockSpec((1, db, 1, g, DELTA, CK),
                     lambda i, t, k, d: (i, d, jnp.maximum(t * r - 1, 0),
                                         0, 0, k),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, db, r, g, DELTA, CK),
                     lambda i, t, k, d: (i, d, t, 0, 0, k),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, db, 1, g, DELTA, CK),
                     lambda i, t, k, d: (i, d, jnp.minimum(t * r + r, h - 1),
                                         0, 0, k),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, CK), lambda i, t, k, d: (0, k),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, CK), lambda i, t, k, d: (0, k),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((N_TAPS, CK, nf), lambda i, t, k, d: (0, k, 0),
                     memory_space=pltpu.VMEM),
    ]
    operands = [xt, xt, xt, sc_x, sh_x, wp]
    for s in range(n_seg):
        in_specs += [
            pl.BlockSpec((1, 1, g, DELTA, nf),
                         lambda i, t, k, d: (i, jnp.maximum(t * r - 1, 0),
                                             0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, r, g, DELTA, nf),
                         lambda i, t, k, d: (i, t, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, g, DELTA, nf),
                         lambda i, t, k, d: (i, jnp.minimum(t * r + r, h - 1),
                                             0, 0, 0),
                         memory_space=pltpu.VMEM),
        ]
        operands += [segs[s], segs[s], segs[s]]
    if n_seg:
        in_specs += [
            pl.BlockSpec((n_seg, nf), lambda i, t, k, d: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((n_seg, nf), lambda i, t, k, d: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((n_seg, 3, nf, nf), lambda i, t, k, d: (0, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((n_seg, 3, nf, nf), lambda i, t, k, d: (0, 0, 0, 0),
                         memory_space=pltpu.VMEM),
        ]
        operands += [seg_sc, seg_sh, gwi, gwb]
    in_specs.append(pl.BlockSpec((1, nf), lambda i, t, k, d: (0, 0),
                                 memory_space=pltpu.VMEM))
    operands.append(bias_nf)

    out_shapes = [
        _struct((b8, h // r, r, g, DELTA, nf), xt.dtype, operands),
        _struct((b8, h // r, DELTA, nf), jnp.float32, operands),
        _struct((b8, h // r, DELTA, nf), jnp.float32, operands),
    ]
    out_specs = [
        pl.BlockSpec((1, 1, r, g, DELTA, nf),
                     lambda i, t, k, d: (i, t, 0, 0, 0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, 1, DELTA, nf), lambda i, t, k, d: (i, t, 0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, 1, DELTA, nf), lambda i, t, k, d: (i, t, 0, 0),
                     memory_space=pltpu.VMEM),
    ]
    scratch = [
        pltpu.VMEM((db, r + 2, g, DELTA, CK), xt.dtype),
        pltpu.VMEM((r + 2, g, DELTA, CK), xt.dtype),
        pltpu.VMEM((max(n_seg, 1), r + 2, g, DELTA, nf), xt.dtype),
        pltpu.VMEM((r + 2, g, DELTA, nf), xt.dtype),
        pltpu.VMEM((m, nf), jnp.float32),
    ]
    out, ssum, ssq = pl.pallas_call(
        partial(_fwd_kernel, r=r, g=g, c=c, growth=growth, n_seg=n_seg,
                db=db),
        grid=(b8, h // r, n_k, n_d),
        in_specs=in_specs,
        out_specs=out_specs,
        out_shape=out_shapes,
        scratch_shapes=scratch,
        interpret=INTERPRET,
    )(*operands)
    seg_out = out.reshape(b8, h, g, DELTA, nf)
    return seg_out, ssum, ssq


# ---------------------------------------------------------------------------
# forward orchestration


def _layer_tables(kernel, c0: int, growth: int, dt):
    """XLA-side weight-table construction for one layer's forward."""
    cpad = _ceil(c0, CK) * CK
    wp = pack_tap_weights(kernel[:, :, :c0, :]).astype(dt)
    gwis, gwbs = [], []
    n_seg = (kernel.shape[2] - c0) // growth
    for s in range(n_seg):
        ws = lax.slice_in_dim(kernel, c0 + s * growth, c0 + (s + 1) * growth,
                              axis=2)
        gwi, gwb = _gw_tables(ws)
        gwis.append(gwi)
        gwbs.append(gwb)
    if n_seg:
        gwi = jnp.stack(gwis).astype(dt)
        gwb = jnp.stack(gwbs).astype(dt)
    else:
        gwi = gwb = None
    return wp, gwi, gwb, cpad


def _pmean(v, axis_name):
    return lax.pmean(v, axis_name) if axis_name is not None else v


def _engine_impl(dims, x, gammas, betas, kernels, biases):
    growth, n_layers, eps, axis_name = dims
    b, h, w, c0 = x.shape
    dt = x.dtype
    nf = DELTA * growth

    xt = to_packed_layout(x)
    xf = x.astype(jnp.float32)
    mu_x = _pmean(jnp.mean(xf, axis=(0, 1, 2)), axis_name)
    m2_x = _pmean(jnp.mean(jnp.square(xf), axis=(0, 1, 2)), axis_name)
    n_loc = b * h * w

    mus = [mu_x]
    m2s = [m2_x]
    segs = []
    for j in range(n_layers):
        gma, bta = gammas[j], betas[j]
        sc_x, sh_x, _ = _fold(gma[:c0], bta[:c0], mu_x, m2_x, eps)
        wp, gwi, gwb, cpad = _layer_tables(kernels[j], c0, growth, dt)
        sc_x = jnp.pad(sc_x, (0, cpad - c0)).reshape(1, cpad)
        sh_x = jnp.pad(sh_x, (0, cpad - c0)).reshape(1, cpad)
        if j:
            seg_sc, seg_sh = [], []
            for s in range(j):
                gs = gma[c0 + s * growth:c0 + (s + 1) * growth]
                bs = bta[c0 + s * growth:c0 + (s + 1) * growth]
                ssc, ssh, _ = _fold(gs, bs, mus[1 + s], m2s[1 + s], eps)
                seg_sc.append(_tile96(ssc))
                seg_sh.append(_tile96(ssh))
            seg_sc = jnp.stack(seg_sc)
            seg_sh = jnp.stack(seg_sh)
        else:
            seg_sc = seg_sh = None
        bias_nf = _tile96(biases[j].astype(jnp.float32)).reshape(1, nf)
        seg, ssum, ssq = _layer_fwd(xt, segs, sc_x, sh_x, wp, seg_sc, seg_sh,
                                    gwi, gwb, bias_nf, growth)
        mu_j = _fold_lanes(jnp.sum(ssum, axis=(0, 1, 2)), growth) / n_loc
        m2_j = _fold_lanes(jnp.sum(ssq, axis=(0, 1, 2)), growth) / n_loc
        mus.append(_pmean(mu_j, axis_name))
        m2s.append(_pmean(m2_j, axis_name))
        segs.append(seg)

    parts = [from_packed_layout(xt)] + [unpack96(s, growth) for s in segs]
    buf = jnp.concatenate(parts, axis=-1)
    mu = jnp.concatenate(mus)
    m2 = jnp.concatenate(m2s)
    return buf, mu, m2, xt, tuple(segs), tuple(mus), tuple(m2s)


# ---------------------------------------------------------------------------
# backward kernel K1: dx / dseg / BN sums


def _bwd1_kernel(*refs, r, g, c, growth, n_seg, n_k, db):
    nf = DELTA * growth
    (gy_top, gy_mid, gy_bot, sj_top, sj_mid, sj_bot, c1j, c2j,
     xt_mid, sc_x, sh_x, wt, wtb) = refs[:13]
    pos = 13
    seg_mids = refs[pos:pos + n_seg]
    pos += n_seg
    if n_seg:
        seg_sc, seg_sh, gwti, gwthi, gwtlo = refs[pos:pos + 5]
        pos += 5
    gx_in = refs[pos]
    pos += 1
    gseg_ins = refs[pos:pos + n_seg]
    pos += n_seg
    gx_out = refs[pos]
    pos += 1
    gseg_outs = refs[pos:pos + n_seg]
    pos += n_seg
    dsx_out, dss_out, dbias_out = refs[pos:pos + 3]
    pos += 3
    gys, gyl, gyr, s_dsx, s_dss, s_db = refs[pos:pos + 6]

    i = pl.program_id(0)
    b8 = pl.num_programs(0)
    t = pl.program_id(1)
    n_t = pl.num_programs(1)
    k = pl.program_id(2)
    d = pl.program_id(3)
    n_d = pl.num_programs(3)
    dt = gy_mid.dtype
    m = r * g * DELTA
    f32 = jnp.float32

    kd0 = jnp.logical_and(k == 0, d == 0)
    first = jnp.logical_and(jnp.logical_and(i == 0, t == 0), kd0)
    last = jnp.logical_and(
        jnp.logical_and(i == b8 - 1, t == n_t - 1),
        jnp.logical_and(k == n_k - 1, d == n_d - 1))

    @pl.when(first)
    def _():
        s_dsx[...] = jnp.zeros_like(s_dsx)
        s_dss[...] = jnp.zeros_like(s_dss)
        s_db[...] = jnp.zeros_like(s_db)

    @pl.when(kd0)
    def _():
        c1 = c1j[0].astype(f32)
        c2 = c2j[0].astype(f32)

        def geff(gv, sv):
            return (gv.astype(f32) + c1 + c2 * sv.astype(f32)).astype(dt)

        zrow = jnp.zeros((1, g, DELTA, nf), dt)
        gys[1:r + 1] = geff(gy_mid[0], sj_mid[0])
        gys[0:1] = jnp.where(t > 0, geff(gy_top[0], sj_top[0]), zrow)
        gys[r + 1:r + 2] = jnp.where(t < n_t - 1, geff(gy_bot[0], sj_bot[0]),
                                     zrow)
        gyl[:, 0:1] = jnp.zeros_like(gyl[:, 0:1])
        gyl[:, 1:g] = gys[:, 0:g - 1]
        gyr[:, g - 1:g] = jnp.zeros_like(gyr[:, g - 1:g])
        gyr[:, 0:g - 1] = gys[:, 1:g]
        s_db[...] = s_db[...] + jnp.sum(
            gys[1:r + 1].astype(f32), axis=(0, 1, 2)).reshape(1, nf)
        if n_seg:
            for s in range(n_seg):
                da = jnp.zeros((m, nf), f32)
                for ky in range(3):
                    da = da + jnp.dot(gys[2 - ky:2 - ky + r].reshape(m, nf),
                                      gwti[s, ky],
                                      preferred_element_type=f32)
                    da = da + jnp.dot(gyr[2 - ky:2 - ky + r].reshape(m, nf),
                                      gwthi[s, ky],
                                      preferred_element_type=f32)
                    da = da + jnp.dot(gyl[2 - ky:2 - ky + r].reshape(m, nf),
                                      gwtlo[s, ky],
                                      preferred_element_type=f32)
                da = da.reshape(r, g, DELTA, nf)
                sv = seg_mids[s][0]
                ssc = seg_sc[s].astype(dt)
                ssh = seg_sh[s].astype(dt)
                a = jnp.maximum(sv.astype(dt) * ssc + ssh, jnp.zeros((), dt))
                # mask compare in f32: Mosaic rejects bf16 cmpf on v5e
                dpre = jnp.where(a.astype(f32) > 0, da, jnp.zeros((), f32))
                gseg_outs[s][0] = (gseg_ins[s][0].astype(f32)
                                   + dpre * seg_sc[s].astype(f32)).astype(dt)
                svf = sv.astype(f32)
                s_dss[s, 0] = s_dss[s, 0] + jnp.sum(dpre * svf, axis=(0, 1, 2))
                s_dss[s, 1] = s_dss[s, 1] + jnp.sum(dpre, axis=(0, 1, 2))

    # x part: every (k, d) step (both axes purely parallel). The two
    # cross-group boundary terms fire only on the edge d-steps; they are
    # additively separable through the ReLU mask (dpre = mask * da), so
    # pl.when adds their masked contribution onto the already-written
    # gx_out / s_dsx — same math, two bf16 roundings on positions 0 and
    # DELTA-1 instead of one.
    scale = sc_x[0].astype(f32)
    scale_dt = sc_x[0].astype(dt)
    shift_dt = sh_x[0].astype(dt)
    lane = jax.lax.broadcasted_iota(jnp.int32, (1, 1, 1, CK), 3)
    valid = lane < (c - k * CK)

    def masked(xv, da):
        a = jnp.maximum(xv.astype(dt) * scale_dt + shift_dt,
                        jnp.zeros((), dt))
        a = jnp.where(valid, a, jnp.zeros((), dt))
        return jnp.where(a.astype(f32) > 0, da, jnp.zeros((), f32))

    for dd in range(db):
        da = jnp.zeros((m, CK), f32)
        for ky in range(3):
            da = da + jnp.dot(gys[2 - ky:2 - ky + r].reshape(m, nf),
                              wt[dd, ky], preferred_element_type=f32)
        da = da.reshape(r, g, DELTA, CK)
        xv = xt_mid[0, dd]
        dpre = masked(xv, da)
        gx_out[0, dd] = (gx_in[0, dd].astype(f32) + dpre * scale).astype(dt)
        xvf = jnp.where(valid, xv.astype(f32), jnp.zeros((), f32))
        s_dsx[k, 0] = s_dsx[k, 0] + jnp.sum(dpre * xvf, axis=(0, 1, 2))
        s_dsx[k, 1] = s_dsx[k, 1] + jnp.sum(dpre, axis=(0, 1, 2))

    @pl.when(d == 0)  # global position 0: prev-group tap (wtb slot 0)
    def _():
        da = jnp.zeros((m, CK), f32)
        for ky in range(3):
            da = da + jnp.dot(gyl[2 - ky:2 - ky + r].reshape(m, nf),
                              wtb[0, ky], preferred_element_type=f32)
        xv = xt_mid[0, 0]
        dpre = masked(xv, da.reshape(r, g, DELTA, CK))
        gx_out[0, 0] = (gx_out[0, 0].astype(f32) + dpre * scale).astype(dt)
        xvf = jnp.where(valid, xv.astype(f32), jnp.zeros((), f32))
        s_dsx[k, 0] = s_dsx[k, 0] + jnp.sum(dpre * xvf, axis=(0, 1, 2))
        s_dsx[k, 1] = s_dsx[k, 1] + jnp.sum(dpre, axis=(0, 1, 2))

    @pl.when(d == n_d - 1)  # global position DELTA-1: next-group tap
    def _():
        da = jnp.zeros((m, CK), f32)
        for ky in range(3):
            da = da + jnp.dot(gyr[2 - ky:2 - ky + r].reshape(m, nf),
                              wtb[1, ky], preferred_element_type=f32)
        xv = xt_mid[0, db - 1]
        dpre = masked(xv, da.reshape(r, g, DELTA, CK))
        gx_out[0, db - 1] = (gx_out[0, db - 1].astype(f32)
                             + dpre * scale).astype(dt)
        xvf = jnp.where(valid, xv.astype(f32), jnp.zeros((), f32))
        s_dsx[k, 0] = s_dsx[k, 0] + jnp.sum(dpre * xvf, axis=(0, 1, 2))
        s_dsx[k, 1] = s_dsx[k, 1] + jnp.sum(dpre, axis=(0, 1, 2))

    @pl.when(last)
    def _():
        dsx_out[...] = s_dsx[...]
        dss_out[...] = s_dss[...]
        dbias_out[...] = s_db[...]


def _layer_bwd1(xt, segs, seg_j, gy, gx_acc, gseg_accs, sc_x, sh_x,
                seg_sc, seg_sh, wt, wtb, gwti, gwthi, gwtlo, c1j, c2j,
                growth: int):
    """Backward K1 for one layer. Returns (gx_acc', gseg_accs',
    dsums_x (n_k,2,CK), dseg_sums (n_seg,2,NF), dbias (1,NF))."""
    b8, _, h, g, _, c = xt.shape
    nf = DELTA * growth
    n_seg = len(segs)
    n_k = _ceil(c, CK)
    r, db = _rows_bwd1(h, g, n_seg, growth, xt.dtype.itemsize)
    n_d = DELTA // db

    def seg_top_spec():
        return pl.BlockSpec((1, 1, g, DELTA, nf),
                            lambda i, t, k, d: (i, jnp.maximum(t * r - 1, 0),
                                                0, 0, 0),
                            memory_space=pltpu.VMEM)

    def seg_mid_spec():
        return pl.BlockSpec((1, r, g, DELTA, nf),
                            lambda i, t, k, d: (i, t, 0, 0, 0),
                            memory_space=pltpu.VMEM)

    def seg_bot_spec():
        return pl.BlockSpec((1, 1, g, DELTA, nf),
                            lambda i, t, k, d: (i, jnp.minimum(t * r + r,
                                                               h - 1),
                                                0, 0, 0),
                            memory_space=pltpu.VMEM)

    vec_spec = pl.BlockSpec((1, nf), lambda i, t, k, d: (0, 0),
                            memory_space=pltpu.VMEM)
    in_specs = [seg_top_spec(), seg_mid_spec(), seg_bot_spec(),
                seg_top_spec(), seg_mid_spec(), seg_bot_spec(),
                vec_spec, vec_spec,
                pl.BlockSpec((1, db, r, g, DELTA, CK),
                             lambda i, t, k, d: (i, d, t, 0, 0, k),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, CK), lambda i, t, k, d: (0, k),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, CK), lambda i, t, k, d: (0, k),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((db, 3, nf, CK),
                             lambda i, t, k, d: (d, 0, 0, k),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((2, 3, nf, CK), lambda i, t, k, d: (0, 0, 0, k),
                             memory_space=pltpu.VMEM)]
    operands = [gy, gy, gy, seg_j, seg_j, seg_j, c1j, c2j, xt, sc_x, sh_x,
                wt, wtb]
    for s in range(n_seg):
        in_specs.append(seg_mid_spec())
        operands.append(segs[s])
    if n_seg:
        in_specs += [
            pl.BlockSpec((n_seg, nf), lambda i, t, k, d: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((n_seg, nf), lambda i, t, k, d: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((n_seg, 3, nf, nf), lambda i, t, k, d: (0, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((n_seg, 3, nf, nf), lambda i, t, k, d: (0, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((n_seg, 3, nf, nf), lambda i, t, k, d: (0, 0, 0, 0),
                         memory_space=pltpu.VMEM),
        ]
        operands += [seg_sc, seg_sh, gwti, gwthi, gwtlo]
    gx_spec = pl.BlockSpec((1, db, r, g, DELTA, CK),
                           lambda i, t, k, d: (i, d, t, 0, 0, k),
                           memory_space=pltpu.VMEM)
    n_in = len(operands)
    in_specs.append(gx_spec)
    operands.append(gx_acc)
    for s in range(n_seg):
        in_specs.append(seg_mid_spec())
        operands.append(gseg_accs[s])

    out_specs = [gx_spec] + [seg_mid_spec() for _ in range(n_seg)] + [
        pl.BlockSpec((n_k, 2, CK), lambda i, t, k, d: (0, 0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((max(n_seg, 1), 2, nf), lambda i, t, k, d: (0, 0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, nf), lambda i, t, k, d: (0, 0),
                     memory_space=pltpu.VMEM),
    ]
    out_shapes = [_struct(gx_acc.shape, gx_acc.dtype, operands)] + [
        _struct(a.shape, a.dtype, operands) for a in gseg_accs] + [
        _struct((n_k, 2, CK), jnp.float32, operands),
        _struct((max(n_seg, 1), 2, nf), jnp.float32, operands),
        _struct((1, nf), jnp.float32, operands),
    ]
    scratch = [
        pltpu.VMEM((r + 2, g, DELTA, nf), xt.dtype),
        pltpu.VMEM((r + 2, g, DELTA, nf), xt.dtype),
        pltpu.VMEM((r + 2, g, DELTA, nf), xt.dtype),
        pltpu.VMEM((n_k, 2, CK), jnp.float32),
        pltpu.VMEM((max(n_seg, 1), 2, nf), jnp.float32),
        pltpu.VMEM((1, nf), jnp.float32),
    ]
    aliases = {n_in: 0}
    for s in range(n_seg):
        aliases[n_in + 1 + s] = 1 + s
    outs = pl.pallas_call(
        partial(_bwd1_kernel, r=r, g=g, c=c, growth=growth, n_seg=n_seg,
                n_k=n_k, db=db),
        grid=(b8, h // r, n_k, n_d),
        in_specs=in_specs,
        out_specs=out_specs,
        out_shape=out_shapes,
        scratch_shapes=scratch,
        input_output_aliases=aliases,
        interpret=INTERPRET,
    )(*operands)
    gx_new = outs[0]
    gseg_new = list(outs[1:1 + n_seg])
    dsums_x, dseg_sums, dbias = outs[1 + n_seg:]
    return gx_new, gseg_new, dsums_x, dseg_sums, dbias


# ---------------------------------------------------------------------------
# backward kernel K2: weight gradients


def _bwd2_kernel(*refs, r, g, c, growth, n_seg, db):
    nf = DELTA * growth
    (xt_top, xt_mid, xt_bot, sc_x, sh_x, gy_mid, sj_mid, c1j, c2j) = refs[:9]
    pos = 9
    seg_refs = refs[pos:pos + 3 * n_seg]
    pos += 3 * n_seg
    if n_seg:
        seg_sc, seg_sh = refs[pos:pos + 2]
        pos += 2
    dwp_out, dgwi_out, dgwb_out = refs[pos:pos + 3]
    pos += 3
    shm, shx, aseg, cb, gys_c, s_dwp, s_dgwi, s_dgwb = refs[pos:pos + 8]

    k = pl.program_id(0)
    i = pl.program_id(1)
    b8 = pl.num_programs(1)
    t = pl.program_id(2)
    n_t = pl.num_programs(2)
    d = pl.program_id(3)
    n_d = pl.num_programs(3)
    dt = xt_mid.dtype
    f32 = jnp.float32
    m = r * g * DELTA

    scale = sc_x[0].astype(dt)
    shift = sh_x[0].astype(dt)
    lane = jax.lax.broadcasted_iota(jnp.int32, (1, 1, 1, 1, CK), 4)
    valid = lane < (c - k * CK)

    def activate(v):
        v = v.astype(dt)
        a = jnp.maximum(v * scale + shift, jnp.zeros((), dt))
        return jnp.where(valid, a, jnp.zeros((), dt))

    zero_row = jnp.zeros((db, 1, g, DELTA, CK), dt)
    shm[:, 1:r + 1] = activate(xt_mid[0])
    shm[:, 0:1] = jnp.where(t > 0, activate(xt_top[0]), zero_row)
    shm[:, r + 1:r + 2] = jnp.where(t < n_t - 1, activate(xt_bot[0]), zero_row)

    tile_first = jnp.logical_and(i == 0, t == 0)
    tile_last = jnp.logical_and(i == b8 - 1, t == n_t - 1)

    @pl.when(d == 0)
    def _():
        c1 = c1j[0].astype(f32)
        c2 = c2j[0].astype(f32)
        gys_c[...] = (gy_mid[0].astype(f32)
                      + c1 + c2 * sj_mid[0].astype(f32)).astype(dt)

    gym = gys_c[...].reshape(m, nf)

    @pl.when(jnp.logical_and(tile_first, d == 0))
    def _():
        s_dwp[...] = jnp.zeros_like(s_dwp)

    @pl.when(jnp.logical_and(jnp.logical_and(tile_first, k == 0), d == 0))
    def _():
        s_dgwi[...] = jnp.zeros_like(s_dgwi)
        s_dgwb[...] = jnp.zeros_like(s_dgwb)

    dn = (((0,), (0,)), ((), ()))
    for dd in range(db):
        pos_d = d * db + dd
        for ky in range(3):
            idx = ky * (DELTA + 2) + pos_d + 1
            s_dwp[idx] = s_dwp[idx] + lax.dot_general(
                shm[dd, ky:ky + r].reshape(m, CK), gym, dn,
                preferred_element_type=f32)

    @pl.when(d == n_d - 1)  # prev-group pos 7 tap (kxp = -1)
    def _():
        shx[:, 0:1] = jnp.zeros_like(shx[:, 0:1])
        shx[:, 1:g] = shm[db - 1, :, 0:g - 1]
        for ky in range(3):
            idx = ky * (DELTA + 2)
            s_dwp[idx] = s_dwp[idx] + lax.dot_general(
                shx[ky:ky + r].reshape(m, CK), gym, dn,
                preferred_element_type=f32)

    @pl.when(d == 0)  # next-group pos 0 tap (kxp = DELTA)
    def _():
        shx[:, g - 1:g] = jnp.zeros_like(shx[:, g - 1:g])
        shx[:, 0:g - 1] = shm[0, :, 1:g]
        for ky in range(3):
            idx = ky * (DELTA + 2) + DELTA + 1
            s_dwp[idx] = s_dwp[idx] + lax.dot_general(
                shx[ky:ky + r].reshape(m, CK), gym, dn,
                preferred_element_type=f32)

    @pl.when(jnp.logical_and(k == 0, d == 0))
    def _():
        if n_seg:
            lane_s = jax.lax.broadcasted_iota(jnp.int32, (1, 1, 1, nf), 3)
            hi = lane_s >= nf - growth
            lo = lane_s < growth
            zrow = jnp.zeros((1, g, DELTA, nf), dt)
            for s in range(n_seg):
                ssc = seg_sc[s].astype(dt)
                ssh = seg_sh[s].astype(dt)

                def act_s(v):
                    return jnp.maximum(v.astype(dt) * ssc + ssh,
                                       jnp.zeros((), dt))

                s_top, s_mid, s_bot = seg_refs[3 * s:3 * s + 3]
                aseg[s, 1:r + 1] = act_s(s_mid[0])
                aseg[s, 0:1] = jnp.where(t > 0, act_s(s_top[0]), zrow)
                aseg[s, r + 1:r + 2] = jnp.where(t < n_t - 1, act_s(s_bot[0]),
                                                 zrow)
            for s in range(n_seg):
                av = aseg[s]
                cb[:, 1:g] = jnp.where(hi, av[:, 0:g - 1], jnp.zeros((), dt))
                cb[:, 0:1] = jnp.zeros_like(cb[:, 0:1])
                cb[:, 0:g - 1] = cb[:, 0:g - 1] + jnp.where(
                    lo, av[:, 1:g], jnp.zeros((), dt))
                for ky in range(3):
                    s_dgwi[s, ky] = s_dgwi[s, ky] + lax.dot_general(
                        aseg[s, ky:ky + r].reshape(m, nf), gym, dn,
                        preferred_element_type=f32)
                    s_dgwb[s, ky] = s_dgwb[s, ky] + lax.dot_general(
                        cb[ky:ky + r].reshape(m, nf), gym, dn,
                        preferred_element_type=f32)

    @pl.when(jnp.logical_and(tile_last, d == n_d - 1))
    def _():
        dwp_out[0] = s_dwp[...]

    @pl.when(jnp.logical_and(jnp.logical_and(tile_last, k == 0), d == 0))
    def _():
        dgwi_out[...] = s_dgwi[...]
        dgwb_out[...] = s_dgwb[...]


def _layer_bwd2(xt, segs, seg_j, gy, sc_x, sh_x, seg_sc, seg_sh, c1j, c2j,
                growth: int):
    """Backward K2: returns (dwp (n_k,30,CK,NF), dgwi, dgwb)."""
    b8, _, h, g, _, c = xt.shape
    nf = DELTA * growth
    n_seg = len(segs)
    n_k = _ceil(c, CK)
    r, db = _rows_bwd2(h, g, n_seg, growth, xt.dtype.itemsize)
    n_d = DELTA // db

    in_specs = [
        pl.BlockSpec((1, db, 1, g, DELTA, CK),
                     lambda k, i, t, d: (i, d, jnp.maximum(t * r - 1, 0),
                                         0, 0, k),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, db, r, g, DELTA, CK),
                     lambda k, i, t, d: (i, d, t, 0, 0, k),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, db, 1, g, DELTA, CK),
                     lambda k, i, t, d: (i, d, jnp.minimum(t * r + r, h - 1),
                                         0, 0, k),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, CK), lambda k, i, t, d: (0, k),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, CK), lambda k, i, t, d: (0, k),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, r, g, DELTA, nf), lambda k, i, t, d: (i, t, 0, 0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, r, g, DELTA, nf), lambda k, i, t, d: (i, t, 0, 0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, nf), lambda k, i, t, d: (0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, nf), lambda k, i, t, d: (0, 0),
                     memory_space=pltpu.VMEM),
    ]
    operands = [xt, xt, xt, sc_x, sh_x, gy, seg_j, c1j, c2j]
    for s in range(n_seg):
        in_specs += [
            pl.BlockSpec((1, 1, g, DELTA, nf),
                         lambda k, i, t, d: (i, jnp.maximum(t * r - 1, 0),
                                             0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, r, g, DELTA, nf),
                         lambda k, i, t, d: (i, t, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, g, DELTA, nf),
                         lambda k, i, t, d: (i, jnp.minimum(t * r + r, h - 1),
                                             0, 0, 0),
                         memory_space=pltpu.VMEM),
        ]
        operands += [segs[s], segs[s], segs[s]]
    if n_seg:
        in_specs += [
            pl.BlockSpec((n_seg, nf), lambda k, i, t, d: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((n_seg, nf), lambda k, i, t, d: (0, 0),
                         memory_space=pltpu.VMEM),
        ]
        operands += [seg_sc, seg_sh]

    out_specs = [
        pl.BlockSpec((1, N_TAPS, CK, nf), lambda k, i, t, d: (k, 0, 0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((max(n_seg, 1), 3, nf, nf),
                     lambda k, i, t, d: (0, 0, 0, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((max(n_seg, 1), 3, nf, nf),
                     lambda k, i, t, d: (0, 0, 0, 0), memory_space=pltpu.VMEM),
    ]
    out_shapes = [
        _struct((n_k, N_TAPS, CK, nf), jnp.float32, operands),
        _struct((max(n_seg, 1), 3, nf, nf), jnp.float32, operands),
        _struct((max(n_seg, 1), 3, nf, nf), jnp.float32, operands),
    ]
    scratch = [
        pltpu.VMEM((db, r + 2, g, DELTA, CK), xt.dtype),
        pltpu.VMEM((r + 2, g, DELTA, CK), xt.dtype),
        pltpu.VMEM((max(n_seg, 1), r + 2, g, DELTA, nf), xt.dtype),
        pltpu.VMEM((r + 2, g, DELTA, nf), xt.dtype),
        pltpu.VMEM((r, g, DELTA, nf), xt.dtype),
        pltpu.VMEM((N_TAPS, CK, nf), jnp.float32),
        pltpu.VMEM((max(n_seg, 1), 3, nf, nf), jnp.float32),
        pltpu.VMEM((max(n_seg, 1), 3, nf, nf), jnp.float32),
    ]
    return pl.pallas_call(
        partial(_bwd2_kernel, r=r, g=g, c=c, growth=growth, n_seg=n_seg,
                db=db),
        grid=(n_k, b8, h // r, n_d),
        in_specs=in_specs,
        out_specs=out_specs,
        out_shape=out_shapes,
        scratch_shapes=scratch,
        interpret=INTERPRET,
    )(*operands)


# ---------------------------------------------------------------------------
# the block-level custom VJP


@partial(jax.custom_vjp, nondiff_argnums=(0,))
def block_engine_apply(dims, x, gammas, betas, kernels, biases):
    """Train-mode dense block, whole-block Pallas engine.

    Same contract as ops/dense_block.dense_block_apply: dims = (growth,
    n_layers, eps, axis_name) static; returns (buffer, mean, mean_sq)
    where buffer is the materialized block concat [x, y_1..y_L] (built
    ONCE, at block end) and the statistics cover its channels. Caller
    gates on ``supported``."""
    buf, mu, m2 = _engine_impl(dims, x, gammas, betas, kernels, biases)[:3]
    return buf, mu, m2


def _engine_fwd(dims, x, gammas, betas, kernels, biases):
    buf, mu, m2, xt, segs, mus, m2s = _engine_impl(
        dims, x, gammas, betas, kernels, biases)
    res = (xt, segs, mus, m2s, gammas, betas, kernels, biases)
    return (buf, mu, m2), res


def _psum(v, axis_name):
    return lax.psum(v, axis_name) if axis_name is not None else v


def _engine_bwd(dims, res, cot):
    growth, n_layers, eps, axis_name = dims
    xt, segs, mus, m2s, gammas, betas, kernels, biases = res
    gbuf, gmu, gm2 = cot
    b8, _, h, g, _, c0 = xt.shape
    b = b8 * DELTA
    w = g * DELTA
    dt = xt.dtype
    nf = DELTA * growth
    n = b * h * w
    if axis_name is not None:
        n = n * lax.axis_size(axis_name)
    f32 = jnp.float32

    # cotangent state from the block outputs
    gbuf = gbuf.astype(dt)
    gx_acc = to_packed_layout(lax.slice_in_dim(gbuf, 0, c0, axis=3))
    gsegs = [pack96(lax.slice_in_dim(gbuf, c0 + s * growth,
                                     c0 + (s + 1) * growth, axis=3))
             for s in range(n_layers)]
    # stats cotangent: dbuf += gmu/n + 2*buf*gm2/n — affine in the buffer
    # values; tracked lazily as per-channel (C1, C2) coefficient sums
    # (see module docstring) exactly matching ops/dense_block.py:145-147.
    gmu = gmu.astype(f32)
    gm2 = gm2.astype(f32)
    c1x = gmu[:c0] / n
    c2x = 2.0 * gm2[:c0] / n
    c1s = [_tile96(gmu[c0 + s * growth:c0 + (s + 1) * growth]) / n
           for s in range(n_layers)]
    c2s = [2.0 * _tile96(gm2[c0 + s * growth:c0 + (s + 1) * growth]) / n
           for s in range(n_layers)]

    dgammas = [None] * n_layers
    dbetas = [None] * n_layers
    dkernels = [None] * n_layers
    dbiases = [None] * n_layers

    for j in reversed(range(n_layers)):
        gma, bta = gammas[j], betas[j]
        cpad = _ceil(c0, CK) * CK
        n_k = _ceil(c0, CK)
        sc_x, sh_x, inv_x = _fold(gma[:c0], bta[:c0], mus[0], m2s[0], eps)
        sc_pad = jnp.pad(sc_x, (0, cpad - c0)).reshape(1, cpad)
        sh_pad = jnp.pad(sh_x, (0, cpad - c0)).reshape(1, cpad)
        wt, wtb = _wt_tables(kernels[j][:, :, :c0, :], cpad)
        wt = wt.astype(dt)
        wtb = wtb.astype(dt)
        if j:
            seg_sc, seg_sh, seg_inv = [], [], []
            gwti_l, gwthi_l, gwtlo_l = [], [], []
            for s in range(j):
                gs = gma[c0 + s * growth:c0 + (s + 1) * growth]
                bs = bta[c0 + s * growth:c0 + (s + 1) * growth]
                ssc, ssh, sinv = _fold(gs, bs, mus[1 + s], m2s[1 + s], eps)
                seg_sc.append(_tile96(ssc))
                seg_sh.append(_tile96(ssh))
                seg_inv.append(sinv)
                ws = lax.slice_in_dim(kernels[j], c0 + s * growth,
                                      c0 + (s + 1) * growth, axis=2)
                gwti, gwthi, gwtlo = _gwt_tables(ws)
                gwti_l.append(gwti)
                gwthi_l.append(gwthi)
                gwtlo_l.append(gwtlo)
            seg_sc_a = jnp.stack(seg_sc)
            seg_sh_a = jnp.stack(seg_sh)
            gwti_a = jnp.stack(gwti_l).astype(dt)
            gwthi_a = jnp.stack(gwthi_l).astype(dt)
            gwtlo_a = jnp.stack(gwtlo_l).astype(dt)
        else:
            seg_sc_a = seg_sh_a = gwti_a = gwthi_a = gwtlo_a = None

        c1j = c1s[j].reshape(1, nf)
        c2j = c2s[j].reshape(1, nf)
        gy = gsegs[j]
        seg_list = list(segs[:j])

        gx_acc, gseg_new, dsums_x, dseg_sums, dbias_nf = _layer_bwd1(
            xt, seg_list, segs[j], gy, gx_acc, gsegs[:j], sc_pad, sh_pad,
            seg_sc_a, seg_sh_a, wt, wtb, gwti_a, gwthi_a, gwtlo_a, c1j, c2j,
            growth)
        for s in range(j):
            gsegs[s] = gseg_new[s]

        dwp, dgwi, dgwb = _layer_bwd2(
            xt, seg_list, segs[j], gy, sc_pad, sh_pad, seg_sc_a, seg_sh_a,
            c1j, c2j, growth)

        # ---- XLA vector math: parameter grads + C1/C2 updates ----
        dscale_x = _psum(dsums_x[:, 0, :].reshape(-1)[:c0], axis_name)
        dshift_x = _psum(dsums_x[:, 1, :].reshape(-1)[:c0], axis_name)
        dgamma_x = inv_x * (dscale_x - mus[0] * dshift_x)
        parts_g = [dgamma_x]
        parts_b = [dshift_x]
        # layer-j BN-through-stats corrections (affine coefficients),
        # mirroring dense_block.py's du term: mean_dout/mean_dxhat are
        # GLOBAL means (psum'd sums / global n)
        mean_dx_x = dgamma_x / n
        mean_do_x = dshift_x / n
        c2x = c2x + (-gma[:c0] * inv_x * inv_x * mean_dx_x)
        c1x = c1x + (-gma[:c0] * inv_x * mean_do_x
                     + gma[:c0] * inv_x * inv_x * mus[0] * mean_dx_x)
        dwp_full = _psum(
            dwp.transpose(1, 0, 2, 3).reshape(N_TAPS, n_k * CK, nf),
            axis_name)
        dk = jnp.zeros(kernels[j].shape, f32)
        dk = dk.at[:, :, :c0, :].set(_unpack_dwp(dwp_full, c0, growth))
        for s in range(j):
            gs = gma[c0 + s * growth:c0 + (s + 1) * growth]
            sinv = seg_inv[s]
            dsc_s = _psum(_fold_lanes(dseg_sums[s, 0], growth), axis_name)
            dsh_s = _psum(_fold_lanes(dseg_sums[s, 1], growth), axis_name)
            dgamma_s = sinv * (dsc_s - mus[1 + s] * dsh_s)
            parts_g.append(dgamma_s)
            parts_b.append(dsh_s)
            mean_dx_s = dgamma_s / n
            mean_do_s = dsh_s / n
            c2s[s] = c2s[s] + _tile96(-gs * sinv * sinv * mean_dx_s)
            c1s[s] = c1s[s] + _tile96(-gs * sinv * mean_do_s
                                      + gs * sinv * sinv * mus[1 + s]
                                      * mean_dx_s)
            dws = _unpack_dgw(_psum(dgwi[s], axis_name),
                              _psum(dgwb[s], axis_name), growth)
            dk = dk.at[:, :, c0 + s * growth:c0 + (s + 1) * growth, :].set(dws)
        dgammas[j] = jnp.concatenate(parts_g)
        dbetas[j] = jnp.concatenate(parts_b)
        dkernels[j] = dk
        dbiases[j] = _psum(_fold_lanes(dbias_nf[0], growth), axis_name)

    # final fixup: layer corrections for the x part, applied once — in
    # the PACKED layout (channel axis last, so the per-channel c1x/c2x
    # broadcast directly) so XLA fuses convert+mul+add into one pass and
    # the transpose back to NHWC runs on bf16, not a materialized f32 copy
    dxp = (gx_acc.astype(f32) + c1x + c2x * xt.astype(f32)).astype(dt)
    dx = from_packed_layout(dxp)
    return (dx, tuple(dgammas), tuple(dbetas), tuple(dkernels),
            tuple(dbiases))


block_engine_apply.defvjp(_engine_fwd, _engine_bwd)
