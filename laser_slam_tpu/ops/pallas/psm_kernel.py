"""Fused PSM matcher as a single Pallas TPU kernel.

The XLA version of :func:`..psm.match_psm` lowers each solver iteration
to dozens of small kernels, and under ``vmap`` the batched
``while_loop`` runs until the *slowest* pair converges — every pair pays
worst-case iterations. This kernel fuses the entire match (projection,
orientation cross-correlation, weighted-least-squares translation,
convergence control) into one ``pallas_call``:

- one grid program per scan pair; all state lives in VMEM/registers,
- the ``lax.while_loop`` is per-program scalar control flow, so each
  pair exits as soon as *it* converges (true early exit, impossible in
  the vmapped XLA version),
- the dense pair×bin projection matrix (≤256×256 f32, 256 KB) never
  leaves VMEM,
- pair quantities are computed natively in ``[N,1]`` column orientation
  so the coverage matrix is pure broadcasting (no transposes).

Beam counts pad to 256 lanes (LMS211) or 512 lanes (LMS511/LMS151);
the [512,512] f32 projection matrix is 1 MB — inside VMEM.

Semantics match :mod:`..psm` (itself mirroring pm_psm,
src/zhpsm/ZHPolar_Match.cpp:890-1003); see that module for the
reference-parity notes.
"""

from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ...core.scan import LaserModel, Scan
from ...core import se2
from ..psm import (
    CHANGE_WEIGHT_ITER,
    LARGE_ERR,
    MAX_ERROR,
    MAX_ITER,
    MatchResult,
    STOP_COND,
    WEIGHTING_FACTOR,
)

MAX_PAD = 512
BIG = 100.0  # empty-bin sentinel, same as project.EMPTY_RANGE


def _n_pad(model: LaserModel) -> int:
    """Lane padding: 128-lane multiples; 256 covers LMS211/181-beam,
    512 covers the 361-beam LMS511 and 541-beam LMS151 ([512,512] f32
    projection matrix = 1 MB, comfortably inside VMEM)."""
    return 256 if model.n_beams <= 256 else 512


def supports_model(model: LaserModel) -> bool:
    return model.n_beams <= MAX_PAD


def _atan2(y, x):
    """Polynomial atan2 (Mosaic has no atan2 primitive). Max error
    ~1e-6 rad — far below the 0.017 rad beam spacing the result feeds."""
    ax = jnp.abs(x)
    ay = jnp.abs(y)
    mx = jnp.maximum(ax, ay)
    mn = jnp.minimum(ax, ay)
    z = mn / jnp.maximum(mx, 1e-30)
    z2 = z * z
    # Odd minimax polynomial for atan on [0, 1].
    a = z * (
        0.99997726
        + z2 * (-0.33262347
        + z2 * (0.19354346
        + z2 * (-0.11643287
        + z2 * (0.05265332
        + z2 * -0.01172120))))
    )
    a = jnp.where(ay > ax, 0.5 * math.pi - a, a)
    a = jnp.where(x < 0, math.pi - a, a)
    return jnp.where(y < 0, -a, a)


PAIRS_PER_PROGRAM = 8  # TPU block sublane granularity


def _kernel(
    ref_r_ref, ref_bad_ref, cur_r_ref, pair_ok_ref, init_ref,
    pose_ref, err_ref, fail_ref,
    *, model: LaserModel, max_fused_iters: int, n_pad: int,
):
    # fori over the 8 sub-pairs: the body traces once (8x smaller MLIR
    # than a python unroll, which Mosaic compiles painfully slowly).
    def body(s, _):
        _one_pair(
            ref_r_ref, ref_bad_ref, cur_r_ref, pair_ok_ref, init_ref,
            pose_ref, err_ref, fail_ref, s,
            model=model, max_fused_iters=max_fused_iters, n_pad=n_pad,
        )
        return 0

    jax.lax.fori_loop(0, PAIRS_PER_PROGRAM, body, 0)


def _one_pair(
    ref_r_ref, ref_bad_ref, cur_r_ref, pair_ok_ref, init_ref,
    pose_ref, err_ref, fail_ref, s,
    *, model: LaserModel, max_fused_iters: int, n_pad: int,
):
    n = model.n_beams
    dfi = model.dfi
    fi_min = model.fi_min
    w = model.window
    dtype = jnp.float32

    lane_j = jax.lax.broadcasted_iota(jnp.int32, (1, n_pad), 1)
    lane_i = jax.lax.broadcasted_iota(jnp.int32, (n_pad, 1), 0)
    fi_j = fi_min + dfi * lane_j.astype(dtype)               # [1, P]
    in_j = lane_j < n
    in_i = lane_i < n

    ref_r = ref_r_ref[pl.ds(s, 1), :]                        # [1, P]
    ref_bad_row = ref_bad_ref[pl.ds(s, 1), :]
    ref_bad = ref_bad_row > 0.5
    cur_r_row = cur_r_ref[pl.ds(s, 1), :]

    # Column-orientation copies of the current scan for the pair axis
    # (reshape the f32 rows — Mosaic can't relayout sub-32-bit types).
    cur_r_col = cur_r_row.reshape(n_pad, 1)
    pair_ok_col = pair_ok_ref[pl.ds(s, 1), :].reshape(n_pad, 1) > 0.5
    fi_i = fi_min + dfi * lane_i.astype(dtype)               # [P, 1]

    co_j = jnp.cos(fi_j)
    si_j = jnp.sin(fi_j)

    def project(ax, ay, ath):
        """Projection of the current scan at (ax, ay, ath) onto the
        reference bearings. Returns (new_r [1,P], bad [1,P] bool)."""
        ang = ath + fi_i                                     # [P, 1]
        x = cur_r_col * jnp.cos(ang) + ax
        y = cur_r_col * jnp.sin(ang) + ay
        rr = jnp.sqrt(x * x + y * y)
        phi = _atan2(y, x)
        phi = jnp.where((x < 0) & (y < 0), phi + 2.0 * math.pi, phi)

        phi0 = pltpu.roll(phi, shift=1, axis=0)
        rr0 = pltpu.roll(rr, shift=1, axis=0)
        pv = pair_ok_col & (jnp.abs(phi - phi0) < math.pi) & in_i
        a_lo = jnp.minimum(phi0, phi)
        a_hi = jnp.maximum(phi0, phi)
        occl = phi <= phi0

        cover = (fi_j >= a_lo) & (fi_j <= a_hi) & pv & in_j  # [P, P]
        dphi = phi - phi0
        dphi = jnp.where(jnp.abs(dphi) < 1e-9, 1e-9, dphi)
        t = (fi_j - a_lo) / dphi
        # interpolate along the (phi0→phi) line; use signed param from
        # phi0 regardless of orientation:
        t = (fi_j - phi0) / dphi
        ri = rr0 + (rr - rr0) * t

        ri_all = jnp.where(cover, ri, BIG)
        new_r = jnp.min(ri_all, axis=0, keepdims=True)       # [1, P]
        ri_occ = jnp.where(cover & occl, ri, BIG)
        min_occ = jnp.min(ri_occ, axis=0, keepdims=True)
        empty = new_r >= BIG
        occluded = (min_occ <= new_r + 1e-6) & ~empty
        return new_r, empty | occluded

    def orientation(new_r, new_bad):
        """Cross-correlation orientation search; returns (dth, fail).

        The 2W+1 shifts are unrolled; the minimum and its two neighbours
        (for parabolic refinement) are tracked with a scalar running-best
        chain — Mosaic forbids scalar stores to VMEM, so no scratch
        array is used.
        """
        big = jnp.asarray(LARGE_ERR * 10.0, dtype)
        best = big
        best_k = jnp.asarray(-1, jnp.int32)
        em1 = big
        ep1 = big
        prev = big
        for k, di in enumerate(range(-w, w + 1)):
            # pltpu.roll wants non-negative shifts; rolling by -di over
            # the padded circle is equivalent (wrapped lanes are masked).
            sh = (-di) % n_pad
            ref_s = pltpu.roll(ref_r, shift=sh, axis=1)
            bad_s = pltpu.roll(ref_bad_row, shift=sh, axis=1) > 0.5
            inb = (lane_j + di >= 0) & (lane_j + di < n) & in_j
            valid = inb & ~new_bad & ~bad_s
            delta = jnp.abs(new_r - ref_s)
            e_sum = jnp.sum(jnp.where(valid, delta, 0.0))
            cnt = jnp.sum(valid.astype(dtype))
            e = jnp.where(cnt > 0, e_sum / jnp.maximum(cnt, 1.0), LARGE_ERR)

            ep1 = jnp.where(best_k == k - 1, e, ep1)
            new_best = e < best
            em1 = jnp.where(new_best, prev, em1)
            ep1 = jnp.where(new_best, big, ep1)
            best = jnp.where(new_best, e, best)
            best_k = jnp.where(new_best, k, best_k)
            prev = e
        fail = best >= LARGE_ERR
        dth = (best_k - w).astype(dtype) * dfi
        curv = em1 + ep1 - 2.0 * best
        ok = (
            (em1 < LARGE_ERR) & (ep1 < LARGE_ERR)
            & (jnp.abs(curv) > 1e-4) & (em1 > best) & (ep1 > best)
        )
        d = jnp.where(ok, (em1 - ep1) / jnp.where(ok, curv, 1.0) / 2.0, 0.0)
        dth = dth + jnp.where(jnp.abs(d) < 1.0, d, 0.0) * dfi
        return dth, fail

    def translation(new_r, new_bad, C):
        dr = ref_r - new_r
        valid = (
            ~ref_bad & ~new_bad & in_j
            & (new_r < model.max_range) & (new_r > model.min_range)
            & (jnp.abs(dr) < MAX_ERROR)
        )
        wgt = jnp.where(valid, C / (dr * dr + C), 0.0)
        cnt = jnp.sum(valid.astype(dtype))
        hw1 = jnp.sum(wgt * co_j * dr)
        hw2 = jnp.sum(wgt * si_j * dr)
        h11 = jnp.sum(wgt * co_j * co_j)
        h12 = jnp.sum(wgt * co_j * si_j)
        h22 = jnp.sum(wgt * si_j * si_j)
        det = h11 * h22 - h12 * h12
        fail = (cnt < model.min_valid_points) | (det < 1e-3)
        det = jnp.where(fail, 1.0, det)
        dx = (h22 * hw1 - h12 * hw2) / det
        dy = (-h12 * hw1 + h11 * hw2) / det
        avg = jnp.sum(jnp.abs(jnp.where(in_j, dr, 0.0))) / jnp.maximum(cnt, 1.0)
        return dx, dy, avg, fail

    def small_step(cnt, dx, dy, dth):
        m = 100.0 * (jnp.abs(dx) + jnp.abs(dy)) + jnp.abs(dth)
        return jnp.where(m < STOP_COND, cnt + 1, 0)

    def cond(c):
        (it, small, failf, *_rest) = c
        return (it < max_fused_iters) & (small < 3) & (failf < 0.5)

    def body(c):
        it, small, failf, ax, ay, ath, dx, dy, dth, C, avg = c
        small = small_step(small, dx, dy, dth)
        new_r, new_bad = project(ax, ay, ath)
        dth_n, fail_o = orientation(new_r, new_bad)
        ath = ath + dth_n
        small = small_step(small, dx, dy, dth_n)

        C = jnp.where(it * 2 + 1 == CHANGE_WEIGHT_ITER + 1, C / 50.0, C)
        new_r, new_bad = project(ax, ay, ath)
        dx_n, dy_n, avg_n, fail_t = translation(new_r, new_bad, C)
        failf = jnp.maximum(
            failf, (fail_o | fail_t).astype(dtype)
        )
        keep = failf < 0.5
        dx_n = jnp.where(keep, dx_n, 0.0)
        dy_n = jnp.where(keep, dy_n, 0.0)
        ax = ax + dx_n
        ay = ay + dy_n
        avg = jnp.where(keep, avg_n, avg)
        return (it + 1, small, failf, ax, ay, ath, dx_n, dy_n, dth_n, C, avg)

    init = (
        jnp.asarray(0, jnp.int32),
        jnp.asarray(0, jnp.int32),
        jnp.asarray(0.0, dtype),
        init_ref[pl.ds(s, 1), :][0, 0],
        init_ref[pl.ds(s, 1), :][0, 1],
        init_ref[pl.ds(s, 1), :][0, 2],
        jnp.asarray(1e6, dtype),
        jnp.asarray(1e6, dtype),
        jnp.asarray(1e6, dtype),
        jnp.asarray(WEIGHTING_FACTOR, dtype),
        jnp.asarray(LARGE_ERR, dtype),
    )
    it, small, failf, ax, ay, ath, dx, dy, dth, C, avg = jax.lax.while_loop(
        cond, body, init
    )
    lane3 = jax.lax.broadcasted_iota(jnp.int32, (1, 3), 1)
    pose_row = jnp.where(lane3 == 0, ax, jnp.where(lane3 == 1, ay, ath))
    pose_ref[pl.ds(s, 1), :] = pose_row
    err_ref[pl.ds(s, 1), :] = jnp.zeros((1, 1), dtype) + avg
    fail_ref[pl.ds(s, 1), :] = jnp.zeros((1, 1), dtype) + failf


@functools.partial(jax.jit, static_argnames=("model", "interpret"))
def match_psm_pallas(
    model: LaserModel,
    ref: Scan,
    cur: Scan,
    init_pose=None,
    interpret: bool = False,
) -> MatchResult:
    """Batched fused PSM match: all inputs ``[B, N]`` (B ≥ 1)."""
    assert supports_model(model), "use the XLA matcher for >512 beams"
    n_pad = _n_pad(model)
    b_in, n = ref.ranges.shape
    if init_pose is None:
        init_pose = jnp.zeros((b_in, 3), jnp.float32)

    bpad = (-b_in) % PAIRS_PER_PROGRAM
    b = b_in + bpad

    def prep_b(x):
        return jnp.pad(x, ((0, bpad),) + ((0, 0),) * (x.ndim - 1), mode="edge")

    ref = jax.tree.map(prep_b, ref)
    cur = jax.tree.map(prep_b, cur)
    init_pose = prep_b(init_pose)

    pad = n_pad - n

    def prep(x, fill):
        return jnp.pad(x.astype(jnp.float32), ((0, 0), (0, pad)),
                       constant_values=fill)

    # Pair validity of the current scan (same rule as project._pair_valid).
    seg, bad = cur.seg, cur.bad
    seg_prev = jnp.roll(seg, 1, axis=-1)
    bad_prev = jnp.roll(bad, 1, axis=-1)
    pair_ok = (seg != 0) & (seg == seg_prev) & ~bad & ~bad_prev
    pair_ok = pair_ok.at[:, 0].set(False)

    ref_r = prep(ref.ranges, BIG)
    ref_bad = prep(ref.bad, 1.0)
    cur_r = prep(cur.ranges, BIG)
    pair_f = prep(pair_ok, 0.0)

    kernel = functools.partial(
        _kernel, model=model, max_fused_iters=MAX_ITER // 2, n_pad=n_pad
    )
    g = PAIRS_PER_PROGRAM
    row = lambda i: (i, 0)
    pose, err, fail = pl.pallas_call(
        kernel,
        grid=(b // g,),
        in_specs=[
            pl.BlockSpec((g, n_pad), row, memory_space=pltpu.VMEM),
            pl.BlockSpec((g, n_pad), row, memory_space=pltpu.VMEM),
            pl.BlockSpec((g, n_pad), row, memory_space=pltpu.VMEM),
            pl.BlockSpec((g, n_pad), row, memory_space=pltpu.VMEM),
            pl.BlockSpec((g, 3), row, memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((g, 3), row, memory_space=pltpu.VMEM),
            pl.BlockSpec((g, 1), row, memory_space=pltpu.VMEM),
            pl.BlockSpec((g, 1), row, memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((b, 3), jnp.float32),
            jax.ShapeDtypeStruct((b, 1), jnp.float32),
            jax.ShapeDtypeStruct((b, 1), jnp.float32),
        ],
        interpret=interpret,
    )(ref_r, ref_bad, cur_r, pair_f, init_pose)
    pose, err, fail = pose[:b_in], err[:b_in], fail[:b_in]

    pose = pose.at[:, 2].set(se2.normalize_angle(pose[:, 2]))
    return MatchResult(
        pose=pose,
        err=err[:, 0],
        fail=fail[:, 0] > 0.5,
        n_valid=jnp.zeros(b_in, jnp.int32),
    )
