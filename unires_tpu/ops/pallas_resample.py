"""Pallas TPU kernels for affine pull/push resampling.

Design ("shift-and-select", no gathers):

TPUs have no fast gather/scatter: Mosaic's in-kernel dynamic gather is
~3.4 Gelt/s (measured, v5e) and XLA's gather/scatter at volume scale is
catastrophic (387 ms pull / hung scatter compile at 181^3). But the affine
maps this framework produces are near scaled-permutations (decimation lives
in the strided conv; pull/push map between ~same-resolution grids), so for an
output TILE the source footprint per axis spans only a few voxels beyond the
tile itself. The kernel exploits that:

  * grid over output tiles (TX, TY, TZ); the (3,4) affine arrives as
    scalar-prefetch operands (it is DYNAMIC — the rigid pose updates every
    iteration without retracing);
  * per tile, the kernel computes the source bounding box from the affine
    (8 corners, scalar ops) and DMAs one block HBM->VMEM with dynamic
    offsets. Mosaic constraints (v5e, measured): DMA slice SIZES on the minor
    two dims must be (8, 128)-aligned, so the scratch spans the whole
    (128-padded) z axis (z offset fixed at 0) and y offsets are quantized to
    8 with an extra +8 of cover; the source is zero-padded on device to the
    aligned box (padding never contributes — weights check TRUE dims);
  * per-element source indices decompose as  block_anchor + tile-local base +
    small offset ; anchors are reduced per-tile from the FOV-masked index
    field, so FOV-edge tiles are handled EXACTLY without halo padding;
  * the small offsets are enumerated by a static window (sized at trace time
    from the nominal affine with slack for rigid drift): the scratch is
    pre-aligned with three modular rolls (tpu.dynamic_rotate; wrap only ever
    feeds zero-weighted elements), then each (u, v, w) iteration is a static
    slab slice + VPU select-multiply-accumulate. Zero gathers, zero scatters.

Adjoint (push) uses the same scaffolding with the inverse-map anchor and
recomputes each candidate's pull weight arithmetically (the bounded-window
scatter-free adjoint; see ops.resample.push_window for the math).

Known knife-edge: at sample coordinates EXACTLY on the FOV boundary (g_d ==
-0.5 or dim-0.5) the f32 rounding of pull's direct evaluation and push's
incremental evaluation can disagree, flipping that boundary voxel's mask.
Measure-zero in practice; documented convention.
"""
from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

Array = jax.Array

_BIG = 1 << 20  # python int: jnp scalars would be captured as kernel consts

# Mosaic's scoped-vmem accounting over the fully-unrolled window loops is
# very conservative (live-range upper bound): inside large enclosing
# programs it requests ~18 MB against a 16 MB default limit even though the
# kernels' true VMEM footprint is ~2 MB (scratch + a few tiles). Raise the
# per-kernel limit; VMEM is 128 MB/core on v5e.
_COMPILER_PARAMS = pltpu.CompilerParams(vmem_limit_bytes=100 * 1024 * 1024)


def _win_rolled() -> bool:
    """Whether the x-window loops stay ROLLED (trace-time knob).

    Mosaic lowers fori_loop only fully-rolled or fully-unrolled. Unrolled
    (default) is ~25% faster per kernel; rolled cuts trace time and kernel
    code size — useful when executables must stay small. The round-2
    executable-size problem turned out to live in the FFT preconditioner
    (see solvers.admm.dct_matrices), so speed wins by default.
    Env: UNIRES_TPU_WINDOW_ROLLED=1 to roll.
    """
    import os

    return os.environ.get("UNIRES_TPU_WINDOW_ROLLED", "0") not in ("0", "")


def _fori_win(n, body, init):
    """fori_loop over the x window, rolled or fully unrolled (_win_rolled)."""
    return jax.lax.fori_loop(0, n, body, init,
                             unroll=1 if _win_rolled() else n)


def _round_up(x, m):
    return int(-(-x // m) * m)


def _corner_min(m, origin, tile):
    """Per-axis min of g over the tile's 8 corners. Scalar ops."""
    mins = []
    for d in range(3):
        lo = m[d][3]
        for e in range(3):
            c0 = m[d][e] * origin[e]
            c1 = m[d][e] * (origin[e] + tile[e] - 1)
            lo = lo + jnp.minimum(c0, c1)
        mins.append(lo)
    return mins


def _axis_weight(rel, u0, f, u, src_idx=None, dim=None):
    """Trilinear weight contribution of slab offset u on one axis.

    Slab offset u holds source index anchor+base+u; it is corner i0 (weight
    1-f) for elements with rel-u0 == u and corner i0+1 (weight f) for
    elements with rel-u0 == u-1. ``src_idx``/``dim`` apply the zero bound:
    out-of-range corners contribute 0 (reference extrapolate=False +
    bound='zero', unires/_project.py:162-164). ``u`` may be a Python int OR
    a traced scalar (the kernels roll their x-window loops as fori_loops to
    keep the unrolled code — and with it trace time and executable size —
    bounded; the u >= 1 guard is branchless for that reason).
    """
    du = rel - u0
    w = jnp.where(du == u, 1.0 - f, 0.0)
    w = jnp.where((du == u - 1) & (u >= 1), f, w)
    if src_idx is not None:
        w = jnp.where((src_idx >= 0) & (src_idx < dim), w, 0.0)
    return w


def _masked_min(vals, mask):
    return jnp.min(jnp.where(mask, vals, _BIG))


def _db_default() -> bool:
    """Cross-tile double-buffered DMA (compiled TPU only; trace-time knob).

    The DMA for tile t+1 is issued while tile t computes, hiding the
    HBM->VMEM transfer that otherwise serializes ahead of the window loop
    (~0.5-1 ms per volume pass, round-2 measurement; ROADMAP item 2).
    Pallas TPU interpret mode DEADLOCKS on a DMA waited in a later grid
    step than it was started (semaphore state is scoped per step by the
    emulator — verified on jax 0.9.0), so the pattern is restricted to
    compiled TPU runs. Env: UNIRES_TPU_DB=0 reverts to per-tile start/wait.
    """
    import os

    if os.environ.get("UNIRES_TPU_DB", "1") in ("0", ""):
        return False
    return jax.default_backend() == "tpu"


def _anchor_s(mins, lo3, pad_dim, cover):
    """Per-tile DMA origin (x free, y 8-quantized, z pinned at 0)."""
    s = []
    for d, q in zip(range(3), (1, 8, 0)):
        sd = jnp.floor(mins[d]).astype(jnp.int32) - lo3[d] - 2
        if q == 0:
            sd = jnp.int32(0)
        else:
            sd = jnp.clip(sd, 0, pad_dim[d] - cover[d])
            if q > 1:
                sd = (sd // q) * q
        s.append(sd)
    return s


def _anchor_dma(mins, lo3, pad_dim, cover, vol_ref, scratch, sem):
    """Single-buffered per-tile DMA: compute origin + start."""
    s = _anchor_s(mins, lo3, pad_dim, cover)
    cp = pltpu.make_async_copy(
        vol_ref.at[pl.ds(s[0], cover[0]), pl.ds(s[1], cover[1]),
                   pl.ds(s[2], cover[2])],
        scratch, sem)
    cp.start()
    return s, cp


def _pipelined_dma(m, tile, lo3, pad_dim, cover, vol_ref, scratch, sem):
    """Cross-tile double-buffered DMA (see :func:`_db_default`).

    ``scratch`` is (2,) + cover, ``sem`` a 2-element DMA semaphore array.
    Grid programs run sequentially per core, so the copy started here for
    tile p+1 lands before step p+1 waits on it. Returns
    ``(s, wait, slot)``: the current tile's anchor, a wait callable, and
    the scratch slot holding its block after ``wait()``.
    """
    GY, GZ = pl.num_programs(1), pl.num_programs(2)
    GX = pl.num_programs(0)
    i, j, k = pl.program_id(0), pl.program_id(1), pl.program_id(2)
    p = (i * GY + j) * GZ + k
    slot = jax.lax.rem(p, 2)

    def s_of(ti, tj, tk):
        of = [jnp.float32(ti * tile[0]), jnp.float32(tj * tile[1]),
              jnp.float32(tk * tile[2])]
        return _anchor_s(_corner_min(m, of, tile), lo3, pad_dim, cover)

    def copy(sl, s):
        return pltpu.make_async_copy(
            vol_ref.at[pl.ds(s[0], cover[0]), pl.ds(s[1], cover[1]),
                       pl.ds(s[2], cover[2])],
            scratch.at[sl], sem.at[sl])

    s = s_of(i, j, k)

    @pl.when(p == 0)
    def _():
        copy(slot, s).start()

    # next tile in linearized grid order (same traversal the TPU runs)
    nk = k + 1
    k2 = jnp.where(nk == GZ, 0, nk)
    jc = jnp.where(nk == GZ, j + 1, j)
    j2 = jnp.where(jc == GY, 0, jc)
    i2 = jnp.where(jc == GY, i + 1, i)

    @pl.when(i2 < GX)
    def _():
        copy(1 - slot, s_of(i2, j2, k2)).start()

    def wait():
        copy(slot, s).wait()

    return s, wait, slot


def _pull_kernel(tile, cover, win, in_dim, pad_dim, db, kernel_refs):
    """Body of the pull kernel. All sizes static; M dynamic via scalars."""
    if db:
        m_ref, vol_ref, out_ref, scratch, work, sem = kernel_refs
    else:
        m_ref, vol_ref, out_ref, scratch, sem = kernel_refs
        work = scratch
    TX, TY, TZ = tile
    WX, WY, WZ = win

    m = [[m_ref[4 * d + c] for c in range(4)] for d in range(3)]
    origin = [pl.program_id(i) * tile[i] for i in range(3)]
    of = [jnp.float32(o) for o in origin]

    if db:
        s, wait, slot = _pipelined_dma(m, tile, (0, 0, 0), pad_dim, cover,
                                       vol_ref, scratch, sem)
    else:
        mins = _corner_min(m, of, tile)
        s, cp = _anchor_dma(mins, (0, 0, 0), pad_dim, cover, vol_ref,
                            scratch, sem)
        wait, slot = cp.wait, None

    # per-element sample coordinates (fused iota + affine; int iota only —
    # Mosaic's tpu.iota has no float variant)
    base = [
        jax.lax.broadcasted_iota(jnp.int32, (TX, TY, TZ), d) for d in range(3)
    ]
    ii = base[0].astype(jnp.float32) + of[0]
    jj = base[1].astype(jnp.float32) + of[1]
    kk = base[2].astype(jnp.float32) + of[2]
    g = [m[d][0] * ii + m[d][1] * jj + m[d][2] * kk + m[d][3] for d in range(3)]
    fov = ((g[0] >= -0.5) & (g[0] <= in_dim[0] - 0.5)
           & (g[1] >= -0.5) & (g[1] <= in_dim[1] - 0.5)
           & (g[2] >= -0.5) & (g[2] <= in_dim[2] - 0.5))

    rel, frac, u0 = [], [], []
    for d in range(3):
        l = g[d] - s[d].astype(jnp.float32)
        i0 = jnp.floor(l)
        frac.append(l - i0)
        r = i0.astype(jnp.int32) - base[d]
        rel.append(r)
        # anchor = min over in-FOV elements (may be negative near the low
        # volume edge); the clip only tames the all-masked-tile case
        ud = jnp.clip(_masked_min(r, fov), -(cover[d] - 1), cover[d] - 1)
        u0.append(ud)

    # per-axis, per-offset weights with zero-bound corner validity
    # (source corner index at offset u is s + u0 + u + base)
    su = [s[d] + u0[d] for d in range(3)]
    fovf = fov.astype(jnp.float32)
    # z-axis weights are reused in every (u, v) iteration: precompute (WZ
    # tile-sized buffers). The x/y weights are computed ON THE FLY per loop
    # level — precomputing all of them kept WX+WY live tile arrays in VMEM
    # and blew the 16 MB scoped-vmem budget once drift slack widened the
    # windows (bench r2 first run).
    wzs = [_axis_weight(rel[2], u0[2], frac[2], u, su[2] + u + base[2], in_dim[2])
           * fovf for u in range(WZ)]

    wait()
    # Modular rolls by the anchors: every nonzero-weight fetch has its true
    # source inside the block, so roll wrap-around only ever feeds
    # zero-weighted elements. The rolled block goes BACK to a VMEM ref
    # (``work``; the scratch itself when single-buffered) so the x window
    # can be a rolled (fori_loop) loop with dynamic-offset VMEM reads —
    # fully unrolling all three window loops made trace time and executable
    # size proportional to WX*WY*WZ (the round-2 fit chunk serialized to
    # ~96 MB and cost ~45 s/process to load).
    scr = scratch[slot] if db else scratch[:]
    for d in range(3):
        # non-negative shifts only: hardware dynamic_rotate mishandles
        # negative shifts on the non-lane axes (verified on v5e)
        scr = pltpu.roll(scr, jnp.remainder(-u0[d], scr.shape[d]), d)
    work[:] = scr

    def u_body(u, acc):
        wx = _axis_weight(rel[0], u0[0], frac[0], u, su[0] + u + base[0],
                          in_dim[0])
        for v in range(WY):
            wy = _axis_weight(rel[1], u0[1], frac[1], v, su[1] + v + base[1],
                              in_dim[1])
            slab = work[pl.ds(u, TX), v:v + TY, :]
            tmp = jnp.zeros((TX, TY, TZ), jnp.float32)
            for w in range(WZ):
                tmp = tmp + wzs[w] * slab[:, :, w:w + TZ]
            acc = acc + (wx * wy) * tmp
        return acc

    acc = _fori_win(WX, u_body,
                            jnp.zeros((TX, TY, TZ), jnp.float32))
    out_ref[:] = acc


def _axis_weight_grad(rel, u0, u, src_idx=None, dim=None):
    """d(trilinear axis weight)/d(g) contribution of slab offset u.

    The corner at du==u carries value weight (1-f) -> derivative -1; the
    corner at du==u-1 carries f -> derivative +1. Same zero-bound corner
    validity as :func:`_axis_weight`.
    """
    du = rel - u0
    w = jnp.where(du == u, -1.0, 0.0)
    w = jnp.where((du == u - 1) & (u >= 1), 1.0, w)
    if src_idx is not None:
        w = jnp.where((src_idx >= 0) & (src_idx < dim), w, 0.0)
    return w


def _pull_grad_kernel(tile, cover, win, in_dim, pad_dim, db, kernel_refs):
    """Body of the pull_grad kernel: d(pulled)/d(g_d), three tile outputs.

    Shares the pull kernel's scaffolding (DMA anchor, modular rolls, static
    slab window); per (u, v) slab it forms both the weighted z-sum and the
    z-derivative sum, so the cost is ~2x a pull. Semantics pin the XLA
    reference ops.resample._pull_grad_gather (zero bound, no extrapolation,
    reference nitorch grid_grad at unires/_update.py:507).
    """
    if db:
        m_ref, vol_ref, gx_ref, gy_ref, gz_ref, scratch, work, sem = kernel_refs
    else:
        m_ref, vol_ref, gx_ref, gy_ref, gz_ref, scratch, sem = kernel_refs
        work = scratch
    TX, TY, TZ = tile
    WX, WY, WZ = win

    m = [[m_ref[4 * d + c] for c in range(4)] for d in range(3)]
    origin = [pl.program_id(i) * tile[i] for i in range(3)]
    of = [jnp.float32(o) for o in origin]

    if db:
        s, wait, slot = _pipelined_dma(m, tile, (0, 0, 0), pad_dim, cover,
                                       vol_ref, scratch, sem)
    else:
        mins = _corner_min(m, of, tile)
        s, cp = _anchor_dma(mins, (0, 0, 0), pad_dim, cover, vol_ref,
                            scratch, sem)
        wait, slot = cp.wait, None

    base = [
        jax.lax.broadcasted_iota(jnp.int32, (TX, TY, TZ), d) for d in range(3)
    ]
    ii = base[0].astype(jnp.float32) + of[0]
    jj = base[1].astype(jnp.float32) + of[1]
    kk = base[2].astype(jnp.float32) + of[2]
    g = [m[d][0] * ii + m[d][1] * jj + m[d][2] * kk + m[d][3] for d in range(3)]
    fov = ((g[0] >= -0.5) & (g[0] <= in_dim[0] - 0.5)
           & (g[1] >= -0.5) & (g[1] <= in_dim[1] - 0.5)
           & (g[2] >= -0.5) & (g[2] <= in_dim[2] - 0.5))

    rel, frac, u0 = [], [], []
    for d in range(3):
        l = g[d] - s[d].astype(jnp.float32)
        i0 = jnp.floor(l)
        frac.append(l - i0)
        r = i0.astype(jnp.int32) - base[d]
        rel.append(r)
        ud = jnp.clip(_masked_min(r, fov), -(cover[d] - 1), cover[d] - 1)
        u0.append(ud)

    su = [s[d] + u0[d] for d in range(3)]
    fovf = fov.astype(jnp.float32)
    # only the z lists are precomputed (see _pull_kernel VMEM note)
    wzs = [_axis_weight(rel[2], u0[2], frac[2], u, su[2] + u + base[2], in_dim[2])
           * fovf for u in range(WZ)]
    dzs = [_axis_weight_grad(rel[2], u0[2], u, su[2] + u + base[2], in_dim[2])
           * fovf for u in range(WZ)]

    wait()
    scr = scratch[slot] if db else scratch[:]
    for d in range(3):
        scr = pltpu.roll(scr, jnp.remainder(-u0[d], scr.shape[d]), d)
    work[:] = scr

    def u_body(u, accs):
        accx, accy, accz = accs
        wx = _axis_weight(rel[0], u0[0], frac[0], u, su[0] + u + base[0],
                          in_dim[0])
        dx = _axis_weight_grad(rel[0], u0[0], u, su[0] + u + base[0],
                               in_dim[0])
        for v in range(WY):
            wy = _axis_weight(rel[1], u0[1], frac[1], v, su[1] + v + base[1],
                              in_dim[1])
            dy = _axis_weight_grad(rel[1], u0[1], v, su[1] + v + base[1],
                                   in_dim[1])
            slab = work[pl.ds(u, TX), v:v + TY, :]
            tmp = jnp.zeros((TX, TY, TZ), jnp.float32)
            tmpd = jnp.zeros((TX, TY, TZ), jnp.float32)
            for w in range(WZ):
                sl = slab[:, :, w:w + TZ]
                tmp = tmp + wzs[w] * sl
                tmpd = tmpd + dzs[w] * sl
            accx = accx + (dx * wy) * tmp
            accy = accy + (wx * dy) * tmp
            accz = accz + (wx * wy) * tmpd
        return accx, accy, accz

    zero = jnp.zeros((TX, TY, TZ), jnp.float32)
    accx, accy, accz = _fori_win(WX, u_body, (zero, zero, zero))
    gx_ref[:] = accx
    gy_ref[:] = accy
    gz_ref[:] = accz


def _pull_shear_kernel(tile, cover, win, in_dim, pad_dim, db, kernel_refs):
    """Pull kernel with a per-lane shear pre-pass (rotation-proof windows).

    The plain pull kernel's x/y windows grow with |M[d][2]| * TZ (128 lanes)
    — rotations and rigid drift inflate them 5-10x. Here the scratch is
    pre-sheared along x and y by the DYNAMIC per-z-column integer shifts
    t_d(c) = floor(M[d][2] * c + 0.5) (bit-decomposed static rolls selected
    by lane masks), so the remaining index spread is rotation-independent:
    windows stay at ~interpolation support for ANY pose that fits the DMA
    cover box. Weights are evaluated with the w loop OUTERMOST so the
    shear-corrected x/y weights hoist out of the inner accumulation.
    """
    if db:
        m_ref, vol_ref, out_ref, scratch, work, sem = kernel_refs
    else:
        m_ref, vol_ref, out_ref, scratch, sem = kernel_refs
        work = scratch
    TX, TY, TZ = tile
    WX, WY, WZ = win

    m = [[m_ref[4 * d + c] for c in range(4)] for d in range(3)]
    origin = [pl.program_id(i) * tile[i] for i in range(3)]
    of = [jnp.float32(o) for o in origin]

    if db:
        s, wait, slot = _pipelined_dma(m, tile, (0, 0, 0), pad_dim, cover,
                                       vol_ref, scratch, sem)
    else:
        mins = _corner_min(m, of, tile)
        s, cp = _anchor_dma(mins, (0, 0, 0), pad_dim, cover, vol_ref,
                            scratch, sem)
        wait, slot = cp.wait, None

    base = [
        jax.lax.broadcasted_iota(jnp.int32, (TX, TY, TZ), d) for d in range(3)
    ]
    ii = base[0].astype(jnp.float32) + of[0]
    jj = base[1].astype(jnp.float32) + of[1]
    kk = base[2].astype(jnp.float32) + of[2]
    g = [m[d][0] * ii + m[d][1] * jj + m[d][2] * kk + m[d][3] for d in range(3)]
    fov = ((g[0] >= -0.5) & (g[0] <= in_dim[0] - 0.5)
           & (g[1] >= -0.5) & (g[1] <= in_dim[1] - 0.5)
           & (g[2] >= -0.5) & (g[2] <= in_dim[2] - 0.5))

    rel, frac, u0 = [], [], []
    for d in range(3):
        l = g[d] - s[d].astype(jnp.float32)
        i0 = jnp.floor(l)
        frac.append(l - i0)
        r = i0.astype(jnp.int32) - base[d]
        rel.append(r)
        u0.append(None)  # x/y anchors are shear-corrected below
    # z anchor as in the plain kernel
    u0[2] = jnp.clip(_masked_min(rel[2], fov), -(cover[2] - 1), cover[2] - 1)

    # per-z-column shear shifts on the ORIGINAL scratch columns c:
    # t_d(c) = floor(gamma_d * c + 0.5); valid (non-wrapped) element (k, w)
    # reads column c = k + u0z + w, so the weight-side shift recomputes the
    # same expression per w. gamma = d(g_d)/d(lane).
    gx, gy = m[0][2], m[1][2]
    cvec = jax.lax.broadcasted_iota(jnp.int32, (1, 1, cover[2]), 2)
    tx_col = jnp.floor(gx * cvec.astype(jnp.float32) + 0.5).astype(jnp.int32)
    ty_col = jnp.floor(gy * cvec.astype(jnp.float32) + 0.5).astype(jnp.int32)

    # EXACT anchors: minimise rel - t over every w in the window (WZ cheap
    # tile ops) instead of the round-3 mid-window estimate minus one — the
    # saved hard "-1" is a whole window slot (plan_pull_shear shear_sl
    # dropped 2.5 -> 1.5 on its back)
    kl = jax.lax.broadcasted_iota(jnp.int32, (1, 1, TZ), 2)

    def _t_at(gamma, woff):
        return jnp.floor(gamma * (kl + u0[2] + woff).astype(jnp.float32)
                         + 0.5).astype(jnp.int32)

    mnx = jnp.int32(_BIG)
    mny = jnp.int32(_BIG)
    for w in range(WZ):
        mnx = jnp.minimum(mnx, _masked_min(rel[0] - _t_at(gx, w), fov))
        mny = jnp.minimum(mny, _masked_min(rel[1] - _t_at(gy, w), fov))
    u0[0] = jnp.clip(mnx, -(cover[0] - 1), cover[0] - 1)
    u0[1] = jnp.clip(mny, -(cover[1] - 1), cover[1] - 1)

    wait()
    scr = scratch[slot] if db else scratch[:]
    # shear first (per ORIGINAL z column), then the modular anchor rolls —
    # the z roll relabels columns but each keeps its own shear, so the
    # element-level bookkeeping above stays exact
    for axis, tcol in ((0, tx_col), (1, ty_col)):
        r_amt = jnp.remainder(-tcol, cover[axis])  # roll amount per column
        bits = max(1, (cover[axis] - 1).bit_length())
        for b in range(bits):
            sel = (r_amt & (1 << b)) != 0
            rolled = pltpu.roll(scr, 1 << b, axis)
            scr = jnp.where(sel, rolled, scr)
    for d in range(3):
        scr = pltpu.roll(scr, jnp.remainder(-u0[d], scr.shape[d]), d)
    work[:] = scr

    fovf = fov.astype(jnp.float32)
    acc = jnp.zeros((TX, TY, TZ), jnp.float32)
    for w in range(WZ):
        wz = _axis_weight(rel[2], u0[2], frac[2], w,
                          s[2] + u0[2] + w + base[2], in_dim[2]) * fovf
        tw_x = _t_at(gx, w)
        tw_y = _t_at(gy, w)
        relx_w = rel[0] - tw_x
        rely_w = rel[1] - tw_y
        wys = [_axis_weight(rely_w, u0[1], frac[1], v,
                            s[1] + u0[1] + v + base[1] + tw_y, in_dim[1])
               for v in range(WY)]

        def u_body(u, acc, w=w, wz=wz, tw_x=tw_x, relx_w=relx_w, wys=wys):
            wx = _axis_weight(relx_w, u0[0], frac[0], u,
                              s[0] + u0[0] + u + base[0] + tw_x, in_dim[0])
            wxz = wx * wz
            for v in range(WY):
                slab = work[pl.ds(u, TX), v:v + TY, w:w + TZ]
                acc = acc + (wxz * wys[v]) * slab
            return acc

        acc = _fori_win(WX, u_body, acc)
    out_ref[:] = acc


def _pull_grad_shear_kernel(tile, cover, win, in_dim, pad_dim, db,
                            kernel_refs):
    """pull_grad with the per-lane shear pre-pass (see _pull_shear_kernel).

    Emits d(pulled)/d(g_d) for the three axes with the SAME
    rotation-independent windows as the shear pull: the integer shear shifts
    t_d(c) are locally constant in g, so the derivative flows only through
    the fractional hat weights — per axis the value weight is swapped for
    its derivative (round-2 VERDICT missing item 6: the plain-plan pull_grad
    pinned the whole pose budget to its budget windows).
    """
    if db:
        m_ref, vol_ref, gx_ref, gy_ref, gz_ref, scratch, work, sem = kernel_refs
    else:
        m_ref, vol_ref, gx_ref, gy_ref, gz_ref, scratch, sem = kernel_refs
        work = scratch
    TX, TY, TZ = tile
    WX, WY, WZ = win

    m = [[m_ref[4 * d + c] for c in range(4)] for d in range(3)]
    origin = [pl.program_id(i) * tile[i] for i in range(3)]
    of = [jnp.float32(o) for o in origin]

    if db:
        s, wait, slot = _pipelined_dma(m, tile, (0, 0, 0), pad_dim, cover,
                                       vol_ref, scratch, sem)
    else:
        mins = _corner_min(m, of, tile)
        s, cp = _anchor_dma(mins, (0, 0, 0), pad_dim, cover, vol_ref,
                            scratch, sem)
        wait, slot = cp.wait, None

    base = [
        jax.lax.broadcasted_iota(jnp.int32, (TX, TY, TZ), d) for d in range(3)
    ]
    ii = base[0].astype(jnp.float32) + of[0]
    jj = base[1].astype(jnp.float32) + of[1]
    kk = base[2].astype(jnp.float32) + of[2]
    g = [m[d][0] * ii + m[d][1] * jj + m[d][2] * kk + m[d][3] for d in range(3)]
    fov = ((g[0] >= -0.5) & (g[0] <= in_dim[0] - 0.5)
           & (g[1] >= -0.5) & (g[1] <= in_dim[1] - 0.5)
           & (g[2] >= -0.5) & (g[2] <= in_dim[2] - 0.5))

    rel, frac, u0 = [], [], []
    for d in range(3):
        l = g[d] - s[d].astype(jnp.float32)
        i0 = jnp.floor(l)
        frac.append(l - i0)
        r = i0.astype(jnp.int32) - base[d]
        rel.append(r)
        u0.append(None)
    u0[2] = jnp.clip(_masked_min(rel[2], fov), -(cover[2] - 1), cover[2] - 1)

    gx, gy = m[0][2], m[1][2]
    cvec = jax.lax.broadcasted_iota(jnp.int32, (1, 1, cover[2]), 2)
    tx_col = jnp.floor(gx * cvec.astype(jnp.float32) + 0.5).astype(jnp.int32)
    ty_col = jnp.floor(gy * cvec.astype(jnp.float32) + 0.5).astype(jnp.int32)
    kl = jax.lax.broadcasted_iota(jnp.int32, (1, 1, TZ), 2)

    def _t_at(gamma, woff):
        return jnp.floor(gamma * (kl + u0[2] + woff).astype(jnp.float32)
                         + 0.5).astype(jnp.int32)

    mnx = jnp.int32(_BIG)
    mny = jnp.int32(_BIG)
    for w in range(WZ):
        mnx = jnp.minimum(mnx, _masked_min(rel[0] - _t_at(gx, w), fov))
        mny = jnp.minimum(mny, _masked_min(rel[1] - _t_at(gy, w), fov))
    u0[0] = jnp.clip(mnx, -(cover[0] - 1), cover[0] - 1)
    u0[1] = jnp.clip(mny, -(cover[1] - 1), cover[1] - 1)

    wait()
    scr = scratch[slot] if db else scratch[:]
    for axis, tcol in ((0, tx_col), (1, ty_col)):
        r_amt = jnp.remainder(-tcol, cover[axis])
        bits = max(1, (cover[axis] - 1).bit_length())
        for b in range(bits):
            sel = (r_amt & (1 << b)) != 0
            rolled = pltpu.roll(scr, 1 << b, axis)
            scr = jnp.where(sel, rolled, scr)
    for d in range(3):
        scr = pltpu.roll(scr, jnp.remainder(-u0[d], scr.shape[d]), d)
    work[:] = scr

    fovf = fov.astype(jnp.float32)
    accx = jnp.zeros((TX, TY, TZ), jnp.float32)
    accy = jnp.zeros((TX, TY, TZ), jnp.float32)
    accz = jnp.zeros((TX, TY, TZ), jnp.float32)
    for w in range(WZ):
        idx_z = s[2] + u0[2] + w + base[2]
        wz = _axis_weight(rel[2], u0[2], frac[2], w, idx_z, in_dim[2]) * fovf
        dz = _axis_weight_grad(rel[2], u0[2], w, idx_z, in_dim[2]) * fovf
        tw_x = _t_at(gx, w)
        tw_y = _t_at(gy, w)
        relx_w = rel[0] - tw_x
        rely_w = rel[1] - tw_y
        wys, dys = [], []
        for v in range(WY):
            idx_y = s[1] + u0[1] + v + base[1] + tw_y
            wys.append(_axis_weight(rely_w, u0[1], frac[1], v, idx_y,
                                    in_dim[1]))
            dys.append(_axis_weight_grad(rely_w, u0[1], v, idx_y, in_dim[1]))

        def u_body(u, accs, w=w, wz=wz, dz=dz, tw_x=tw_x, relx_w=relx_w,
                   wys=wys, dys=dys):
            accx, accy, accz = accs
            idx_x = s[0] + u0[0] + u + base[0] + tw_x
            wx = _axis_weight(relx_w, u0[0], frac[0], u, idx_x, in_dim[0])
            dx = _axis_weight_grad(relx_w, u0[0], u, idx_x, in_dim[0])
            dxz = dx * wz
            wxz = wx * wz
            wxdz = wx * dz
            for v in range(WY):
                slab = work[pl.ds(u, TX), v:v + TY, w:w + TZ]
                accx = accx + (dxz * wys[v]) * slab
                accy = accy + (wxz * dys[v]) * slab
                accz = accz + (wxdz * wys[v]) * slab
            return accx, accy, accz

        accx, accy, accz = _fori_win(WX, u_body,
                                             (accx, accy, accz))
    gx_ref[:] = accx
    gy_ref[:] = accy
    gz_ref[:] = accz


def _push_kernel(tile, cover, win, lo, in_dim, pad_dim, out_dim, db,
                 kernel_refs):
    """Body of the push kernel (exact adjoint of pull, gather-formulated).

    Output tile lives on the TARGET grid (dim = out_dim); the source values
    (pull's output grid, dim = in_dim) are DMA'd around the inverse-map
    anchor. Each candidate's weight is the pull weight of (source o ->
    target v), recomputed arithmetically.
    """
    if db:
        m_ref, vol_ref, out_ref, scratch, work, sem = kernel_refs
    else:
        m_ref, vol_ref, out_ref, scratch, sem = kernel_refs
        work = scratch
    TX, TY, TZ = tile
    WX, WY, WZ = win

    # scalars: first 12 = M (source->target), next 12 = Minv (target->source)
    m = [[m_ref[4 * d + c] for c in range(4)] for d in range(3)]
    mi = [[m_ref[12 + 4 * d + c] for c in range(4)] for d in range(3)]
    origin = [pl.program_id(i) * tile[i] for i in range(3)]
    of = [jnp.float32(o) for o in origin]

    if db:
        s, wait, slot = _pipelined_dma(mi, tile, lo, pad_dim, cover,
                                       vol_ref, scratch, sem)
    else:
        mins = _corner_min(mi, of, tile)
        s, cp = _anchor_dma(mins, lo, pad_dim, cover, vol_ref, scratch, sem)
        wait, slot = cp.wait, None

    base = [
        jax.lax.broadcasted_iota(jnp.int32, (TX, TY, TZ), d) for d in range(3)
    ]
    ii = base[0].astype(jnp.float32) + of[0]
    jj = base[1].astype(jnp.float32) + of[1]
    kk = base[2].astype(jnp.float32) + of[2]

    # inverse-map anchor field
    c = [mi[d][0] * ii + mi[d][1] * jj + mi[d][2] * kk + mi[d][3]
         for d in range(3)]
    rel, u0 = [], []
    for d in range(3):
        l = c[d] - s[d].astype(jnp.float32)
        r = jnp.floor(l).astype(jnp.int32) - base[d]
        rel.append(r)
        # anchor lo[d] BELOW the floor field: candidates o with nonzero
        # weight live in [c - L1, c + L1], i.e. down to rel - ceil(L1)
        ud = jnp.clip(jnp.min(r) - lo[d], -(cover[d] - 1), cover[d] - 1)
        u0.append(ud)

    # g at the base candidate o0 = s + u0 + base (per-iteration: + M @ (u,v,w))
    o0 = [(s[d] + u0[d] + base[d]).astype(jnp.float32) for d in range(3)]
    g0 = [m[d][0] * o0[0] + m[d][1] * o0[1] + m[d][2] * o0[2] + m[d][3]
          for d in range(3)]

    wait()
    scr = scratch[slot] if db else scratch[:]
    for d in range(3):
        # non-negative shifts only: hardware dynamic_rotate mishandles
        # negative shifts on the non-lane axes (verified on v5e)
        scr = pltpu.roll(scr, jnp.remainder(-u0[d], scr.shape[d]), d)
    work[:] = scr

    # Branch-free trilinear weight: hat(v - g) = max(0, 1 - |v - g|) yields
    # BOTH corner weights (1-f at the floor corner, f at floor+1, 0 outside)
    # with no floor/compare chain. T_d = v_d - g_d at the base candidate;
    # each offset subtracts a scalar M-column step. The FOV of the
    # candidate's sample point is NOT tested here: _fov_premask zeroed those
    # source values before the kernel (exact — the mask depends only on o).
    vg = [(base[d] + origin[d]).astype(jnp.float32) for d in range(3)]
    T0 = [vg[d] - g0[d] for d in range(3)]
    # Candidate-in-source-range masks vary along ONE axis each: build them
    # from 1D iotas (full-tile versions kept WX+WY+WZ tile arrays live and
    # blew the scoped-vmem budget once windows widened for drift slack).
    # These CANNOT fold into the premask: out-of-range candidates wrap
    # (modular rolls) onto real in-range data, so the value read is nonzero.
    shapes1 = ((TX, 1, 1), (1, TY, 1), (1, 1, TZ))
    base1 = [jax.lax.broadcasted_iota(jnp.int32, shapes1[d], d)
             for d in range(3)]

    def _ok(d, off):
        idx = s[d] + u0[d] + off + base1[d]
        return ((idx >= 0) & (idx < in_dim[d])).astype(jnp.float32)

    oky = [_ok(1, v) for v in range(WY)]
    okz = [_ok(2, w) for w in range(WZ)]

    def u_body(u, acc):
        uf = u.astype(jnp.float32)
        okxu = _ok(0, u)
        for v in range(WY):
            slab = work[pl.ds(u, TX), v:v + TY, :]
            # T at (u, v, 0) per axis; w steps subtract m[d][2]
            Tuv = [T0[d] - (m[d][0] * uf + m[d][1] * v) for d in range(3)]
            okxy = okxu * oky[v]
            for w in range(WZ):
                wt = okxy * okz[w]
                for d in range(3):
                    t = Tuv[d] - m[d][2] * w
                    wt = wt * jnp.maximum(1.0 - jnp.abs(t), 0.0)
                acc = acc + wt * slab[:, :, w:w + TZ]
        return acc

    acc = _fori_win(WX, u_body,
                            jnp.zeros((TX, TY, TZ), jnp.float32))
    out_ref[:] = acc


def _push_shear_kernel(tile, cover, win, lo, in_dim, pad_dim, out_dim, db,
                       kernel_refs):
    """Push kernel with the per-lane shear pre-pass (see _pull_shear_kernel).

    The source scratch is pre-sheared along x/y by the INVERSE map's lane
    slopes t'_d(c) = floor(Minv[d][2] c + 0.5); the per-candidate hat
    weights get the matching correction M[:, :2] @ t' folded into their T
    offsets. Windows then exclude the |Minv[d][2]|*TZ lane terms.
    """
    if db:
        m_ref, vol_ref, out_ref, scratch, work, sem = kernel_refs
    else:
        m_ref, vol_ref, out_ref, scratch, sem = kernel_refs
        work = scratch
    TX, TY, TZ = tile
    WX, WY, WZ = win

    m = [[m_ref[4 * d + c] for c in range(4)] for d in range(3)]
    mi = [[m_ref[12 + 4 * d + c] for c in range(4)] for d in range(3)]
    origin = [pl.program_id(i) * tile[i] for i in range(3)]
    of = [jnp.float32(o) for o in origin]

    if db:
        s, wait, slot = _pipelined_dma(mi, tile, lo, pad_dim, cover,
                                       vol_ref, scratch, sem)
    else:
        mins = _corner_min(mi, of, tile)
        s, cp = _anchor_dma(mins, lo, pad_dim, cover, vol_ref, scratch, sem)
        wait, slot = cp.wait, None

    base = [
        jax.lax.broadcasted_iota(jnp.int32, (TX, TY, TZ), d) for d in range(3)
    ]
    ii = base[0].astype(jnp.float32) + of[0]
    jj = base[1].astype(jnp.float32) + of[1]
    kk = base[2].astype(jnp.float32) + of[2]

    c = [mi[d][0] * ii + mi[d][1] * jj + mi[d][2] * kk + mi[d][3]
         for d in range(3)]
    # anchor-RELATIVE floor field (scratch positions are s-relative; the
    # rolls and reads below must be too)
    rel = [jnp.floor(c[d] - s[d].astype(jnp.float32)).astype(jnp.int32)
           - base[d] for d in range(3)]
    u0 = [None, None, None]
    u0[2] = jnp.clip(jnp.min(rel[2]) - lo[2], -(cover[2] - 1), cover[2] - 1)

    gx, gy = mi[0][2], mi[1][2]
    cvec = jax.lax.broadcasted_iota(jnp.int32, (1, 1, cover[2]), 2)
    tx_col = jnp.floor(gx * cvec.astype(jnp.float32) + 0.5).astype(jnp.int32)
    ty_col = jnp.floor(gy * cvec.astype(jnp.float32) + 0.5).astype(jnp.int32)
    kl = jax.lax.broadcasted_iota(jnp.int32, (1, 1, TZ), 2)

    def _t_at(gamma, woff):
        return jnp.floor(gamma * (kl + u0[2] + woff).astype(jnp.float32)
                         + 0.5).astype(jnp.int32)

    # EXACT anchors over every w in the window (see _pull_shear_kernel)
    mnx = jnp.int32(_BIG)
    mny = jnp.int32(_BIG)
    for w in range(WZ):
        mnx = jnp.minimum(mnx, jnp.min(rel[0] - _t_at(gx, w)))
        mny = jnp.minimum(mny, jnp.min(rel[1] - _t_at(gy, w)))
    u0[0] = jnp.clip(mnx - lo[0], -(cover[0] - 1), cover[0] - 1)
    u0[1] = jnp.clip(mny - lo[1], -(cover[1] - 1), cover[1] - 1)

    # g at the UNSHEARED base candidate o0 = s + u0 + base; per-iteration
    # offsets add M @ (u + t'_x, v + t'_y, w)
    o0 = [(s[d] + u0[d] + base[d]).astype(jnp.float32) for d in range(3)]
    g0 = [m[d][0] * o0[0] + m[d][1] * o0[1] + m[d][2] * o0[2] + m[d][3]
          for d in range(3)]

    wait()
    scr = scratch[slot] if db else scratch[:]
    for axis, tcol in ((0, tx_col), (1, ty_col)):
        r_amt = jnp.remainder(-tcol, cover[axis])
        bits = max(1, (cover[axis] - 1).bit_length())
        for b in range(bits):
            sel = (r_amt & (1 << b)) != 0
            rolled = pltpu.roll(scr, 1 << b, axis)
            scr = jnp.where(sel, rolled, scr)
    for d in range(3):
        scr = pltpu.roll(scr, jnp.remainder(-u0[d], scr.shape[d]), d)
    work[:] = scr

    vg = [(base[d] + origin[d]).astype(jnp.float32) for d in range(3)]
    T0 = [vg[d] - g0[d] for d in range(3)]
    shapes1 = ((TX, 1, 1), (1, TY, 1), (1, 1, TZ))
    base1 = [jax.lax.broadcasted_iota(jnp.int32, shapes1[d], d)
             for d in range(3)]

    # The candidate's sample-point FOV is NOT tested in the loops below:
    # _fov_premask zeroed those source values before the kernel (exact —
    # the mask depends only on the original voxel o, and vg - t here IS
    # g(o') of the voxel each sheared read lands on). The in-source-range
    # ok masks must stay: out-of-range candidates WRAP onto real data.
    acc = jnp.zeros((TX, TY, TZ), jnp.float32)
    for w in range(WZ):
        tw_x = _t_at(gx, w)
        tw_y = _t_at(gy, w)
        tw_xf = tw_x.astype(jnp.float32)
        tw_yf = tw_y.astype(jnp.float32)
        okz = ((s[2] + u0[2] + w + base1[2] >= 0)
               & (s[2] + u0[2] + w + base1[2] < in_dim[2])).astype(jnp.float32)
        # hoist the lane-vector shear correction and the w step out of the
        # (u, v) loops: the per-(u, v, d) hat argument is ONE scalar sub
        T0w = [T0[d] - (m[d][0] * tw_xf + m[d][1] * tw_yf) - m[d][2] * w
               for d in range(3)]
        okys = [((s[1] + u0[1] + v + base1[1] + tw_y >= 0)
                 & (s[1] + u0[1] + v + base1[1] + tw_y < in_dim[1])
                 ).astype(jnp.float32) for v in range(WY)]

        def u_body(u, acc, w=w, tw_x=tw_x, T0w=T0w, okz=okz, okys=okys):
            uf = u.astype(jnp.float32)
            okx = ((s[0] + u0[0] + u + base1[0] + tw_x >= 0)
                   & (s[0] + u0[0] + u + base1[0] + tw_x < in_dim[0])
                   ).astype(jnp.float32)
            okxz = okx * okz
            for v in range(WY):
                wt = okxz * okys[v]
                for d in range(3):
                    t = T0w[d] - (m[d][0] * uf + m[d][1] * v)
                    wt = wt * jnp.maximum(1.0 - jnp.abs(t), 0.0)
                acc = acc + wt * work[pl.ds(u, TX), v:v + TY, w:w + TZ]
            return acc

        acc = _fori_win(WX, u_body, acc)
    out_ref[:] = acc


# ---------------------------------------------------------------------------
# Host-side planning
# ---------------------------------------------------------------------------

def _span(Mlin, tile, d):
    """Static per-axis window size: span of (g_d - base_d) over a tile."""
    s = abs(abs(Mlin[d][d]) - 1.0) * tile[d]
    for e in range(3):
        if e != d:
            s += abs(Mlin[d][e]) * tile[e]
    return s


def _make_plan(in_dim, out_dim, span_fn, extent, extra, max_iters):
    """(tile, cover, pad_dim, win): cover = DMA/scratch box (aligned sizes),
    pad_dim = source padded to contain any aligned-offset cover box."""
    tile = (min(8, _round_up(out_dim[0], 8)),
            min(8, _round_up(out_dim[1], 8)),
            min(128, _round_up(out_dim[2], 128)))
    # window = ceil(index-field span over the tile) + per-point extent
    win = tuple(int(math.ceil(span_fn(tile, d))) + extent for d in range(3))
    if win[0] * win[1] * win[2] > max_iters:
        return None
    pad_z = _round_up(max(in_dim[2], tile[2] + win[2] + extra), 128)
    cover = (tile[0] + win[0] + extra,
             _round_up(tile[1] + win[1] + extra, 8) + 8,  # +8: offset quantised
             pad_z)  # full z: z DMA offset pinned at 0
    pad_dim = (max(in_dim[0], cover[0]),
               _round_up(max(in_dim[1], cover[1]), 8),
               pad_z)
    # VMEM sanity: scratch (2 double-buffer slots + the rolled work copy)
    # + the live tile temporaries (z-weight lists, accumulators, index
    # fields — see the kernels' VMEM notes) must fit the 16 MB scoped-vmem
    # budget with headroom for compiler temporaries
    tile_bytes = int(np.prod(tile)) * 4
    vmem_est = 3 * int(np.prod(cover)) * 4 + (2 * win[2] + 12) * tile_bytes
    if vmem_est > 10 * 1024 * 1024:
        return None
    return tile, cover, pad_dim, win


def plan_pull(in_dim, out_dim, M_nominal, slack: float = 0.15,
              abs_slack: float = 4.0, max_iters: int = 2048):
    """Pull plan, or None -> XLA fallback.

    Windows derive from the NOMINAL affine plus a multiplicative AND an
    additive slack. The additive term matters: for near-identity nominal maps
    the span is ~0, so a multiplicative margin alone leaves no headroom and
    sub-degree rigid drift silently overruns the window (round-1 ADVICE.md
    high-severity finding). Drift beyond the planned capacity is prevented
    by the solver: rigid candidates are checked against
    :func:`plan_capacity_pull` on device and rejected, and the fit loop
    re-plans from the drifted pose at chunk boundaries.
    """
    L = np.asarray(M_nominal, np.float64)[:3, :3]
    # extent 2: the fractional floor + the second trilinear corner
    return _make_plan(in_dim, out_dim,
                      lambda tile, d: _span(L, tile, d) * (1.0 + slack)
                      + abs_slack,
                      extent=2, extra=4, max_iters=max_iters)


def plan_pull_shear(in_dim, out_dim, M_nominal, rot_budget: float = 0.05,
                    slack: float = 0.15, max_iters: int = 512):
    """Plan for the shear pull kernel, or None -> fallback.

    Compute windows exclude the lane-coupling term (the shear pre-pass
    removes it), so they are ROTATION-INDEPENDENT: any pose within
    ``rot_budget`` radians of nominal runs exactly, with only the DMA cover
    box sized for the full (sheared) footprint. 1.5 window slack covers the
    shear rounding + the mid-window anchor estimate.
    """
    L = np.asarray(M_nominal, np.float64)[:3, :3]
    tile = (min(8, _round_up(out_dim[0], 8)),
            min(8, _round_up(out_dim[1], 8)),
            min(128, _round_up(out_dim[2], 128)))
    TX, TY, TZ = tile
    # Capacity-minimal windows (round 5): win = ceil(S_max + account) where
    # S_max = nominal sheared span * (1 + slack) + the drift allowance
    # rot_budget * (TX + TY), and account matches plan_capacity_pull_shear
    # EXACTLY (x/y: 3.4 = 2 interpolation slots + 1 integer-tight floor
    # jitter pair + 0.4 gamma*WZ; z: 2.0 = 2 slots, single floor). The
    # earlier formula allocated ceil(S + 1.5) + 2 — up to a whole window
    # slot beyond what the capacity check can ever admit, paid on every
    # (u, v) iteration of every kernel call.
    drift = rot_budget * (TX + TY)
    win = []
    for d in range(2):
        o = 1 - d
        sd = (abs(abs(L[d][d]) - 1.0) * tile[d] + abs(L[d][o]) * tile[o])
        win.append(int(math.ceil(sd * (1.0 + slack) + drift + 3.4)))
    sz = _span(L, tile, 2) * (1.0 + slack) + drift
    win.append(int(math.ceil(sz + 2.0)))
    win = tuple(win)
    if win[0] * win[1] * win[2] > max_iters:
        return None
    # DMA cover: the full footprint including lane coupling at any pose
    # within the rotation budget
    full = [_span(L, tile, d) + rot_budget * (TX + TY + TZ) for d in range(3)]
    extra = 4
    pad_z = _round_up(max(in_dim[2], tile[2] + int(math.ceil(full[2])) + 2
                          + extra), 128)
    cover = (TX + int(math.ceil(full[0])) + 2 + extra,
             _round_up(TY + int(math.ceil(full[1])) + 2 + extra, 8) + 8,
             pad_z)
    pad_dim = (max(in_dim[0], cover[0]),
               _round_up(max(in_dim[1], cover[1]), 8), pad_z)
    tile_bytes = int(np.prod(tile)) * 4
    vmem_est = 3 * int(np.prod(cover)) * 4 + 12 * tile_bytes
    if vmem_est > 10 * 1024 * 1024:
        return None
    return tile, cover, pad_dim, win


def plan_capacity_pull_shear(plan):
    """(tile, win_caps, cover_caps): the shear kernel is exact for dynamic M
    with per-axis SHEARED span (x/y: no lane term) <= win_caps[d] AND full
    footprint span <= cover_caps[d] (z unconstrained: full axis resident).

    x/y derivation (exact per-w anchor): the window must hold the integer
    spread of rel - t_w over (tile, w) plus the two interpolation slots.
    The real-valued spread is sheared_span + |gamma| * WZ (lane slope times
    the w window, |gamma| bounded by the cover caps at ~0.09, WZ <= 6 ->
    <= 0.4 budgeted); the two floors (sample coordinate, integer shear)
    add < 2 and the spread is integer, so win >= ceil(span + 0.4) + 2 + 1
    suffices: caps = win - 3.4. z has a single floor: caps = win - 2."""
    tile, cover, pad_dim, win = plan
    win_caps = (float(win[0]) - 3.4, float(win[1]) - 3.4,
                float(win[2]) - 2.0)
    cover_caps = (float(cover[0] - tile[0] - 4),
                  float(cover[1] - 8 - tile[1] - 4))
    return tile, win_caps, cover_caps


def dyn_span_shear(M, tile):
    """Device (3,) SHEARED per-axis index-field span (x/y without the lane
    term, z as usual) of (3,4) map ``M`` over a tile."""
    import jax.numpy as _jnp

    sx = (_jnp.abs(_jnp.abs(M[0, 0]) - 1.0) * tile[0]
          + _jnp.abs(M[0, 1]) * tile[1])
    sy = (_jnp.abs(M[1, 0]) * tile[0]
          + _jnp.abs(_jnp.abs(M[1, 1]) - 1.0) * tile[1])
    sz = (_jnp.abs(M[2, 0]) * tile[0] + _jnp.abs(M[2, 1]) * tile[1]
          + _jnp.abs(_jnp.abs(M[2, 2]) - 1.0) * tile[2])
    return _jnp.stack([sx, sy, sz])


def plan_push_shear(in_dim, out_dim, M_nominal, rot_budget: float = 0.05,
                    slack: float = 0.15, l1_slack: float = 0.2,
                    max_iters: int = 512):
    """Plan for the shear push kernel, or None.

    Same anchor-depth accounting as :func:`plan_push` (lo = ceil(L1
    budget)-1) but the x/y field spans exclude the inverse map's lane terms,
    which the shear pre-pass removes; the DMA cover carries the full
    footprint at the rotation budget.
    """
    M4 = np.eye(4)
    M4[:3, :4] = np.asarray(M_nominal, np.float64)[:3, :4]
    Li = np.linalg.inv(M4)[:3, :3]
    L1 = np.abs(Li).sum(axis=1)
    K = [int(math.ceil(L1[d] + l1_slack)) for d in range(3)]
    lo = tuple(k - 1 for k in K)
    tile = (min(8, _round_up(out_dim[0], 8)),
            min(8, _round_up(out_dim[1], 8)),
            min(128, _round_up(out_dim[2], 128)))
    TX, TY, TZ = tile
    # Capacity-minimal windows (see plan_pull_shear): win = ceil(S_max +
    # account) with account matching plan_capacity_push_shear EXACTLY
    # (x/y: 2 lo + 2 candidate slots + 1.4 jitter/gamma; z: 2 lo + 2).
    drift = rot_budget * (TX + TY)
    win = []
    for d in range(2):
        o = 1 - d
        sd = (abs(abs(Li[d][d]) - 1.0) * tile[d] + abs(Li[d][o]) * tile[o])
        win.append(int(math.ceil(sd * (1.0 + slack) + drift
                                 + 2 * lo[d] + 2 + 1.4)))
    sz = _span(Li, tile, 2) * (1.0 + slack) + drift + 2 * lo[2] + 2
    win.append(int(math.ceil(sz)))
    win = tuple(win)
    if win[0] * win[1] * win[2] > max_iters:
        return None
    full = [_span(Li, tile, d) + rot_budget * (TX + TY + TZ) + 2 * lo[d]
            for d in range(3)]
    extra = 6
    pad_z = _round_up(max(in_dim[2], tile[2] + int(math.ceil(full[2])) + 2
                          + extra), 128)
    cover = (TX + int(math.ceil(full[0])) + 2 + extra,
             _round_up(TY + int(math.ceil(full[1])) + 2 + extra, 8) + 8,
             pad_z)
    pad_dim = (max(in_dim[0], cover[0]),
               _round_up(max(in_dim[1], cover[1]), 8), pad_z)
    tile_bytes = int(np.prod(tile)) * 4
    vmem_est = 3 * int(np.prod(cover)) * 4 + 12 * tile_bytes
    if vmem_est > 10 * 1024 * 1024:
        return None
    return tile, cover, pad_dim, win, lo


def plan_capacity_push_shear(plan):
    """(tile, win_caps, max_L1, cover_caps) for a shear push plan: exact for
    dynamic (M, Minv) with SHEARED inverse spans <= win_caps, L1 strictly
    below lo+1, and full inverse footprint <= cover_caps (x/y).

    x/y: candidates occupy 2 lo + 2 slots per element on top of the integer
    anchor-field spread (exact per-w minimum); the spread is bounded by
    sheared_span + |gamma| * WZ (<= 0.4 budgeted) + the two floor jitters
    (< 2, integer-tight at +1 each) -> caps = win - (2 lo + 2) - 1.4.
    z has one floor -> caps = win - (2 lo + 2) - 0."""
    tile, cover, pad_dim, win, lo = plan
    win_caps = (float(win[0] - (2 * lo[0] + 2)) - 1.4,
                float(win[1] - (2 * lo[1] + 2)) - 1.4,
                float(win[2] - (2 * lo[2] + 2)) - 0.0)
    l1_caps = tuple(float(l + 1) for l in lo)
    cover_caps = (float(cover[0] - tile[0] - 2 * lo[0] - 4),
                  float(cover[1] - 8 - tile[1] - 2 * lo[1] - 4))
    return tile, win_caps, l1_caps, cover_caps


def plan_capacity_pull(plan):
    """(tile, max_span) supported by a pull plan: the kernel is exact for any
    dynamic M whose per-axis index-field span over one tile (see
    :func:`dyn_span`) is <= max_span[d]."""
    tile, cover, pad_dim, win = plan
    return tile, tuple(float(w - 2) for w in win)


def plan_capacity_push(plan):
    """(tile, max_span, max_L1) supported by a push plan.

    The kernel is exact for dynamic (M, Minv) with, per axis d,
      * inverse-map index-field span over one tile <= max_span[d], and
      * inverse-map L1 row norm STRICTLY below max_L1[d] = lo[d] + 1
        (candidates for a target v are the integers in (c - L1, c + L1);
        with L1 < lo+1 the lowest lies at most lo below floor(c) and the
        highest at most lo+1 above it — the anchor and window sizes in
        :func:`plan_push` allocate exactly that).
    """
    tile, cover, pad_dim, win, lo = plan
    return tile, \
        tuple(float(win[d] - (2 * lo[d] + 2)) for d in range(3)), \
        tuple(float(lo[d] + 1) for d in range(3))


def dyn_span(M, tile):
    """Device (3,) per-axis index-field span of (3,4) map ``M`` over a tile.

    Mirrors the host :func:`_span` bound used at plan time; jit-traceable so
    the fit loop can veto rigid candidates that would overrun a plan.
    """
    import jax.numpy as _jnp

    out = []
    for d in range(3):
        sd = _jnp.abs(_jnp.abs(M[d, d]) - 1.0) * tile[d]
        for e in range(3):
            if e != d:
                sd = sd + _jnp.abs(M[d, e]) * tile[e]
        out.append(sd)
    return _jnp.stack(out)


def dyn_l1(Minv):
    """Device (3,) L1 row norms of the linear part of a (3,4) map."""
    import jax.numpy as _jnp

    return _jnp.sum(_jnp.abs(Minv[:, :3]), axis=1)


def plan_push(in_dim, out_dim, M_nominal, slack: float = 0.15,
              abs_slack: float = 4.0, l1_slack: float = 0.2,
              max_iters: int = 2048):
    """Push plan (windows from the inverse map + interpolation support).

    Exact accounting: candidates for target v are the integers o with
    |o_d - c_d| < L1_d (c = Minv v, L1 = inverse-map L1 row norm). For
    L1 < lo+1 the lowest candidate is at most ``lo = ceil(L1_budget)-1``
    below floor(c) and the highest at most lo+1 above, so per element
    2 lo + 2 slab offsets suffice; the window adds the per-tile floor-field
    span on top. ``l1_slack`` budgets L1 growth under rigid drift — the
    nominal L1 is EXACTLY 1 on aligned axes, so without an additive budget
    any rotation would immediately exceed the planned anchor depth
    (round-1 ADVICE.md high-severity: silent window overrun under drift;
    now also rejected at runtime via :func:`plan_capacity_push`).
    """
    M4 = np.eye(4)
    M4[:3, :4] = np.asarray(M_nominal, np.float64)[:3, :4]
    Li = np.linalg.inv(M4)[:3, :3]
    L1 = np.abs(Li).sum(axis=1)
    K = [int(math.ceil(L1[d] + l1_slack)) for d in range(3)]
    lo = tuple(k - 1 for k in K)
    plan = _make_plan(
        in_dim, out_dim,
        lambda tile, d: _span(Li, tile, d) * (1.0 + slack) + abs_slack
        + 2.0 * lo[d] + 1.0,
        extent=1, extra=6, max_iters=max_iters)
    if plan is None:
        return None
    return plan + (lo,)


def _pad_to(vol, pad_dim):
    pads = [(0, pad_dim[d] - vol.shape[d]) for d in range(3)]
    if any(p[1] for p in pads):
        vol = jnp.pad(vol, pads)
    return vol


# ---------------------------------------------------------------------------
# pallas_call wrappers
# ---------------------------------------------------------------------------

def _scratch_shapes(cover, db):
    """Scratch layout: double-buffered (2 DMA slots + rolled work copy +
    2 semaphores) or single-buffered (1 slot doubling as work + 1 sem)."""
    if db:
        return [pltpu.VMEM((2,) + tuple(cover), jnp.float32),
                pltpu.VMEM(tuple(cover), jnp.float32),
                pltpu.SemaphoreType.DMA((2,))]
    return [pltpu.VMEM(tuple(cover), jnp.float32),
            pltpu.SemaphoreType.DMA(())]


def _fov_premask(vals, M, bounds_dim):
    """Zero source voxels whose sample position g(o) = M @ (o, 1) falls
    outside the pull FOV [-0.5, bounds-0.5] (pull's extrapolate=False
    masking): the adjoint must drop their contributions entirely.

    The mask depends only on the SOURCE voxel o, never on the output voxel,
    so it factors out of the push kernels' window loops exactly (0/1 factor,
    bitwise-identical products). Applying it here — one fused elementwise
    XLA pass (~1 ms at 181^3) — lets the kernels drop the 3-axis FOV fold
    per window point (~15 of ~32 vector ops/point; push runs 200-300 window
    points per element), the single largest VPU cost in the fit chunk."""
    dims = vals.shape
    g = [M[d, 0] * jax.lax.broadcasted_iota(jnp.float32, dims, 0)
         + M[d, 1] * jax.lax.broadcasted_iota(jnp.float32, dims, 1)
         + M[d, 2] * jax.lax.broadcasted_iota(jnp.float32, dims, 2)
         + M[d, 3] for d in range(3)]
    ok = ((g[0] >= -0.5) & (g[0] <= bounds_dim[0] - 0.5)
          & (g[1] >= -0.5) & (g[1] <= bounds_dim[1] - 0.5)
          & (g[2] >= -0.5) & (g[2] <= bounds_dim[2] - 0.5))
    return jnp.where(ok, vals, 0.0)


@functools.partial(jax.jit, static_argnames=("plan", "in_dim", "out_dim"))
def _pull_call(vol, M, plan, in_dim, out_dim):
    tile, cover, pad_dim, win = plan
    db = _db_default()
    volp = _pad_to(vol, pad_dim)
    grid = tuple(pl.cdiv(out_dim[d], tile[d]) for d in range(3))
    kernel = functools.partial(_pull_kernel, tile, cover, win, in_dim,
                               pad_dim, db)

    def body(m_ref, vol_ref, out_ref, *scr):
        kernel((m_ref, vol_ref, out_ref) + scr)

    return pl.pallas_call(
        body,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=grid,
            in_specs=[pl.BlockSpec(memory_space=pltpu.ANY)],
            out_specs=pl.BlockSpec(tile, lambda i, j, k, sc: (i, j, k),
                                   memory_space=pltpu.VMEM),
            scratch_shapes=_scratch_shapes(cover, db),
        ),
        out_shape=jax.ShapeDtypeStruct(out_dim, jnp.float32),
        compiler_params=_COMPILER_PARAMS,
    )(M.reshape(-1), volp)


@functools.partial(jax.jit, static_argnames=("plan", "in_dim", "out_dim"))
def _pull_grad_call(vol, M, plan, in_dim, out_dim):
    tile, cover, pad_dim, win = plan
    db = _db_default()
    volp = _pad_to(vol, pad_dim)
    grid = tuple(pl.cdiv(out_dim[d], tile[d]) for d in range(3))
    kernel = functools.partial(_pull_grad_kernel, tile, cover, win, in_dim,
                               pad_dim, db)

    def body(m_ref, vol_ref, gx_ref, gy_ref, gz_ref, *scr):
        kernel((m_ref, vol_ref, gx_ref, gy_ref, gz_ref) + scr)

    out_spec = pl.BlockSpec(tile, lambda i, j, k, sc: (i, j, k),
                            memory_space=pltpu.VMEM)
    gx, gy, gz = pl.pallas_call(
        body,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=grid,
            in_specs=[pl.BlockSpec(memory_space=pltpu.ANY)],
            out_specs=[out_spec, out_spec, out_spec],
            scratch_shapes=_scratch_shapes(cover, db),
        ),
        out_shape=[jax.ShapeDtypeStruct(out_dim, jnp.float32)] * 3,
        compiler_params=_COMPILER_PARAMS,
    )(M.reshape(-1), volp)
    return jnp.stack([gx, gy, gz], axis=-1)


@functools.partial(jax.jit, static_argnames=("plan", "in_dim", "out_dim"))
def _push_call(vals, M, Minv, plan, in_dim, out_dim):
    tile, cover, pad_dim, win, lo = plan
    db = _db_default()
    valsp = _pad_to(_fov_premask(vals, M, out_dim), pad_dim)
    grid = tuple(pl.cdiv(out_dim[d], tile[d]) for d in range(3))
    kernel = functools.partial(_push_kernel, tile, cover, win, lo, in_dim,
                               pad_dim, out_dim, db)

    def body(m_ref, vol_ref, out_ref, *scr):
        kernel((m_ref, vol_ref, out_ref) + scr)

    scal = jnp.concatenate([M.reshape(-1), Minv.reshape(-1)])
    return pl.pallas_call(
        body,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=grid,
            in_specs=[pl.BlockSpec(memory_space=pltpu.ANY)],
            out_specs=pl.BlockSpec(tile, lambda i, j, k, sc: (i, j, k),
                                   memory_space=pltpu.VMEM),
            scratch_shapes=_scratch_shapes(cover, db),
        ),
        out_shape=jax.ShapeDtypeStruct(out_dim, jnp.float32),
        compiler_params=_COMPILER_PARAMS,
    )(scal, valsp)


def pallas_pull(vol: Array, M: Array, out_dim, plan) -> Array:
    """Trilinear affine pull (zero bound, no extrapolation) on TPU."""
    return _pull_call(vol, M, plan, tuple(vol.shape), tuple(out_dim))


def pallas_push(vals: Array, M: Array, Minv: Array, vol_dim, plan) -> Array:
    """Exact adjoint of pallas_pull."""
    return _push_call(vals, M, Minv, plan, tuple(vals.shape), tuple(vol_dim))


def pallas_pull_grad(vol: Array, M: Array, out_dim, plan) -> Array:
    """d(pull)/d(sample coords), shape out_dim + (3,); plan from plan_pull."""
    return _pull_grad_call(vol, M, plan, tuple(vol.shape), tuple(out_dim))


@functools.partial(jax.jit, static_argnames=("plan", "in_dim", "out_dim"))
def _pull_shear_call(vol, M, plan, in_dim, out_dim):
    tile, cover, pad_dim, win = plan
    db = _db_default()
    volp = _pad_to(vol, pad_dim)
    grid = tuple(pl.cdiv(out_dim[d], tile[d]) for d in range(3))
    kernel = functools.partial(_pull_shear_kernel, tile, cover, win, in_dim,
                               pad_dim, db)

    def body(m_ref, vol_ref, out_ref, *scr):
        kernel((m_ref, vol_ref, out_ref) + scr)

    return pl.pallas_call(
        body,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=grid,
            in_specs=[pl.BlockSpec(memory_space=pltpu.ANY)],
            out_specs=pl.BlockSpec(tile, lambda i, j, k, sc: (i, j, k),
                                   memory_space=pltpu.VMEM),
            scratch_shapes=_scratch_shapes(cover, db),
        ),
        out_shape=jax.ShapeDtypeStruct(out_dim, jnp.float32),
        compiler_params=_COMPILER_PARAMS,
    )(M.reshape(-1), volp)


def pallas_pull_shear(vol: Array, M: Array, out_dim, plan) -> Array:
    """Shear-pre-pass trilinear pull; plan from :func:`plan_pull_shear`."""
    return _pull_shear_call(vol, M, plan, tuple(vol.shape), tuple(out_dim))


@functools.partial(jax.jit, static_argnames=("plan", "in_dim", "out_dim"))
def _pull_grad_shear_call(vol, M, plan, in_dim, out_dim):
    tile, cover, pad_dim, win = plan
    db = _db_default()
    volp = _pad_to(vol, pad_dim)
    grid = tuple(pl.cdiv(out_dim[d], tile[d]) for d in range(3))
    kernel = functools.partial(_pull_grad_shear_kernel, tile, cover, win,
                               in_dim, pad_dim, db)

    def body(m_ref, vol_ref, gx_ref, gy_ref, gz_ref, *scr):
        kernel((m_ref, vol_ref, gx_ref, gy_ref, gz_ref) + scr)

    out_spec = pl.BlockSpec(tile, lambda i, j, k, sc: (i, j, k),
                            memory_space=pltpu.VMEM)
    gx, gy, gz = pl.pallas_call(
        body,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=grid,
            in_specs=[pl.BlockSpec(memory_space=pltpu.ANY)],
            out_specs=[out_spec, out_spec, out_spec],
            scratch_shapes=_scratch_shapes(cover, db),
        ),
        out_shape=[jax.ShapeDtypeStruct(out_dim, jnp.float32)] * 3,
        compiler_params=_COMPILER_PARAMS,
    )(M.reshape(-1), volp)
    return jnp.stack([gx, gy, gz], axis=-1)


def pallas_pull_grad_shear(vol: Array, M: Array, out_dim, plan) -> Array:
    """Shear-pre-pass pull_grad; plan from :func:`plan_pull_shear` (the same
    plan drives pull and pull_grad — identical windows and DMA cover)."""
    return _pull_grad_shear_call(vol, M, plan, tuple(vol.shape),
                                 tuple(out_dim))


@functools.partial(jax.jit, static_argnames=("plan", "in_dim", "out_dim"))
def _push_shear_call(vals, M, Minv, plan, in_dim, out_dim):
    tile, cover, pad_dim, win, lo = plan
    db = _db_default()
    valsp = _pad_to(_fov_premask(vals, M, out_dim), pad_dim)
    grid = tuple(pl.cdiv(out_dim[d], tile[d]) for d in range(3))
    kernel = functools.partial(_push_shear_kernel, tile, cover, win, lo,
                               in_dim, pad_dim, out_dim, db)

    def body(m_ref, vol_ref, out_ref, *scr):
        kernel((m_ref, vol_ref, out_ref) + scr)

    scal = jnp.concatenate([M.reshape(-1), Minv.reshape(-1)])
    return pl.pallas_call(
        body,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=grid,
            in_specs=[pl.BlockSpec(memory_space=pltpu.ANY)],
            out_specs=pl.BlockSpec(tile, lambda i, j, k, sc: (i, j, k),
                                   memory_space=pltpu.VMEM),
            scratch_shapes=_scratch_shapes(cover, db),
        ),
        out_shape=jax.ShapeDtypeStruct(out_dim, jnp.float32),
        compiler_params=_COMPILER_PARAMS,
    )(scal, valsp)


def pallas_push_shear(vals: Array, M: Array, Minv: Array, vol_dim,
                      plan) -> Array:
    """Shear-pre-pass push (exact pull adjoint); plan from plan_push_shear."""
    return _push_shear_call(vals, M, Minv, plan, tuple(vals.shape),
                            tuple(vol_dim))
