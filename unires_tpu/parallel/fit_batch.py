"""Data-parallel (multi-subject) fit over a 'batch' device mesh.

The reference is single-process, single-device (SURVEY §2.3: no
torch.distributed anywhere); batch-of-subjects data parallelism is the
TPU-native scale-out disposition for this model family — subjects are
independent, so the solve carries ZERO cross-device collectives and the
batch axis can ride DCN across hosts.

Design: the single-subject fit chunk (solvers.fitloop.make_fit_chunk) is a
pure function of (state, xdats, taus, subdats, geom) — every pose, affine
and hyper-parameter is an operand, the compiled program depends on the
geometry only through the integer Pallas window plans. For a
geometry-homogeneous batch (same acquisition protocol: per-(channel, repeat)
dims/ratios/profiles equal across subjects, verified via plan_signature)
ONE compiled chunk therefore serves every subject; this module shard_maps it
over a 1-D ('batch',) mesh with all leaves stacked on a leading subject
axis. Each device runs the FULL per-subject algorithm — ADMM y/z/w updates,
even/odd scaling GN, unified rigid GN, the coarse-to-fine lambda schedule
and per-subject gain convergence — so `fit_batch` on B devices is
semantically identical to B independent `pipeline.fit.fit` runs (tested:
tests/test_fit_batch.py pins equality against the single-device fit).

Channels stay LOCAL to each subject's device (the per-iteration JTV reduce
over channels, reference unires/_update.py:171, is a local sum here); for
channel-axis sharding of a single subject see parallel.sharding (homogeneous
channels) — the two compose when both axes are homogeneous.
"""
from __future__ import annotations

import os

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..solvers.fitloop import (chunk_geom, init_state, make_fit_chunk,
                               plan_signature, replan_margins)
from ..utils.log import info

__all__ = ["batch_mesh", "check_homogeneous", "fit_batch",
           "make_batch_chunk"]


def batch_mesh(B: int, devices=None) -> Mesh:
    """1-D ('batch',) mesh: the largest divisor of B that fits the devices.

    Subjects are independent, so any divisor is valid; using fewer devices
    than subjects stacks several subjects per device (vmapped locally).
    """
    devs = list(jax.devices() if devices is None else devices)
    g = 1
    for d in range(min(B, len(devs)), 0, -1):
        if B % d == 0:
            g = d
            break
    return Mesh(np.asarray(devs[:g]), ("batch",))


def check_homogeneous(xs, ys, sett) -> None:
    """Raise ValueError unless the subjects form a homogeneous batch.

    Homogeneous = one compiled chunk serves every subject: same recon grid,
    same channel/repeat structure, same CT flags, and identical window-plan
    signatures (plan_signature covers dims, ratios, slice-profile kernels
    and the integer Pallas windows; per-subject poses/affines/hyper-pars are
    operands and MAY differ).
    """
    x0, y0 = xs[0], ys[0]
    dim0 = tuple(int(d) for d in y0[0].dim)
    struct0 = [len(xc) for xc in x0]
    ct0 = [o.ct for xc in x0 for o in xc]
    for b, (xb, yb) in enumerate(zip(xs, ys)):
        if [len(xc) for xc in xb] != struct0:
            raise ValueError(
                f"batch subject {b}: channel/repeat structure "
                f"{[len(xc) for xc in xb]} != subject 0's {struct0}")
        if tuple(int(d) for d in yb[0].dim) != dim0:
            raise ValueError(
                f"batch subject {b}: recon grid {yb[0].dim} != {dim0} "
                "(run init with common_output to force one output space)")
        if [o.ct for xc in xb for o in xc] != ct0:
            raise ValueError(f"batch subject {b}: CT flags differ")
        for c, (xc, xc0) in enumerate(zip(xb, x0)):
            for n, (o, o0) in enumerate(zip(xc, xc0)):
                if (o.po.dim_x != o0.po.dim_x
                        or o.po.dim_yx != o0.po.dim_yx
                        or o.po.ratio != o0.po.ratio
                        or o.po.dim_thick != o0.po.dim_thick):
                    raise ValueError(
                        f"batch subject {b} channel {c} repeat {n}: "
                        f"observation geometry differs from subject 0 "
                        f"({o.po.dim_x} vs {o0.po.dim_x}) — a homogeneous "
                        "acquisition protocol is required for batch mode")


def _stack(trees):
    """Stack a list of pytrees on a new leading axis (None leaves pass)."""
    return jax.tree.map(lambda *ls: jnp.stack(ls), *trees)


def _batch_operands(xs, sett):
    """Stacked xdats/taus/subdats with a leading subject axis."""
    from ..pipeline.fit import _gather_subdats

    xdats = _stack([tuple(tuple(jnp.asarray(o.dat, jnp.float32)
                                for o in xc) for xc in xb) for xb in xs])
    taus = _stack([tuple(tuple(jnp.float32(o.tau) for o in xc)
                         for xc in xb) for xb in xs])
    subdats = _stack([_gather_subdats(xb, sett) for xb in xs])
    return xdats, taus, subdats


def make_batch_chunk(xs, ys, sett, K: int, mesh: Mesh,
                     extra_budget: float = 0.0):
    """shard_map the single-subject chunk body over the 'batch' mesh axis.

    Builds the chunk (suites, plans, AOT-cached executable machinery) ONCE
    from subject 0; per-subject geometry (pre/post affines, lam0) rides in
    as a stacked operand. Per-device local blocks of size 1 (the B == mesh
    case) call the body directly — bit-identical to the single-device fit;
    larger local blocks vmap it.
    """
    proto = make_fit_chunk(xs[0], ys[0], sett, K, extra_budget)
    impl = proto._impl
    geoms = _stack([chunk_geom(xb, yb, sett)[0]
                    for xb, yb in zip(xs, ys)])

    def local_body(state_b, xdats_b, taus_b, subdats_b, geom_b):
        B_loc = int(state_b.n_iter.shape[0])
        if B_loc == 1:
            sq = lambda t: jax.tree.map(lambda a: a[0], t)  # noqa: E731
            st, objs, gains, valid = impl(sq(state_b), sq(xdats_b),
                                          sq(taus_b), sq(subdats_b),
                                          sq(geom_b))
            return (jax.tree.map(lambda a: a[None], st),
                    objs[None], gains[None], valid[None])
        return jax.vmap(impl)(state_b, xdats_b, taus_b, subdats_b, geom_b)

    bspec = P("batch")
    step = jax.shard_map(
        local_body, mesh=mesh,
        in_specs=(bspec, bspec, bspec, bspec, bspec),
        out_specs=(bspec, bspec, bspec, bspec),
        check_vma=False)
    jitted = jax.jit(step, donate_argnums=(0,))

    def chunk(state, xdats, taus, subdats):
        return jitted(state, xdats, taus, subdats, geoms)

    chunk._proto = proto
    chunk._mesh = mesh
    return chunk


def fit_batch(xs, ys, sett):
    """Fit a geometry-homogeneous batch of subjects, sharded over devices.

    ``xs``/``ys``: lists over subjects of the per-subject pipeline structs
    (as produced by ``pipeline.run.init`` per subject). Returns a list over
    subjects of ``(y, R, jtv, obj_trace, n_iter)`` — the same contract as
    ``pipeline.fit.fit``, which each entry matches semantically (per-subject
    schedule + convergence; equality pinned by tests/test_fit_batch.py).

    Scope (documented, docs/PARITY.md): checkpoint/resume and the
    margin-triggered window re-plan are single-subject features; batch mode
    sizes the plans for all subjects' initial poses up front (budget
    escalation below) and relies on the device-side capacity veto for
    exactness. Saturation-triggered escalation rebuilds the batch chunk.
    """
    from ..pipeline.fit import (_REPLAN_MARGIN_DEFAULT, _sync_state,
                                get_sched)
    from ..geometry import fov_centre, rigid_from_q

    B = len(xs)
    if B == 0:
        return []
    check_homogeneous(xs, ys, sett)
    sett = get_sched(sum(len(xc) for xc in xs[0]), sett)
    for yb in ys:
        for c in range(len(yb)):
            yb[c].lam = float(np.atleast_1d(sett.reg_scl)[0]) * yb[c].lam0

    results = [None] * B
    if sett.max_iter <= 0:
        for b in range(B):
            N = sum(len(xc) for xc in xs[b])
            results[b] = (ys[b], np.stack([np.eye(4)] * N), None, [], 0)
        return results

    mesh = batch_mesh(B)
    info(sett, "batch-start", B, mesh)

    # size the window plans for every subject's INITIAL pose: margins are
    # measured against subject 0's plans (the ones the shared chunk compiles
    # in); escalate the budget until all subjects fit with headroom
    extra_budget = 0.0
    while extra_budget < 0.15:
        sig0 = plan_signature(xs[0], sett,
                              init_state(xs[0], ys[0], sett).q, extra_budget)
        worst = min(replan_margins(xb, sett,
                                   init_state(xb, yb, sett).q, plans=sig0)
                    for xb, yb in zip(xs, ys))
        if worst >= _REPLAN_MARGIN_DEFAULT:
            break
        extra_budget += 0.05

    K = max(1, min(int(getattr(sett, "chunk_iters", 16)), sett.max_iter))
    chunk = make_batch_chunk(xs, ys, sett, K, mesh, extra_budget)
    state = _stack([init_state(xb, yb, sett) for xb, yb in zip(xs, ys)])
    sh = NamedSharding(mesh, P("batch"))
    state = jax.tree.map(lambda a: jax.device_put(a, sh), state)
    xdats, taus, subdats = _batch_operands(xs, sett)
    xdats = jax.tree.map(lambda a: jax.device_put(a, sh), xdats)

    obj_traces = [[] for _ in range(B)]
    n_sat_seen = np.zeros(B, np.int64)
    sat_streak = np.zeros(B, np.int64)
    while True:
        state, objs, gains, valid = chunk(state, xdats, taus, subdats)
        objs = np.asarray(objs, np.float64)     # (B, K, 3)
        valid = np.asarray(valid)               # (B, K)
        for b in range(B):
            for k in range(int(valid[b].sum())):
                obj_traces[b].append(objs[b, k])
        if sett.do_print >= 1:
            lead = [t[-1][0] if t else float("nan") for t in obj_traces]
            print(f"batch-fit: iter<= {int(np.asarray(state.n_iter).max())} "
                  f"done {int(np.asarray(state.done).sum())}/{B} "
                  f"obj0 {lead[0]:.6g}")
        done = np.asarray(state.done)
        n_iter = np.asarray(state.n_iter)
        if bool((done | (n_iter >= sett.max_iter)).all()):
            break

        # saturation-triggered budget escalation (mirrors pipeline.fit):
        # a pose pinned at the window edge for 2 consecutive chunks means
        # the shared plans are too tight for that subject — rebuild wider
        ns = np.asarray(state.n_sat, np.int64)
        sat_streak = np.where(ns > n_sat_seen, sat_streak + 1, 0)
        n_sat_seen = ns
        if bool((sat_streak >= 2).any()) and extra_budget < 0.15:
            extra_budget += 0.05
            if sett.do_print >= 1:
                print(f"batch-fit: pose budget escalation -> "
                      f"+{extra_budget:.2f} rad (re-planning)")
            chunk = make_batch_chunk(xs, ys, sett, K, mesh, extra_budget)
            sat_streak[:] = 0

    # unpack per-subject results through the single-subject sync path
    basis = sett.rigid_basis
    for b in range(B):
        st_b = jax.tree.map(lambda a: a[b], state)
        _sync_state(xs[b], ys[b], sett, st_b)
        N = sum(len(xc) for xc in xs[b])
        qs = np.asarray(st_b.q, np.float64)
        # centre-conjugated world transforms — the same convention the
        # single-device fit returns (pipeline/fit.py R collection)
        centre = fov_centre(ys[b][0].mat, ys[b][0].dim)
        R = np.stack([rigid_from_q(qs[i], basis, centre)
                      for i in range(N)]) if basis is not None \
            else np.stack([np.eye(4)] * N)
        results[b] = (ys[b], R, np.asarray(st_b.jtv), obj_traces[b],
                      int(np.asarray(st_b.n_iter)))
    return results
