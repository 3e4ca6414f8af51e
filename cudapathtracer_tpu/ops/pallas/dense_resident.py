"""Pallas TPU kernel: dense per-tile cluster intersection, VMEM-resident.

The DMA-pipelined kernel (ops/pallas/dense.py) pays ~microseconds of
control overhead per shortlist slot (DMA issue/wait, scalar syncs). For
scenes whose packed cluster array fits in VMEM — a (K+1, 16, C) f32 block,
8 KB per cluster at C=128, so ~2K clusters / ~260K triangles — we can pin
the whole scene on-chip and make every slot a pure VPU iteration: one
dynamic sublane slice + a (P, C) Moller-Trumbore sweep. No DMA in the loop
at all.

Orientation: rays along SUBLANES ((P, 1) columns sliced from a (P, 8)
per-tile block), triangles along LANES ((1, C) rows from the resident
block). The closest-hit fold is DEFERRED across lane columns: each ray
carries (P, 128) per-column running minima (_slab_update, elementwise
only) and the cross-lane reduction to (P, 1) happens once per unroll
group (gate/early-exit row) plus once per tile (_slab_reduce) — not
twice per slot. The two outputs ride a (Tl, 2, P) f32 array
([t, id + 2^23]).

Shortlists (entry-sorted, from ops/packets.py) stage HBM -> SMEM per tile
group exactly as in dense.py, and the same early exit applies: a tile
stops as soon as every live ray's best hit beats the next candidate's
conservative entry distance.
"""

from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ...utils.constants import EPS_PARALLEL, MAX_FLOAT

# Shared by both kernels (the DMA-pipelined variant in dense.py imports
# from here; plain ints, not jnp constants — a module-level jnp value
# would be captured as a traced constant, which pallas_call rejects).
_TRI_SENTINEL = 0x7FFFFFFF
_TILE_GROUP = 8    # tiles per grid step (sublane-divisibility of blocks)
MAX_SHORTLIST = 4095  # shortlist cap; SMEM row width adapts to the
#                       actual M (multiples of 128 lanes)
_ID_OFFSET = float(1 << 23)  # exact-integer float window for triangle ids
MAX_TRIS = (1 << 23) - 2     # ids (incl. the pad id T) must stay exact
_MASKED_T_INIT = -3.0e38  # masked lanes start below any real t so they
#                           never update and never block the early exit

_ATTR_ROWS = 16  # 9 attrs + ids + 6 box floats (box unused here), 8-aligned

# VMEM budget for the resident scene block; beyond this the caller must use
# the DMA-pipelined kernel (ops/pallas/dense.py). Mosaic's DEFAULT limit is
# 32 MB, but v5e VMEM is physically 128 MB — we pass an explicit
# vmem_limit_bytes (scene block + fold-temp headroom) to pallas_call, which
# lets sponza-scale scenes (328k tris ≈ 30 MB packed) stay fully resident
# instead of falling back to the DMA-pipelined path.
RESIDENT_VMEM_BUDGET = 72 * 1024 * 1024

# headroom for everything that is NOT the scene block: the (P, C) f32 fold
# temps (~10 live at C=1024 → ~10 MB), the (G, NR, P) ray block, outputs,
# and Mosaic internal scratch
_VMEM_HEADROOM = 44 * 1024 * 1024
_VMEM_CEILING = 124 * 1024 * 1024  # v5e physical VMEM minus a safety margin


def resident_fits(num_clusters: int, cluster_size: int) -> bool:
    return (num_clusters + 1) * _ATTR_ROWS * cluster_size * 4 \
        <= RESIDENT_VMEM_BUDGET


def pack_cluster_boxes(pd) -> jnp.ndarray:
    """PacketData -> (ceil((K+1)/16), 128) f32 cluster AABBs, 16 boxes of
    8 floats [lo.xyz, hi.xyz, 0, 0] per row.

    Rides the kernel's scalar-prefetch path into SMEM: the box gate reads
    6 SCALARS per slot instead of slicing 6 broadcast rows out of the VMEM
    block — the (16, C) cluster slice then only happens inside the gated
    fold branch, so a gated-out slot touches no VMEM at all.

    Why 16 boxes per row: SMEM pads every row to 128 lanes, so the older
    (K+1, 8) layout burned 512 B per cluster and overflowed the ~1 MB SMEM
    at K ~ 2000 (measured: C=128 at 328k tris, K=3936 -> 1.9 MB compile
    failure). Packing 8-float boxes 16-to-a-row is exactly one 128-lane
    row per 16 clusters; the kernels read box floats as
    ``boxes_ref[sid >> 4, ((sid & 15) << 3) + j]`` (two extra scalar ops
    per slot). The sentinel box (index K) and any row-padding slots are
    degenerate far-away point boxes (all coords 1e7, beyond any search
    cap) so they can never pass a gate."""
    K1 = pd.cl_lo.x.shape[0] + 1
    rows = -(-K1 // 16)
    pad = rows * 16 - K1
    far = jnp.full((1 + pad,), 1.0e7, jnp.float32)

    def col(v):
        return jnp.concatenate([v.astype(jnp.float32), far])[:, None]

    z = jnp.zeros_like(col(pd.cl_lo.x))
    flat = jnp.concatenate(
        [col(pd.cl_lo.x), col(pd.cl_lo.y), col(pd.cl_lo.z),
         col(pd.cl_hi.x), col(pd.cl_hi.y), col(pd.cl_hi.z), z, z], axis=1)
    return flat.reshape(rows, 128)


def pack_clusters_resident(pd) -> jnp.ndarray:
    """PacketData -> (K+1, 16, C) f32 resident cluster blocks.

    Attribute ROWS (v0/e1/e2 xyz, ids as id+2^23 exact floats, cluster box),
    triangles along LANES. C must be a multiple of 128 (lane tiling).
    Rows 10-15 (the broadcast box) are no longer read by the kernel (boxes
    ride SMEM via pack_cluster_boxes) but stay in the layout: the (8, 128)
    sublane tiling pads 10 rows to 16 anyway, so dropping them saves no
    VMEM and would churn every consumer.

    C < 128 (small test scenes reaching the DMA kernel) is lane-padded to
    128 with all-zero triangles: a == 0 -> parallel reject -> ts stays
    MAX_FLOAT and the pad id never wins the fold."""
    K1, C = pd.tri.shape
    ids_f = pd.tri.astype(jnp.float32) + _ID_OFFSET

    def rep(v):  # (K,) -> (K+1, C)
        v = jnp.concatenate([v, jnp.zeros((1,), v.dtype)])
        return jnp.broadcast_to(v[:, None], (K1, C))

    packed = jnp.stack(
        [pd.v0.x, pd.v0.y, pd.v0.z,
         pd.e1.x, pd.e1.y, pd.e1.z,
         pd.e2.x, pd.e2.y, pd.e2.z,
         ids_f,
         rep(pd.cl_lo.x), rep(pd.cl_lo.y), rep(pd.cl_lo.z),
         rep(pd.cl_hi.x), rep(pd.cl_hi.y), rep(pd.cl_hi.z)], axis=1
    )  # (K+1, 16, C): 9 attrs + ids + 6 box floats = 16 rows exactly
    assert packed.shape[1] == _ATTR_ROWS
    if C % 128 != 0:
        Cp = -(-C // 128) * 128
        packed = jnp.concatenate(
            [packed, jnp.zeros((K1, _ATTR_ROWS, Cp - C), jnp.float32)],
            axis=2)
    return packed


def _slab_update(ts, tid, t128, id128):
    """Fold a (P, C) test block into the DEFERRED (P, 128) closest slabs.

    Round-4 restructuring: instead of reducing every slot's (P, C) tests
    to a (P, 1) closest hit (two cross-lane reductions + a broadcast
    compare PER SLOT — measured ~25% of the fold at C=256), each ray
    carries 128 PER-LANE-COLUMN running minima. Per 128-lane sub-block
    the update is a handful of cheap elementwise ops; the cross-lane
    reduction happens ONCE per tile (_slab_reduce) plus once per unroll
    group for the gate/early-exit row. Winner selection is exact-compare
    on identical f32 values, so the final (t, id) is bit-identical to
    the per-slot reduction's (same global min-t, lower-id tie-break —
    per-lane sequential ties keep the lower id, cross-lane ties resolve
    in _slab_reduce).

    The `better` predicate is the old fold's with its two redundant terms
    dropped: (ts < MAX_FLOAT) — a rejected candidate (ts == MAX_FLOAT)
    can't win the strict compare (t128 <= cap <= MAX_FLOAT) and its tie
    needs tid < id128 which only -1 columns fail — and (id128 >= 0) in
    the tie — real ids are >= 0 so tid < -1 is never true, which also
    keeps the cap semantics (a hit exactly AT the init cap, id128 == -1,
    must NOT update: it reports as miss). Masked lanes carry -3e38 and
    no candidate (>= 0 or MAX_FLOAT) beats or ties them."""
    C = ts.shape[1]
    for c0 in range(0, C, 128):
        ts_c = jax.lax.slice_in_dim(ts, c0, c0 + 128, axis=1)
        tid_c = jax.lax.slice_in_dim(tid, c0, c0 + 128, axis=1)
        better = (ts_c < t128) | ((ts_c == t128) & (tid_c < id128))
        t128 = jnp.where(better, ts_c, t128)
        id128 = jnp.where(better, tid_c, id128)
    return t128, id128


def _slab_reduce(t128, id128):
    """(P, 128) deferred slabs -> ((P, 1) t, (P, 1) id), the per-ray
    closest hit with the global lower-id tie-break. Runs once per tile."""
    t_best = jnp.min(t128, axis=1, keepdims=True)
    is_min = (t128 == t_best) & (id128 >= 0)
    id_best = jnp.min(
        jnp.where(is_min, id128, _TRI_SENTINEL), axis=1, keepdims=True
    )
    id_best = jnp.where(id_best >= _TRI_SENTINEL, -1, id_best)
    return t_best, id_best


def _slab_init(t_init, id_init):
    """Broadcast the (P, 1) fold init (per-ray search cap / masked
    sentinel, id -1) across the (P, 128) deferred slab columns. Every
    column starts at the cap, so candidates at/beyond it never update and
    the final _slab_reduce min is the cap when nothing beat it — exactly
    the old (P, 1) fold-init contract."""
    P = t_init.shape[0]
    return (jnp.broadcast_to(t_init, (P, 128)),
            jnp.broadcast_to(id_init, (P, 128)))


def _mt_fold_pc(cl, ox, oy, oz, dx, dy, dz, t128, id128, num_tris):
    """One resident cluster block (16, C) against one ray tile ((P, 1)
    columns) -> fold into the running DEFERRED closest slabs ((P, 128)
    f32/i32, see _slab_update)."""
    v0x = cl[0:1, :]
    v0y = cl[1:2, :]
    v0z = cl[2:3, :]
    e1x = cl[3:4, :]
    e1y = cl[4:5, :]
    e1z = cl[5:6, :]
    e2x = cl[6:7, :]
    e2y = cl[7:8, :]
    e2z = cl[8:9, :]
    tid = (cl[9:10, :] - _ID_OFFSET).astype(jnp.int32)

    # Moller-Trumbore (ops/intersect.ray_triangle semantics), (P, C) blocks
    qx = dy * e2z - dz * e2y
    qy = dz * e2x - dx * e2z
    qz = dx * e2y - dy * e2x
    a = e1x * qx + e1y * qy + e1z * qz
    parallel = jnp.abs(a) < EPS_PARALLEL
    # unguarded 1/a: when a == 0 the products go inf/NaN, but every such
    # lane has parallel == True, so reject forces ts = MAX_FLOAT and the
    # NaN never escapes a comparison (comparisons with NaN are False)
    inv_a = 1.0 / a
    sx = (ox - v0x) * inv_a
    sy = (oy - v0y) * inv_a
    sz = (oz - v0z) * inv_a
    rx = sy * e1z - sz * e1y
    ry = sz * e1x - sx * e1z
    rz = sx * e1y - sy * e1x
    b0 = sx * qx + sy * qy + sz * qz
    b1 = rx * dx + ry * dy + rz * dz
    b2 = 1.0 - b0 - b1
    t = e2x * rx + e2y * ry + e2z * rz
    # NOTE no (ts <= t_cap) term: the slab update makes it redundant
    # (candidates worse than the running column minima lose `better`;
    # equal-t candidates resolve by the same lower-id rule either way).
    # No (tid < num_tris) term either: every pad/sentinel triangle is
    # packed with all-zero vertices (make_packet_data zeroes them), so
    # a == 0 and the parallel test rejects it — the id range check was
    # redundant. t <= 0 folds the old (ts > 0) validity in.
    # min(b0,b1,b2) < 0 == (b0<0)|(b1<0)|(b2<0): two fewer VPU ops per
    # test (3 cmps + 2 ors -> 2 mins + 1 cmp). NaN-safe: parallel lanes'
    # NaNs propagate through min and compare False — exactly what the
    # per-term comparisons gave — and `parallel` covers them anyway.
    reject = parallel | (jnp.minimum(jnp.minimum(b0, b1), b2) < 0.0) \
        | (t <= 0.0)
    ts = jnp.where(reject, MAX_FLOAT, t)
    return _slab_update(ts, tid, t128, id128)


def pack_clusters_resident_bw(pd) -> jnp.ndarray:
    """PacketData -> (K+1, 16, C) f32 Baldwin-Weber precomputed blocks.

    Same layout contract as pack_clusters_resident but the 9 MT attribute
    rows become the BW rows: n.xyz (unnormalized e1 x e2), v0.xyz, and two
    barycentric row functionals m1 = (e2 x n)/|n|^2, m2 = (n x e1)/|n|^2.
    The fold evaluates everything relative to s = o - v0 (t = -(n.s)/(n.d),
    b_u = m1.(s + t d), b_v = m2.(s + t d)) — anchoring at v0 keeps the
    rounding profile of MT (a plane-offset form d_w = -(n.v0) measured
    4.5e-5 relative t error from cancellation; this form matches MT to
    ~2e-7). Row 12 carries ids (id + 2^23 exact floats). Degenerate /
    padding triangles (n = 0) reject via the parallel test
    |n . d| < EPS_PARALLEL, exactly like MT's |a| < eps (a = -(n . d) in
    exact arithmetic, modelLoader.h:56-60)."""
    from ..intersect import bw_precompute

    K1, C = pd.tri.shape
    ids_f = pd.tri.astype(jnp.float32) + _ID_OFFSET
    n, m1, m2 = bw_precompute(pd.e1, pd.e2)

    z = jnp.zeros_like(n.x)
    packed = jnp.stack(
        [n.x, n.y, n.z, pd.v0.x, pd.v0.y, pd.v0.z,
         m1.x, m1.y, m1.z, m2.x, m2.y, m2.z,
         ids_f, z, z, z], axis=1)  # (K+1, 16, C)
    assert packed.shape[1] == _ATTR_ROWS
    if C % 128 != 0:
        Cp = -(-C // 128) * 128
        packed = jnp.concatenate(
            [packed, jnp.zeros((K1, _ATTR_ROWS, Cp - C), jnp.float32)],
            axis=2)
    return packed


def _bw_fold_pc(cl, ox, oy, oz, dx, dy, dz, t128, id128, num_tris):
    """Baldwin-Weber fold: one (16, C) BW block against one ray tile.

    Decision-equivalent to _mt_fold_pc in exact arithmetic (the parallel
    predicate |n.d| < eps equals MT's |a| < eps since a = -(n.d); the
    barycentric signs and the 1-bu-bv >= 0 test match b0/b1/b2), ~20%
    fewer VPU ops: the per-triangle cross products moved to pack time."""
    nx = cl[0:1, :]
    ny = cl[1:2, :]
    nz = cl[2:3, :]
    v0x = cl[3:4, :]
    v0y = cl[4:5, :]
    v0z = cl[5:6, :]
    m1x = cl[6:7, :]
    m1y = cl[7:8, :]
    m1z = cl[8:9, :]
    m2x = cl[9:10, :]
    m2y = cl[10:11, :]
    m2z = cl[11:12, :]
    tid = (cl[12:13, :] - _ID_OFFSET).astype(jnp.int32)

    sx = ox - v0x
    sy = oy - v0y
    sz = oz - v0z
    nd = dx * nx + dy * ny + dz * nz
    parallel = jnp.abs(nd) < EPS_PARALLEL
    # unguarded 1/nd: parallel lanes reject regardless; NaNs never escape a
    # comparison (same pattern as the MT fold)
    inv = 1.0 / nd
    t = -(sx * nx + sy * ny + sz * nz) * inv
    wx = sx + t * dx
    wy = sy + t * dy
    wz = sz + t * dz
    bu = m1x * wx + m1y * wy + m1z * wz
    bv = m2x * wx + m2y * wy + m2z * wz
    bw = 1.0 - bu - bv
    # Same trimmed validity as _mt_fold_pc: pad/sentinel triangles are
    # all-zero -> n = 0 -> parallel reject covers (tid < num_tris), and
    # (t <= 0.0) folds the old (ts > 0) check into the one select.
    # min-of-barycentrics reject: see _mt_fold_pc (2 fewer ops, NaN-safe).
    reject = (parallel | (jnp.minimum(jnp.minimum(bu, bv), bw) < 0.0)
              | (t <= 0.0))
    ts = jnp.where(reject, MAX_FLOAT, t)
    return _slab_update(ts, tid, t128, id128)


def _vis_drop(t, lo):
    """Occluded-lane dropout for VISIBILITY queries (BDPT shadow rays).

    The caller's decision is ``|t_closest - len| <= eps`` (kernel.cu:402-405).
    A running best strictly below the band floor ``lo <= len - eps`` proves
    the closest hit lies below it too (min only decreases), i.e. the lane
    is OCCLUDED no matter what the remaining candidates hold. With the
    deferred slabs this fires at the two lane-reduction points instead of
    per slot: (a) on the gate/early-exit row once per unroll group —
    dropping t_row to the masked sentinel retires the lane from the box
    gates (tmin <= -3e38 never passes) and stops it holding the tile's
    early exit open; (b) on the final _slab_reduce output — so the tile
    reports the sentinel whenever the closest hit is below the floor,
    which packets._finish normalizes to the vis-mode occluded report
    (t = -1.0, decision-equivalent for any len >= 0 since |-1 - len| > eps
    always). Decision-identical to the retired per-slot _vis_fold wrapper:
    both report the sentinel exactly for {lanes whose closest hit < lo}."""
    return jnp.where(t < lo, _MASKED_T_INIT, t)


def _box_hit_row(box6, oxr, oyr, ozr, idx, idy, idz, t_row):
    """Does each ray enter this cluster's AABB within its current
    [0, t_best] interval? ROW layout: rays along LANES ((1, P) slices of
    the incoming (8, P) tile), box bounds as 6 SMEM SCALARS — ~25 ops on
    (1, P) blocks is 2 vregs per op at P=256, 16x cheaper than the same
    math on (P, 1) columns. Masked lanes carry t_row = -3e38 and never
    pass. Conservative vs the fold's tie-break contract: a hit with
    t == t_best has box entry tmin <= t <= t_best (non-strict compare)."""
    blox, bloy, bloz, bhix, bhiy, bhiz = box6
    tx0 = (blox - oxr) * idx
    tx1 = (bhix - oxr) * idx
    ty0 = (bloy - oyr) * idy
    ty1 = (bhiy - oyr) * idy
    tz0 = (bloz - ozr) * idz
    tz1 = (bhiz - ozr) * idz
    tmin = jnp.maximum(
        jnp.maximum(jnp.minimum(tx0, tx1), jnp.minimum(ty0, ty1)),
        jnp.minimum(tz0, tz1),
    )
    tmax = jnp.minimum(
        jnp.minimum(jnp.maximum(tx0, tx1), jnp.maximum(ty0, ty1)),
        jnp.maximum(tz0, tz1),
    )
    return (tmin <= tmax) & (tmax >= 0.0) & (tmin <= t_row)  # (1, P)


# slots folded per while iteration: amortizes the scalar sync (jnp.max ->
# while cond, ~0.7 us) and the box-gate branches. Chosen per call: small
# budgets (straggler round 1) fold exactly their 2 slots; full-shortlist
# rounds unroll 4 (measured: unroll 4 on a budget-2 round cost +50%).


def _make_kernel(unroll, fold=None, fast=2, vis_band=0.0, ray_groups=1,
                 warm=0, debug_folds=False, fold_loop=False):
    """``ray_groups`` (round 5): gate and fold the tile's rays in NS
    independent SUBGROUPS of P/NS consecutive (sorted) rays. Today's
    any-lane OR means ONE passing ray drags all P through the (P, C)
    fold; with subgroups, each (P/NS, C) sub-fold runs only when one of
    ITS rays passes the box gate. Total VPU issue count of a full fold is
    unchanged (NS folds of P/NS rays = same vregs), so skipped subgroups
    are pure savings; the costs are NS x the lax.cond branches per slot
    and NS x the gate bitmask rows. Gate bits: unroll*NS member bits + 1
    exit bit must stay f32-exact (< 2^24). NS=1 reproduces the round-4
    kernel exactly."""
    fold = fold or _mt_fold_pc
    NS = int(ray_groups)
    assert unroll * NS + 1 <= 24, (unroll, NS)

    def _kernel(meta_ref, boxes_ref, rays_ref, cl_ref, slid_hbm, slent_hbm,
                out_ref, slid, slent, sl_sem):
        i = pl.program_id(0)
        num_tris = meta_ref[0]
        P = rays_ref.shape[2]
        Ps = P // NS
        assert P % (NS * 8) == 0, (P, NS)  # sublane-aligned subgroups
        G = _TILE_GROUP
        W = slid.shape[1]

        d1 = pltpu.make_async_copy(
            slid_hbm.at[pl.ds(i * G, G)], slid, sl_sem.at[0])
        d2 = pltpu.make_async_copy(
            slent_hbm.at[pl.ds(i * G, G)], slent, sl_sem.at[1])
        d1.start()
        d2.start()
        d1.wait()
        d2.wait()

        def one_tile(g, _):
            cnt = slid[g, 0]
            # rays arrive (8, P) — lane-dim P so the HBM array is unpadded
            # ((Tl, P, 8) would be lane-padded 16x by the (8,128) tiling, which
            # at 2048^2 alone exceeded HBM); one small transpose per tile gives
            # the (P, 1) columns the FOLD wants. The GATE works on the (1, P)
            # rows directly — no transpose and 2 vregs per op.
            row = rays_ref[pl.ds(g, 1)].reshape(8, P)     # (8, P)
            tile = jnp.transpose(row)                     # (P, 8)
            ox = tile[:, 0:1]
            oy = tile[:, 1:2]
            oz = tile[:, 2:3]
            dx = tile[:, 3:4]
            dy = tile[:, 4:5]
            dz = tile[:, 5:6]
            lane_on = tile[:, 6:7] > 0.5
            # row 7: per-ray search cap (scene-exit distance, ops/packets.py)
            # as the fold INIT — miss rays stop the early exit at their exit
            # point instead of holding MAX_FLOAT open for the whole shortlist
            t_init = jnp.where(lane_on,
                               jnp.minimum(MAX_FLOAT, tile[:, 7:8]),
                               _MASKED_T_INIT)
            id_init = jnp.full((P, 1), -1, jnp.int32)
            # visibility mode: band floor = per-ray cap (row 7) − band.
            # row 7 is min(scene exit, caller cap), so the floor is <= the
            # true len − eps — dropping only when strictly below it is
            # conservative-exact (see _vis_drop).
            lo_col = tile[:, 7:8] - vis_band

            def sub(col, j):
                # subgroup j's (Ps, 1) sublane slice of a (P, 1) column
                return col if NS == 1 else col[j * Ps:(j + 1) * Ps]

            if NS > 1:
                # (1, P) lane masks selecting each subgroup's rays in the
                # gate ROW layout (constant; folded at compile time)
                lane_ids = jax.lax.broadcasted_iota(jnp.int32, (1, P), 1)
                sg_masks = [lane_ids // Ps == j for j in range(NS)]

            def cond(carry):
                return jnp.logical_not(carry[1])

            def make_body(unroll, oxr, oyr, ozr, idxr, idyr, idzr):
                def body(carry):
                    if debug_folds:
                        s, done, slabs, nf = carry
                    else:
                        s, done, slabs = carry
                    # Phase 1 — gate ALL unroll slots against the group-start
                    # t_best (it only shrinks, so this is conservative) and
                    # pack the per-slot any-live-lane verdicts into ONE
                    # scalar bitmask. The EARLY-EXIT verdict rides the same
                    # bitmask as bit `unroll` (one sync per iteration, not
                    # two): exit when NO lane's best t reaches this group's
                    # first entry — entries ascend, so every later slot's
                    # per-ray box test (tmin >= entry > t_best) fails too.
                    # Identical exit timing to the old end-of-iteration
                    # `t_max < next_entry` check, evaluated one group
                    # boundary later. Each bool row converts to an f32
                    # weight BEFORE the concat: Mosaic cannot relayout
                    # concatenated i1 vregs ("Invalid vector register cast").
                    #
                    # MEASURED AND REJECTED (r3): gating/folding per 128-lane
                    # SUB-BLOCK (bit u*S+h, per-block AABBs from the member
                    # tris, (P, 128) folds inside per-block lax.conds) —
                    # 58.7 vs 53.2 ms/trace at 20k tris (C=256) and 178 vs
                    # 103 ms at 328k (C=1024): the extra branches and the
                    # narrower folds cost more than the skipped work saves,
                    # at every scale tried.
                    #
                    # The per-ray running best is DEFERRED across slab
                    # columns (see _slab_update): one cross-lane min per
                    # group recovers it for the gate/exit row. With
                    # ray_groups > 1 the running slabs live per SUBGROUP;
                    # their (Ps, 1) mins concat (sublane-aligned) into the
                    # full (P, 1) column for the row-layout gate.
                    t_cols = [jnp.min(t128, axis=1, keepdims=True)
                              for (t128, _) in slabs]
                    t_col = (jnp.concatenate(t_cols, axis=0)
                             if NS > 1 else t_cols[0])
                    if vis_band > 0.0:
                        t_col = _vis_drop(t_col, lo_col)
                    t_row = jnp.transpose(t_col)           # (1, P)
                    sids = []
                    wts = []
                    for u in range(unroll):
                        su = s + u
                        sid = slid[g, jnp.minimum(1 + su, W - 1)]
                        sids.append(sid)
                        ok_u = su < cnt                    # scalar bool
                        box6 = tuple(
                            boxes_ref[sid >> 4, ((sid & 15) << 3) + j]
                            for j in range(6))  # 16 boxes per SMEM row
                        hit = _box_hit_row(
                            box6, oxr, oyr, ozr, idxr, idyr, idzr, t_row)
                        if NS == 1:
                            wts.append(jnp.where(
                                hit & ok_u, jnp.float32(1 << u), 0.0))
                        else:
                            hm = hit & ok_u
                            for j in range(NS):
                                wts.append(jnp.where(
                                    hm & sg_masks[j],
                                    jnp.float32(1 << (u * NS + j)), 0.0))
                    # >= (non-strict): a best hit EQUAL to the next entry
                    # must keep searching (lower-index tie-break contract)
                    entry_s0 = slent[g, jnp.minimum(s, W - 1)]
                    wts.append(jnp.where(t_row >= entry_s0,
                                         jnp.float32(1 << (unroll * NS)),
                                         0.0))
                    wt = jnp.concatenate(wts, axis=0)  # (unroll*NS+1, P)
                    bits = jnp.sum(
                        jnp.max(wt, axis=1, keepdims=True)
                    ).astype(jnp.int32)                    # scalar sync

                    # Phase 2 — fold only the (slot, subgroup) pairs whose
                    # bit survived; the (16, C) VMEM slice happens INSIDE
                    # the branch, so a gated-out slot reads nothing.
                    if fold_loop:
                        # LOOPED fold (round 5): one fold body iterated by
                        # a fori_loop with a dynamic bit test, instead of
                        # `unroll` inlined fold bodies. Mosaic degrades
                        # nonlinearly with while-body code mass at large C
                        # (u23 inlined measured 173 ms vs u8's 65 at 328k)
                        # — the loop keeps the body one fold wide at any
                        # unroll, trading scalar loop overhead per slot.
                        def p2_body(u, slabs_):
                            sid = slid[g, jnp.minimum(1 + s + u, W - 1)]
                            out = []
                            for j in range(NS):
                                tj, ij = slabs_[j]

                                def do_fold(tb, ib, j=j, sid=sid):
                                    cl = cl_ref[sid]
                                    return fold(
                                        cl, sub(ox, j), sub(oy, j),
                                        sub(oz, j), sub(dx, j), sub(dy, j),
                                        sub(dz, j), tb, ib, num_tris)

                                out.append(jax.lax.cond(
                                    ((bits >> (u * NS + j)) & 1) != 0,
                                    do_fold,
                                    lambda tb, ib: (tb, ib),
                                    tj, ij,
                                ))
                            return tuple(out)

                        new_slabs = list(jax.lax.fori_loop(
                            0, unroll, p2_body, tuple(slabs)))
                    else:
                        new_slabs = list(slabs)
                        for u in range(unroll):
                            sid = sids[u]
                            for j in range(NS):
                                tj, ij = new_slabs[j]

                                def do_fold(tb, ib, sid=sid, j=j):
                                    cl = cl_ref[sid]  # (16, C) VMEM slice
                                    return fold(
                                        cl, sub(ox, j), sub(oy, j),
                                        sub(oz, j), sub(dx, j), sub(dy, j),
                                        sub(dz, j), tb, ib, num_tris)

                                new_slabs[j] = jax.lax.cond(
                                    (bits & (1 << (u * NS + j))) != 0,
                                    do_fold,
                                    lambda tb, ib: (tb, ib),
                                    tj, ij,
                                )
                    nxt = s + unroll
                    exhausted = nxt >= cnt
                    no_open = (bits >> (unroll * NS)) == 0
                    if debug_folds:
                        dnf = jnp.int32(0)
                        for b in range(unroll * NS):
                            dnf = dnf + ((bits >> b) & 1)
                        nf = nf + dnf
                        return (nxt, exhausted | no_open, tuple(new_slabs),
                                nf)
                    return (nxt, exhausted | no_open, tuple(new_slabs))
                return body

            # COUNT LADDER (r3): half the entry-sorted tiles carry <= 1
            # candidate (measured p50 = 1 at both 20k and 328k tris), yet
            # the while-loop path charges them a full vector->scalar
            # bitmask sync (~0.7 us) + `unroll` box gates + lax.conds.
            # Tiles with cnt <= `fast` instead fold EXACTLY their cnt
            # slots unconditionally — no gates, no sync, no early exit
            # (folding <= `fast` slots outright is cheaper than one sync).
            # cnt == 0 tiles (straggler-compacted dead tiles; the cull
            # forces cnt = 0 whenever every lane is masked) fall out of
            # the same switch as branch 0, which also retires the old
            # per-tile jnp.max(t_init) all-dead probe — itself a
            # vector->scalar sync paid by EVERY tile.
            def make_fast(n):
                def fast_tile(t0, i0):
                    # NS > 1 folds per subgroup slab — same total vregs as
                    # one full-P fold (work is identical, just split), so
                    # the ungated fast path costs the same at any NS
                    tbs = [_slab_init(sub(t0, j), sub(i0, j))
                           for j in range(NS)]
                    for u in range(n):
                        sid = slid[g, jnp.minimum(1 + u, W - 1)]
                        cl = cl_ref[sid]       # (16, C), VMEM slice
                        tbs = [fold(cl, sub(ox, j), sub(oy, j), sub(oz, j),
                                    sub(dx, j), sub(dy, j), sub(dz, j),
                                    tb, ib, num_tris)
                               for j, (tb, ib) in enumerate(tbs)]
                    outs = [_slab_reduce(tb, ib) for (tb, ib) in tbs]
                    t_b = (outs[0][0] if NS == 1 else
                           jnp.concatenate([o[0] for o in outs], axis=0))
                    i_b = (outs[0][1] if NS == 1 else
                           jnp.concatenate([o[1] for o in outs], axis=0))
                    if debug_folds:
                        return t_b, i_b, jnp.int32(n * NS)
                    return t_b, i_b
                return fast_tile

            def loop_tile(t0, i0):
                # gate precompute lives here so fast-path tiles never pay
                # for it. Guarded reciprocals: a zero direction component
                # would make the slab test produce 0*inf = NaN, whose
                # comparisons are False — the gate would then
                # UNconservatively skip a plausible cluster.
                def _inv(d_):
                    return 1.0 / jnp.where(
                        jnp.abs(d_) < 1e-30,
                        jnp.where(d_ < 0, -1e-30, 1e-30), d_)

                body = make_body(unroll, row[0:1, :], row[1:2, :],
                                 row[2:3, :], _inv(row[3:4, :]),
                                 _inv(row[4:5, :]), _inv(row[5:6, :]))
                slabs0 = tuple(_slab_init(sub(t0, j), sub(i0, j))
                               for j in range(NS))
                # WARM START (round 5, measured): the while body gates a
                # whole unroll group against the t at GROUP start — for
                # the FIRST group that is the init cap (scene exit), which
                # passes nearly everything: the kernel folded ~2-3x the
                # slots a fresh-t gate model predicts (tools/
                # prof_gategrain.py vs the measured fold budget). Folding
                # the first `warm` entry-sorted slots UNGATED (they are
                # the nearest candidates — p50 of the per-tile shortlist
                # is 1 and most rays resolve within the first couple) and
                # entering the loop at s=warm gives every gated group a
                # hit-informed t. Exactness: ungated folds are always
                # sound (a fold can only improve a lane's best), and the
                # loop-path guarantee cnt > fast >= warm means the warm
                # slots all exist.
                for u in range(min(warm, fast)):
                    sid = slid[g, jnp.minimum(1 + u, W - 1)]
                    cl = cl_ref[sid]
                    slabs0 = tuple(
                        fold(cl, sub(ox, j), sub(oy, j), sub(oz, j),
                             sub(dx, j), sub(dy, j), sub(dz, j),
                             tb, ib, num_tris)
                        for j, (tb, ib) in enumerate(slabs0))
                if debug_folds:
                    init = (jnp.int32(min(warm, fast)), cnt == 0, slabs0,
                            jnp.int32(min(warm, fast) * NS))
                    _, _, slabs, nf = jax.lax.while_loop(cond, body, init)
                else:
                    init = (jnp.int32(min(warm, fast)), cnt == 0, slabs0)
                    _, _, slabs = jax.lax.while_loop(cond, body, init)
                outs = [_slab_reduce(tb, ib) for (tb, ib) in slabs]
                t_b = (outs[0][0] if NS == 1 else
                       jnp.concatenate([o[0] for o in outs], axis=0))
                i_b = (outs[0][1] if NS == 1 else
                       jnp.concatenate([o[1] for o in outs], axis=0))
                if debug_folds:
                    return t_b, i_b, nf
                return t_b, i_b

            if debug_folds:
                branches = [lambda t0, i0: (t0, i0, jnp.int32(0))]
            else:
                branches = [lambda t0, i0: (t0, i0)]      # cnt == 0
            for n in range(1, fast + 1):
                branches.append(make_fast(n))
            branches.append(loop_tile)                    # cnt > fast
            sw = jax.lax.switch(
                jnp.minimum(cnt, fast + 1), branches, t_init, id_init)
            t_best, id_best = sw[0], sw[1]
            if vis_band > 0.0:
                # final occluded-lane normalization (see _vis_drop): the
                # fast/ladder tiles never run a gate, so this is the one
                # point their below-floor closest becomes the sentinel
                t_best = _vis_drop(t_best, lo_col)
            if debug_folds:
                # debug: report SUB-fold count (units of one (P/NS, C)
                # fold) in place of t — outputs are for instrumentation
                t_best = jnp.full_like(t_best, sw[2].astype(jnp.float32))

            out = jnp.concatenate(
                [t_best, id_best.astype(jnp.float32) + _ID_OFFSET], axis=1
            )  # (P, 2); id == -1 -> 2^23 - 1, still exact
            # store transposed (2, P): lane-dim P keeps the output unpadded
            out_ref[pl.ds(g, 1)] = jnp.transpose(out).reshape(1, 2, P)
            return 0

        jax.lax.fori_loop(0, G, one_tile, 0)

    return _kernel


def _make_kernel_super(F, groups, fold=None, fast=2, vis_band=0.0):
    """Super-shortlist variant (round 4): shortlist slots are SUPERCLUSTERS
    (F preorder-consecutive clusters), and the kernel expands each super to
    its F member clusters gated by the per-member SMEM box test.

    Why: the round-3 two-level cull expanded supers to members on the XLA
    side under a fixed slot cap, and a dropped close candidate collapsed
    the tile's U bound — whole tiles fell into the per-ray fallback
    (measured 53 s/trace at 328k tris with C=256, renderer.py r3 NOTE).
    Here NO member is ever dropped: the shortlist holds every hit super
    (up to the SMEM row width), members are culled per-RAY by the same
    scalar box gates the cluster kernel already pays, and the U bound only
    ever comes from genuinely distant dropped supers. The XLA-side
    shortlist shrinks by F (cull (Tl, S) instead of (Tl, K), top_k over S)
    — that is what lets SMALL clusters (C=256) survive at sponza scale.

    Bitmask layout per while iteration: ``groups`` supers x F member bits
    + 1 early-exit bit ride ONE f32 vector->scalar sync (groups*F + 1 must
    stay < 24 for f32-exact bit weights). Early exit compares against the
    group's first SUPER entry — a super's box contains its members', so
    its entry lower-bounds theirs and the exit argument of the cluster
    kernel carries over unchanged.

    FEATURE BOUNDARY (r5, deliberate): the round-5 cluster-kernel levers
    (ray_groups subgroup gating, warm_start, debug_folds) are NOT ported
    here — this kernel's member gates are already per-ray and its bit
    budget is consumed by groups*F member bits, and since the r4/r5 flat-
    cull heuristic (flat up to K<=2048, adaptive C >= 512 at sponza scale)
    no bench path reaches super mode; it remains the tested correctness
    path for huge small-C scenes (tests/test_packets.py::
    test_super_shortlist_exact). Port the levers before promoting it to a
    hot path.
    """
    fold = fold or _mt_fold_pc
    assert groups * F + 1 <= 24, (groups, F)
    # fast branches gate `fast` whole supers in one sync (no exit bit):
    # their bit weights must also stay f32-exact (< 2^24) and int32-safe
    assert fast * F <= 24, (fast, F)

    def _kernel(meta_ref, boxes_ref, rays_ref, cl_ref, slid_hbm, slent_hbm,
                out_ref, slid, slent, sl_sem):
        i = pl.program_id(0)
        num_tris = meta_ref[0]
        K = meta_ref[1]
        P = rays_ref.shape[2]
        G = _TILE_GROUP
        W = slid.shape[1]

        d1 = pltpu.make_async_copy(
            slid_hbm.at[pl.ds(i * G, G)], slid, sl_sem.at[0])
        d2 = pltpu.make_async_copy(
            slent_hbm.at[pl.ds(i * G, G)], slent, sl_sem.at[1])
        d1.start()
        d2.start()
        d1.wait()
        d2.wait()

        def one_tile(g, _):
            cnt = slid[g, 0]
            row = rays_ref[pl.ds(g, 1)].reshape(8, P)     # (8, P)
            tile = jnp.transpose(row)                     # (P, 8)
            ox = tile[:, 0:1]
            oy = tile[:, 1:2]
            oz = tile[:, 2:3]
            dx = tile[:, 3:4]
            dy = tile[:, 4:5]
            dz = tile[:, 5:6]
            lane_on = tile[:, 6:7] > 0.5
            t_init = jnp.where(lane_on,
                               jnp.minimum(MAX_FLOAT, tile[:, 7:8]),
                               _MASKED_T_INIT)
            id_init = jnp.full((P, 1), -1, jnp.int32)
            lo_col = tile[:, 7:8] - vis_band   # vis floor (see _vis_drop)

            def _inv(d_):
                return 1.0 / jnp.where(
                    jnp.abs(d_) < 1e-30,
                    jnp.where(d_ < 0, -1e-30, 1e-30), d_)

            oxr = row[0:1, :]
            oyr = row[1:2, :]
            ozr = row[2:3, :]
            idxr = _inv(row[3:4, :])
            idyr = _inv(row[4:5, :])
            idzr = _inv(row[5:6, :])

            def gate_members(s, n_sup, t_row, with_exit):
                """Gate n_sup supers' members; -> (member sids, bits)."""
                sids = []
                wts = []
                for u in range(n_sup):
                    su = s + u
                    sup = slid[g, jnp.minimum(1 + su, W - 1)]
                    ok_u = su < cnt                        # scalar bool
                    for j in range(F):
                        # clamp into the sentinel row: far box never gates
                        # in, degenerate sentinel cluster never folds a hit
                        sid = jnp.minimum(sup * F + j, K)
                        sids.append(sid)
                        box6 = tuple(
                            boxes_ref[sid >> 4, ((sid & 15) << 3) + jj]
                            for jj in range(6))  # 16 boxes per SMEM row
                        hit = _box_hit_row(
                            box6, oxr, oyr, ozr, idxr, idyr, idzr, t_row)
                        wts.append(jnp.where(
                            hit & ok_u, jnp.float32(1 << (u * F + j)), 0.0))
                if with_exit:
                    entry_s0 = slent[g, jnp.minimum(s, W - 1)]
                    wts.append(jnp.where(t_row >= entry_s0,
                                         jnp.float32(1 << (n_sup * F)), 0.0))
                wt = jnp.concatenate(wts, axis=0)
                bits = jnp.sum(
                    jnp.max(wt, axis=1, keepdims=True)
                ).astype(jnp.int32)                        # scalar sync
                return sids, bits

            def fold_gated(sids, bits, t128, id128):
                for m, sid in enumerate(sids):
                    def do_fold(tb, ib, sid=sid):
                        cl = cl_ref[sid]            # (16, C), VMEM slice
                        return fold(
                            cl, ox, oy, oz, dx, dy, dz, tb, ib, num_tris)

                    t128, id128 = jax.lax.cond(
                        (bits & (1 << m)) != 0,
                        do_fold,
                        lambda tb, ib: (tb, ib),
                        t128, id128,
                    )
                return t128, id128

            def cond(carry):
                s, done, t128, id128 = carry
                return jnp.logical_not(done)

            def body(carry):
                s, done, t128, id128 = carry
                t_col = jnp.min(t128, axis=1, keepdims=True)
                if vis_band > 0.0:
                    t_col = _vis_drop(t_col, lo_col)
                t_row = jnp.transpose(t_col)               # (1, P)
                sids, bits = gate_members(s, groups, t_row, with_exit=True)
                t128, id128 = fold_gated(sids, bits, t128, id128)
                nxt = s + groups
                exhausted = nxt >= cnt
                no_open = (bits >> (groups * F)) == 0
                return (nxt, exhausted | no_open, t128, id128)

            # count ladder: tiles with cnt <= `fast` supers pay exactly one
            # gate sync and their conditional folds — no while loop, no
            # exit bit. (Unlike the cluster kernel's fast path, members ARE
            # gated: folding F ungated members would cost F/≈ 2-3x the
            # gated work for the median tile.)
            def make_fast(n):
                def fast_tile(t0, i0):
                    # the init slabs are all-equal so their min IS t0 —
                    # gate straight off the (P, 1) init, no reduce needed
                    t_row = jnp.transpose(t0)
                    sids, bits = gate_members(0, n, t_row, with_exit=False)
                    tb, ib = fold_gated(sids, bits, *_slab_init(t0, i0))
                    return _slab_reduce(tb, ib)
                return fast_tile

            def loop_tile(t0, i0):
                t128, id128 = _slab_init(t0, i0)
                init = (jnp.int32(0), cnt == 0, t128, id128)
                _, _, tb, ib = jax.lax.while_loop(cond, body, init)
                return _slab_reduce(tb, ib)

            branches = [lambda t0, i0: (t0, i0)]          # cnt == 0
            for n in range(1, fast + 1):
                branches.append(make_fast(n))
            branches.append(loop_tile)                    # cnt > fast
            t_best, id_best = jax.lax.switch(
                jnp.minimum(cnt, fast + 1), branches, t_init, id_init)
            if vis_band > 0.0:
                t_best = _vis_drop(t_best, lo_col)   # final normalization

            out = jnp.concatenate(
                [t_best, id_best.astype(jnp.float32) + _ID_OFFSET], axis=1
            )  # (P, 2)
            out_ref[pl.ds(g, 1)] = jnp.transpose(out).reshape(1, 2, P)
            return 0

        jax.lax.fori_loop(0, G, one_tile, 0)

    return _kernel


@functools.partial(jax.jit,
                   static_argnames=("interpret", "super_factor", "groups",
                                    "bw", "fast", "vis_band"))
def dense_intersect_resident_super(ids, counts, entries, rays, cl_packed,
                                   boxes, num_tris, super_factor: int,
                                   interpret: bool = False,
                                   groups: int | None = None,
                                   bw: bool = False, fast: int | None = None,
                                   vis_band: float = 0.0):
    """VMEM-resident dense intersection over SUPER shortlists.

    ids/counts/entries: per-tile shortlists in SUPERCLUSTER units — ids are
    super indices (cluster ids sup*F .. sup*F+F-1), entries the supers'
    conservative entry distances, ascending. cl_packed/boxes/rays exactly
    as dense_intersect_resident (member boxes + blocks are the SAME arrays
    the cluster kernel uses; only the shortlist granularity changes).
    """
    Tl, M = ids.shape
    F = int(super_factor)
    if fast is None:
        fast = int(os.environ.get("PT_KERNEL_FAST_SUPER", "2"))
    fast = max(1, min(int(fast), 24 // F))  # fast*F gate bits, f32-exact
    if groups is None:
        # groups*F member gates + 1 exit bit per sync; F=8 -> 2 supers per
        # sync matches the cluster kernel's unroll=8 + count-ladder rates
        groups = max(1, min(2, 23 // F))
    P = rays.shape[2]
    G = _TILE_GROUP
    W = -(-(M + 1) // 128) * 128
    K = cl_packed.shape[0] - 1
    meta = jnp.stack([jnp.asarray(num_tris, jnp.int32),
                      jnp.asarray(K, jnp.int32)])

    slid = jnp.concatenate(
        [counts.reshape(Tl, 1).astype(jnp.int32), ids.astype(jnp.int32),
         jnp.zeros((Tl, W - 1 - M), jnp.int32)], axis=1)
    slent = jnp.concatenate(
        [entries.astype(jnp.float32),
         jnp.full((Tl, W - M), jnp.inf, jnp.float32)], axis=1)

    NR = rays.shape[1]
    Tp = -(-Tl // G) * G
    if Tp != Tl:
        slid = jnp.concatenate(
            [slid, jnp.zeros((Tp - Tl, W), jnp.int32)], axis=0)
        slent = jnp.concatenate(
            [slent, jnp.full((Tp - Tl, W), jnp.inf, jnp.float32)], axis=0)
        rays = jnp.concatenate(
            [rays, jnp.zeros((Tp - Tl, NR, P), rays.dtype)], axis=0)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(Tp // G,),
        in_specs=[
            pl.BlockSpec((G, NR, P), lambda i, *_: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),  # resident scene
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=pl.BlockSpec((G, 2, P), lambda i, *_: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.SMEM((G, W), jnp.int32),
            pltpu.SMEM((G, W), jnp.float32),
            pltpu.SemaphoreType.DMA((2,)),
        ],
    )
    blk = 4
    for s in cl_packed.shape:
        blk *= int(s)
    vmem_limit = min(_VMEM_CEILING, blk + _VMEM_HEADROOM)
    out = pl.pallas_call(
        _make_kernel_super(F, groups, _bw_fold_pc if bw else _mt_fold_pc,
                           fast=fast, vis_band=float(vis_band)),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((Tp, 2, P), jnp.float32),
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=vmem_limit),
        interpret=interpret,
    )(meta, boxes, rays, cl_packed, slid, slent)
    t = out[:Tl, 0, :]
    tri = (out[:Tl, 1, :] - _ID_OFFSET).astype(jnp.int32)
    return t, tri


@functools.partial(jax.jit,
                   static_argnames=("interpret", "unroll", "bw", "fast",
                                    "vis_band", "ray_groups", "warm_start",
                                    "debug_folds", "fold_loop"))
def dense_intersect_resident(ids, counts, entries, rays, cl_packed, boxes,
                             num_tris, interpret: bool = False,
                             unroll: int | None = None, bw: bool = False,
                             fast: int | None = None,
                             vis_band: float = 0.0,
                             ray_groups: int | None = None,
                             warm_start: int | None = None,
                             debug_folds: bool = False,
                             fold_loop: bool | None = None):
    """VMEM-resident dense intersection.

    ids/counts/entries: as in dense.dense_intersect.
    rays:      (Tl, 8, P) f32 — rows o.xyz / d.xyz / lane-mask / exit-cap
               (lane-dim P: an unpadded HBM layout — see the kernel note)
    cl_packed: (K+1, 16, C) f32 from pack_clusters_resident (fits VMEM!);
               with ``bw=True``, from pack_clusters_resident_bw (the
               Baldwin-Weber precomputed layout + _bw_fold_pc fold)
    boxes:     (K+1, 8) f32 from pack_cluster_boxes (SMEM, scalar gates)

    Returns (t (Tl, P) f32, tri (Tl, P) i32).
    """
    Tl, M = ids.shape
    if fast is None:
        # count-ladder width (slots folded sync-free for low-count tiles);
        # env knob for TPU sweeps (resolved at trace time, so set it
        # before the first call in a fresh process). Measured at 20k tris
        # (kernel-alone ms): fast 1/2/4 = 33.2/33.3/32.9 vs 37.6 without
        # the ladder (the bulk of that is the retired per-tile all-dead
        # sync + the fold trims; the ladder width itself is marginal).
        fast = int(os.environ.get("PT_KERNEL_FAST", "4"))
    P = rays.shape[2]
    C = cl_packed.shape[2]
    if ray_groups is None:
        # round-5 default: gate/fold rays in 2 subgroups of P/2 — measured
        # -10/-16% kernel time at 328k/20k tris vs NS=1 (one passing ray
        # no longer drags the whole tile through the fold); NS=4 measured
        # slightly worse at both scales (branch overhead).
        ray_groups = int(os.environ.get("PT_KERNEL_RAYGROUPS", "2"))
    # subgroups need sublane-aligned (P/NS) slices and f32-exact gate bits
    while ray_groups > 1 and P % (ray_groups * 8) != 0:
        ray_groups //= 2
    if warm_start is None:
        # round-5 measured: warm-start helps at C<=256 (24.5 vs 27.2 ms at
        # 20k tris) but REGRESSES at C=1024 (65 -> 130 ms at 328k — a
        # Mosaic scheduling pathology with large-C pre-loop folds, fold
        # counts unchanged), so the default keys on the fold width.
        env = os.environ.get("PT_KERNEL_WARM")
        warm_start = int(env) if env is not None else (2 if C <= 256 else 0)
    if unroll is None:
        # r3 sweep: u8 == u4 at 20k tris and 4% faster at 328k; with
        # NS=2 the bit budget allows u11, measured best at both scales
        # (22.9 ms at 20k, 58.6 at 328k). Env knob for TPU sweeps.
        env = os.environ.get("PT_KERNEL_UNROLL")
        if M <= 4:
            unroll = 2
        elif env is not None:
            unroll = int(env)
        else:
            unroll = 23 // ray_groups if ray_groups > 1 else 8
    unroll = max(1, min(unroll, 23 // ray_groups))
    if fold_loop is None:
        fold_loop = os.environ.get("PT_KERNEL_FOLDLOOP", "0") != "0"
    G = _TILE_GROUP
    W = -(-(M + 1) // 128) * 128  # lane-aligned row width
    K = cl_packed.shape[0] - 1
    meta = jnp.stack([jnp.asarray(num_tris, jnp.int32),
                      jnp.asarray(K, jnp.int32)])

    slid = jnp.concatenate(
        [counts.reshape(Tl, 1).astype(jnp.int32), ids.astype(jnp.int32),
         jnp.zeros((Tl, W - 1 - M), jnp.int32)], axis=1)
    slent = jnp.concatenate(
        [entries.astype(jnp.float32),
         jnp.full((Tl, W - M), jnp.inf, jnp.float32)], axis=1)

    NR = rays.shape[1]
    Tp = -(-Tl // G) * G
    if Tp != Tl:
        slid = jnp.concatenate(
            [slid, jnp.zeros((Tp - Tl, W), jnp.int32)], axis=0)
        slent = jnp.concatenate(
            [slent, jnp.full((Tp - Tl, W), jnp.inf, jnp.float32)], axis=0)
        rays = jnp.concatenate(
            [rays, jnp.zeros((Tp - Tl, NR, P), rays.dtype)], axis=0)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,   # meta + cluster boxes (both SMEM)
        grid=(Tp // G,),
        in_specs=[
            pl.BlockSpec((G, NR, P), lambda i, *_: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),  # resident scene
            pl.BlockSpec(memory_space=pl.ANY),   # shortlist ids
            pl.BlockSpec(memory_space=pl.ANY),   # shortlist entries
        ],
        out_specs=pl.BlockSpec((G, 2, P), lambda i, *_: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.SMEM((G, W), jnp.int32),
            pltpu.SMEM((G, W), jnp.float32),
            pltpu.SemaphoreType.DMA((2,)),
        ],
    )
    blk = 4
    for s in cl_packed.shape:
        blk *= int(s)
    vmem_limit = min(_VMEM_CEILING, blk + _VMEM_HEADROOM)
    out = pl.pallas_call(
        _make_kernel(unroll, _bw_fold_pc if bw else _mt_fold_pc, fast=fast,
                     vis_band=float(vis_band), ray_groups=ray_groups,
                     warm=warm_start, debug_folds=debug_folds,
                     fold_loop=bool(fold_loop)),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((Tp, 2, P), jnp.float32),
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=vmem_limit),
        interpret=interpret,
    )(meta, boxes, rays, cl_packed, slid, slent)
    t = out[:Tl, 0, :]
    tri = (out[:Tl, 1, :] - _ID_OFFSET).astype(jnp.int32)
    return t, tri
