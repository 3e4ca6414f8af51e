"""Pallas TPU kernel: dense per-tile cluster intersection, DMA-pipelined.

The variant of ops/pallas/dense_resident.py for scenes whose packed
cluster array does NOT fit in VMEM (resident_fits False): cluster blocks
stream HBM -> VMEM through a small ring buffer. Everything else — the
(K+1, 16, C) packing, the SMEM scalar box gates in ray-ROW layout, the
one-packed-bitmask sync per unroll group, the entry-sorted early exit,
the fold — is shared with (imported from) the resident kernel.

What the gate-before-DMA structure buys over the previous design (which
packed boxes INSIDE (C, 128) lane-padded blocks and had to DMA every
candidate before it could gate it):

1. **8x less DMA traffic** — the old (C, 128) block carried 16 useful
   lanes of 128 (512 KB per cluster at C=1024, 64 KB payload); the
   (16, C) resident layout is unpadded.
2. **Gated-out slots cost no DMA at all** — boxes ride scalar-prefetch
   SMEM, so the ~25-op row gate runs BEFORE the fetch. Straggler tiles
   with long shortlists and few live lanes skip both the fetch and the
   fold.
3. **One vector->scalar sync per unroll group** instead of two per slot.

Within a group all gated-in fetches are started together (ring slots
assigned by live-prefix popcount) and folded in arrival order, so the
fold of slot 0 hides the latency of slots 1..3; only the first wait of a
group can stall. All group DMAs complete within the group, so no drain
loop and no cross-group buffer hazards exist.

Intersection semantics are identical to ops/intersect.ray_triangle and
the closest-fold to ops/traversal._closest_update (same formulas — but
Mosaic may fuse multiplies differently than XLA, so cross-engine
agreement is ULP-level on t; the integration layer treats this engine
and the XLA slot scan as interchangeable).
"""

from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ...utils.constants import MAX_FLOAT
from .dense_resident import (  # shared layout + math + constants
    _ID_OFFSET,
    _MASKED_T_INIT,
    _TILE_GROUP,
    _TRI_SENTINEL,
    MAX_SHORTLIST,
    MAX_TRIS,
    _box_hit_row,
    _bw_fold_pc,
    _mt_fold_pc,
    _slab_init,
    _slab_reduce,
    _vis_drop,
    pack_cluster_boxes,
    pack_clusters_resident,
)

_NBUF = int(os.environ.get("PT_DMA_RING", "8"))  # ring depth == max
# unroll: a group's live slots all fit in flight. r5: 8 (was 4) — the
# 1.31M-tri DMA workload is sync-bound like the resident kernel and a
# deeper ring halves the per-group syncs; 8 x (16, C=1024) f32 buffers
# are 512 KB of VMEM, well within budget.

# re-exported for callers that treat this module as the packing authority
pack_clusters = pack_clusters_resident

__all__ = [
    "dense_intersect", "pack_clusters", "pack_cluster_boxes",
    "MAX_SHORTLIST", "MAX_TRIS",
]


def _make_kernel(unroll, fold=None, fast=2, vis_band=0.0, warm=0,
                 ray_groups=1):
    """``ray_groups`` (round 5, ported from the resident kernel): gate and
    fold the tile's rays in NS independent subgroups of P/NS consecutive
    sorted rays. The DMA for a slot starts when ANY of its subgroups
    gates in (ring slot = live-slot prefix); each subgroup then folds the
    fetched block behind its own bit. Gate bits: unroll*NS member bits +
    1 exit bit must stay f32-exact (< 2^24)."""
    fold = fold or _mt_fold_pc
    assert unroll <= _NBUF
    assert fast <= _NBUF
    NS = int(ray_groups)
    assert unroll * NS + 1 <= 24, (unroll, NS)

    def _kernel(meta_ref, boxes_ref, rays_ref, slid_hbm, slent_hbm, cl_hbm,
                out_ref, slid, slent, sl_sem, buf, sem):
        i = pl.program_id(0)
        num_tris = meta_ref[0]
        P = rays_ref.shape[2]
        Ps = P // NS
        assert P % (NS * 8) == 0, (P, NS)
        G = _TILE_GROUP
        W = slid.shape[1]

        # Stage this group's shortlists (ids+count, entries) into SMEM.
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
            tile = jnp.transpose(row)                     # (P, 8) for folds
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
            # visibility mode: occluded-lane dropout at the lane-reduction
            # points (see dense_resident._vis_drop)
            lo_col = tile[:, 7:8] - vis_band

            def sub(col, j):
                return col if NS == 1 else col[j * Ps:(j + 1) * Ps]

            if NS > 1:
                lane_ids = jax.lax.broadcasted_iota(jnp.int32, (1, P), 1)
                sg_masks = [lane_ids // Ps == j for j in range(NS)]

            def cond(carry):
                return jnp.logical_not(carry[1])

            # guarded reciprocals: a zero component would make the slab
            # test produce 0*inf = NaN, whose comparisons are False — the
            # gate would then UNconservatively skip a plausible cluster
            def _inv(d_):
                return 1.0 / jnp.where(jnp.abs(d_) < 1e-30,
                                       jnp.where(d_ < 0, -1e-30, 1e-30), d_)

            oxr = row[0:1, :]
            oyr = row[1:2, :]
            ozr = row[2:3, :]
            idxr = _inv(row[3:4, :])
            idyr = _inv(row[4:5, :])
            idzr = _inv(row[5:6, :])

            def fold_sub(cl, j, tb, ib):
                return fold(cl, sub(ox, j), sub(oy, j), sub(oz, j),
                            sub(dx, j), sub(dy, j), sub(dz, j),
                            tb, ib, num_tris)

            def body(carry):
                s, done, slabs = carry
                # Phase 1 — gate the whole group from SMEM boxes against
                # the group-start running best (conservative), one scalar
                # sync. The early-exit verdict rides the same bitmask as
                # bit `unroll*NS` (see dense_resident.py for the
                # equivalence argument). Bool rows convert to f32 weights
                # BEFORE the concat: Mosaic cannot relayout concatenated
                # i1 vregs.
                t_cols = [jnp.min(t128, axis=1, keepdims=True)
                          for (t128, _) in slabs]
                t_col = (jnp.concatenate(t_cols, axis=0)
                         if NS > 1 else t_cols[0])
                if vis_band > 0.0:
                    t_col = _vis_drop(t_col, lo_col)
                t_row = jnp.transpose(t_col)               # (1, P)
                sids = []
                wts = []
                for u in range(unroll):
                    su = s + u
                    sid = slid[g, jnp.minimum(1 + su, W - 1)]
                    sids.append(sid)
                    ok_u = su < cnt                        # scalar bool
                    box6 = tuple(
                        boxes_ref[sid >> 4, ((sid & 15) << 3) + j]
                        for j in range(6))  # 16 boxes per SMEM row
                    h = _box_hit_row(
                        box6, oxr, oyr, ozr, idxr, idyr, idzr, t_row)
                    if NS == 1:
                        wts.append(jnp.where(
                            h & ok_u, jnp.float32(1 << u), 0.0))
                    else:
                        hm = h & ok_u
                        for j in range(NS):
                            wts.append(jnp.where(
                                hm & sg_masks[j],
                                jnp.float32(1 << (u * NS + j)), 0.0))
                # >= (non-strict): equal-t lower-index contract
                entry_s0 = slent[g, jnp.minimum(s, W - 1)]
                wts.append(jnp.where(t_row >= entry_s0,
                                     jnp.float32(1 << (unroll * NS)), 0.0))
                wt = jnp.concatenate(wts, axis=0)  # (unroll*NS+1, P) f32
                bits = jnp.sum(
                    jnp.max(wt, axis=1, keepdims=True)
                ).astype(jnp.int32)

                # Phase 2 — start every gated-in fetch (slot live = ANY
                # subgroup bit; ring slot = live prefix), then fold in
                # order; fold u hides wait u+1.
                smask = (1 << NS) - 1
                bvals = []
                pfx = []
                acc = jnp.int32(0)
                for u in range(unroll):
                    live = jnp.where(
                        ((bits >> (u * NS)) & smask) != 0,
                        jnp.int32(1), jnp.int32(0))
                    bvals.append(live)
                    pfx.append(acc)
                    acc = acc + live

                for u in range(unroll):
                    @pl.when(bvals[u] != 0)
                    def _(u=u):
                        pltpu.make_async_copy(
                            cl_hbm.at[sids[u]], buf.at[pfx[u]],
                            sem.at[pfx[u]]).start()

                new_slabs = list(slabs)
                for u in range(unroll):
                    @pl.when(bvals[u] != 0)
                    def _(u=u):
                        pltpu.make_async_copy(
                            cl_hbm.at[sids[u]], buf.at[pfx[u]],
                            sem.at[pfx[u]]).wait()

                    for j in range(NS):
                        tj, ij = new_slabs[j]

                        def do_fold(tb, ib, u=u, j=j):
                            cl = buf[pfx[u]]           # (16, C) VMEM
                            return fold_sub(cl, j, tb, ib)

                        new_slabs[j] = jax.lax.cond(
                            (bits & (1 << (u * NS + j))) != 0,
                            do_fold,
                            lambda tb, ib: (tb, ib),
                            tj, ij,
                        )

                nxt = s + unroll
                exhausted = nxt >= cnt
                no_open = (bits >> (unroll * NS)) == 0
                return (nxt, exhausted | no_open, tuple(new_slabs))

            def _cat_outs(slabs):
                outs = [_slab_reduce(tb, ib) for (tb, ib) in slabs]
                if NS == 1:
                    return outs[0]
                return (jnp.concatenate([o[0] for o in outs], axis=0),
                        jnp.concatenate([o[1] for o in outs], axis=0))

            # COUNT LADDER (ported from the resident kernel, r4): tiles
            # with cnt <= `fast` DMA and fold exactly their cnt blocks
            # unconditionally — no box gates, no vector->scalar sync, no
            # early exit (half the entry-sorted tiles carry <= 1
            # candidate; a gate sync costs more than one ungated fold).
            # All n <= _NBUF fetches start before the first wait, so fold
            # u hides the latency of wait u+1. Branch 0 (cnt == 0: dead /
            # straggler-compacted tiles) retires the old per-tile
            # jnp.max(t_init) all-dead probe — the cull forces cnt = 0
            # whenever every lane is masked, same argument as the
            # resident kernel's ladder.
            def make_fast(n):
                def fast_tile(t0, i0):
                    fsids = [slid[g, jnp.minimum(1 + u, W - 1)]
                             for u in range(n)]
                    for u in range(n):
                        pltpu.make_async_copy(
                            cl_hbm.at[fsids[u]], buf.at[u], sem.at[u]
                        ).start()
                    tbs = [_slab_init(sub(t0, j), sub(i0, j))
                           for j in range(NS)]
                    for u in range(n):
                        pltpu.make_async_copy(
                            cl_hbm.at[fsids[u]], buf.at[u], sem.at[u]
                        ).wait()
                        tbs = [fold_sub(buf[u], j, tb, ib)
                               for j, (tb, ib) in enumerate(tbs)]
                    return _cat_outs(tbs)
                return fast_tile

            def loop_tile(t0, i0):
                slabs0 = [_slab_init(sub(t0, j), sub(i0, j))
                          for j in range(NS)]
                # WARM START (round 5, see dense_resident.py): fold the
                # first `warm` entry-sorted slots ungated so the loop's
                # gated groups see a hit-informed t instead of the init
                # cap (the first group's gates otherwise pass nearly
                # everything). Fetch pattern mirrors make_fast; all warm
                # DMAs complete before the loop, so no ring hazard.
                wN = min(warm, fast)
                if wN > 0:
                    wsids = [slid[g, jnp.minimum(1 + u, W - 1)]
                             for u in range(wN)]
                    for u in range(wN):
                        pltpu.make_async_copy(
                            cl_hbm.at[wsids[u]], buf.at[u], sem.at[u]
                        ).start()
                    for u in range(wN):
                        pltpu.make_async_copy(
                            cl_hbm.at[wsids[u]], buf.at[u], sem.at[u]
                        ).wait()
                        slabs0 = [fold_sub(buf[u], j, tb, ib)
                                  for j, (tb, ib) in enumerate(slabs0)]
                init = (jnp.int32(wN), cnt == 0, tuple(slabs0))
                _, _, slabs = jax.lax.while_loop(cond, body, init)
                return _cat_outs(slabs)

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
            )  # (P, 2); id == -1 -> 2^23 - 1, still exact
            out_ref[pl.ds(g, 1)] = jnp.transpose(out).reshape(1, 2, P)
            return 0

        jax.lax.fori_loop(0, G, one_tile, 0)

    return _kernel


@functools.partial(jax.jit,
                   static_argnames=("interpret", "unroll", "bw", "fast",
                                    "vis_band", "warm_start", "ray_groups"))
def dense_intersect(ids, counts, entries, rays, cl_packed, boxes, num_tris,
                    interpret: bool = False, unroll: int = _NBUF,
                    bw: bool = False, fast: int | None = None,
                    vis_band: float = 0.0, warm_start: int | None = None,
                    ray_groups: int | None = None):
    """Run the DMA-pipelined dense intersection kernel.

    ids:       (Tl, M) i32 shortlist, sorted by conservative entry distance
    counts:    (Tl,) i32 — candidates per tile (<= M <= MAX_SHORTLIST)
    entries:   (Tl, M) f32 — conservative entry distance per slot (+inf pad)
    rays:      (Tl, 8, P) f32 — o.xyz / d.xyz / lane-mask / search-cap
    cl_packed: (K+1, 16, C) f32 from pack_clusters_resident (stays in HBM);
               with ``bw=True``, from pack_clusters_resident_bw (the
               Baldwin-Weber layout + _bw_fold_pc fold)
    boxes:     (K+1, 8) f32 from pack_cluster_boxes (SMEM, scalar gates)

    Returns (t (Tl, P) f32, tri (Tl, P) i32) — closest hit per ray over the
    shortlisted clusters only (caller handles the overflow fallback).
    """
    Tl, M = ids.shape
    if fast is None:
        # count-ladder width, same knob as the resident kernel (capped at
        # the ring depth: a fast branch's fetches must all be in flight)
        fast = min(_NBUF, int(os.environ.get("PT_KERNEL_FAST", "4")))
    P = rays.shape[2]
    C = cl_packed.shape[2]
    if warm_start is None:
        # same policy as the resident kernel: warm only at small C (the
        # C=1024 warm regression is a Mosaic codegen pathology)
        env = os.environ.get("PT_KERNEL_WARM")
        warm_start = int(env) if env is not None else (2 if C <= 256 else 0)
    if ray_groups is None:
        ray_groups = int(os.environ.get("PT_KERNEL_RAYGROUPS", "2"))
    while ray_groups > 1 and P % (ray_groups * 8) != 0:
        ray_groups //= 2
    # the ring depth caps unroll at _NBUF; NS only multiplies gate bits
    assert unroll * ray_groups + 1 <= 24
    G = _TILE_GROUP
    assert M <= MAX_SHORTLIST, f"max_clusters {M} > {MAX_SHORTLIST}"
    W = -(-(M + 1) // 128) * 128  # lane-aligned row width
    meta = jnp.asarray(num_tris, jnp.int32).reshape(1)

    # ids row = [count, id0..idM-1, 0...]; entries row lane-padded with +inf
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
            pl.BlockSpec(memory_space=pl.ANY),  # shortlist ids
            pl.BlockSpec(memory_space=pl.ANY),  # shortlist entries
            pl.BlockSpec(memory_space=pl.ANY),  # cl_packed stays in HBM
        ],
        out_specs=pl.BlockSpec((G, 2, P), lambda i, *_: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.SMEM((G, W), jnp.int32),
            pltpu.SMEM((G, W), jnp.float32),
            pltpu.SemaphoreType.DMA((2,)),
            pltpu.VMEM((_NBUF, 16, C), jnp.float32),  # cluster ring
            pltpu.SemaphoreType.DMA((_NBUF,)),
        ],
    )
    out = pl.pallas_call(
        _make_kernel(unroll, _bw_fold_pc if bw else _mt_fold_pc,
                     fast=fast, vis_band=float(vis_band), warm=warm_start,
                     ray_groups=ray_groups),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((Tp, 2, P), jnp.float32),
        interpret=interpret,
    )(meta, boxes, rays, slid, slent, cl_packed)
    t = out[:Tl, 0, :]
    tri = (out[:Tl, 1, :] - _ID_OFFSET).astype(jnp.int32)
    return t, tri
