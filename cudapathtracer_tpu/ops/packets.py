"""Packet (ray-tile) traversal — the TPU-native fast path for closest-hit.

The reference's per-thread stack traversal (kernel.cu:112-161) maps terribly
onto a vector machine: measured on TPU v5e, dynamic per-lane gathers run at
~0.1 G elem/s while streaming Moller-Trumbore tests run at ~78 G tests/s and
contiguous block loads at ~15 G elem/s. So instead of chasing pointers per
ray we restructure the search around what the hardware is good at:

1. Rays are processed in **tiles** of P consecutive rays (already coherent:
   the renderer issues rays in Morton pixel order, camera.h:57-75 analogue).
2. The scene is cut into **clusters** — the leaves of a coarse SAH BVH
   (accel/bvh.py with leaf_size = C), each holding up to C triangles stored
   contiguously.
3. Per tile, a conservative **frustum-vs-AABB interval test** (pure
   streaming VPU math, no gathers) selects candidate clusters and their
   conservative entry distances.
4. The M nearest candidates per tile form a fixed-size **shortlist**
   (``lax.top_k``); each slot is then intersected densely — all P rays
   against all C triangles of the cluster, one contiguous block load and a
   (P, C) Moller-Trumbore sweep per slot.
5. **Correctness is unconditional**: every tile also computes U = the
   smallest conservative entry distance among *dropped* candidates. A ray
   whose best hit satisfies ``t <= U`` provably cannot be beaten by a
   dropped cluster. The rare rays with ``t > U`` (shortlist overflow) are
   re-traced through the fine per-ray BVH (ops/traversal.py) under a mask —
   a masked-out ``lax.while_loop`` costs ~zero when no lane needs it.
6. **Straggler splitting** (``rounds > 1``): a tile runs to its slowest
   lane, yet most rays resolve within the first couple of entry-sorted
   candidates. Early rounds cap every tile at a tiny candidate budget and
   reuse the U bound to identify unresolved rays, which re-sort and
   compact into far fewer live tiles for the next round (+19-38% measured
   on interior workloads).

Results are bit-identical to the brute-force oracle (tests/test_packets.py):
each (ray, triangle) test computes the same f32 value as
``trace_bruteforce``, and the closest-fold uses the same deterministic
lower-index tie-break (ops/traversal._closest_update).
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from ..utils.constants import MAX_FLOAT
from .intersect import bw_precompute, ray_triangle, ray_triangle_bw
from .traversal import Hit, TraceData, _closest_update, trace
from .vecmath import Vec3, gather


class PacketData(NamedTuple):
    """Cluster-level scene layout for packet traversal (a JAX pytree).

    cl_lo / cl_hi: (K,) cluster AABBs (SoA).
    v0 / e1 / e2:  (K+1, C) pre-packed triangle blocks; row K is an all-
                   degenerate sentinel so shortlist padding is harmless.
    tri:           (K+1, C) i32 scene triangle ids; pad slots hold T.
    num_tris:      () i32.
    """

    cl_lo: Vec3
    cl_hi: Vec3
    v0: Vec3
    e1: Vec3
    e2: Vec3
    tri: jnp.ndarray
    num_tris: jnp.ndarray

    @property
    def num_clusters(self):
        return self.cl_lo.x.shape[0]

    @property
    def cluster_size(self):
        return self.tri.shape[1]


def make_packet_data(scene, cl_lo: Vec3, cl_hi: Vec3, cl_tri) -> PacketData:
    """Pack cluster triangle blocks from the scene's vertex SoA.

    ``cl_tri``: (K, C) i32 triangle ids per cluster, padded with T (the
    leaf_tri layout of a coarse FlatBVH). Runs under jit — pure gathers, so
    vertex updates (differentiable pass) flow into the packed blocks exactly
    as in traversal.make_trace_data.
    """
    T = scene.num_tris
    assert T < (1 << 23) - 1, (
        "packet traversal transports triangle ids as exact f32 values "
        "(ops/pallas/dense.py); scenes beyond 2^23-2 triangles need id "
        "chunking"
    )
    C = cl_tri.shape[1]
    cl_tri = jnp.asarray(cl_tri, jnp.int32)
    tri = jnp.concatenate(
        [cl_tri, jnp.full((1, C), T, jnp.int32)], axis=0
    )  # sentinel row K

    # Sentinel vertex index T -> vertex 0 for all corners -> degenerate.
    pad = jnp.zeros((1,), jnp.int32)
    v0i = jnp.concatenate([scene.tri_v0, pad])
    v1i = jnp.concatenate([scene.tri_v1, pad])
    v2i = jnp.concatenate([scene.tri_v2, pad])
    i0 = jnp.take(v0i, tri, mode="clip")
    i1 = jnp.take(v1i, tri, mode="clip")
    i2 = jnp.take(v2i, tri, mode="clip")
    v0 = gather(scene.verts, i0)
    v1 = gather(scene.verts, i1)
    v2 = gather(scene.verts, i2)
    z = jnp.where(tri >= T, 0.0, 1.0)  # zero pad slots entirely
    v0 = v0 * z
    v1 = v1 * z
    v2 = v2 * z
    return PacketData(
        cl_lo=cl_lo,
        cl_hi=cl_hi,
        v0=v0,
        e1=v1 - v0,
        e2=v2 - v0,
        tri=tri,
        num_tris=jnp.asarray(T, jnp.int32),
    )


def make_resident_pack(pd: PacketData, intersector: str = "bw"):
    """Precompute the Mosaic kernels' scene layout: (packed, boxes).

    Pure function of ``pd`` (so for a static scene it belongs at setup,
    not inside the per-dispatch trace — measured ~6 ms/dispatch at 20k
    tris). Pass the result as ``trace_packets(..., resident_pack=...)``.
    Works for both the VMEM-resident and the DMA-pipelined kernel (they
    share the packed layout)."""
    from .pallas.dense_resident import (
        pack_cluster_boxes,
        pack_clusters_resident,
        pack_clusters_resident_bw,
    )

    pack = (pack_clusters_resident_bw if intersector == "bw"
            else pack_clusters_resident)
    return pack(pd), pack_cluster_boxes(pd)


def _axis_interval(ol, oh, dl, dh, bl, bh):
    """Conservative per-axis [tmin, tmax] hull over the tile's origin
    interval [ol, oh] and direction interval [dl, dh] against slab [bl, bh].

    Interval arithmetic: the hull of all endpoint quotients covers every
    (o, d) in the tile when the direction interval is sign-pure; a
    mixed-sign interval gets (-inf, +inf) (fully conservative)."""
    mixed = (dl <= 0.0) & (dh >= 0.0)
    tiny = jnp.float32(1e-30)
    dls = jnp.where(jnp.abs(dl) < tiny, jnp.where(dl < 0, -tiny, tiny), dl)
    dhs = jnp.where(jnp.abs(dh) < tiny, jnp.where(dh < 0, -tiny, tiny), dh)

    n0 = bl - ol
    n1 = bl - oh
    n2 = bh - ol
    n3 = bh - oh
    qs = [n / s for n in (n0, n1, n2, n3) for s in (dls, dhs)]
    tmin = qs[0]
    tmax = qs[0]
    for q in qs[1:]:
        tmin = jnp.minimum(tmin, q)
        tmax = jnp.maximum(tmax, q)
    inf = jnp.float32(jnp.inf)
    tmin = jnp.where(mixed, -inf, tmin)
    tmax = jnp.where(mixed, inf, tmax)
    return tmin, tmax


def tile_cull(olo: Vec3, ohi: Vec3, dlo: Vec3, dhi: Vec3,
              cl_lo: Vec3, cl_hi: Vec3):
    """Frustum-vs-AABB candidates. Tile bounds are (Tl, 1) SoA, clusters
    (1, K). Returns (hit (Tl, K) bool, entry (Tl, K) f32 >= 0)."""
    tx0, tx1 = _axis_interval(olo.x, ohi.x, dlo.x, dhi.x, cl_lo.x, cl_hi.x)
    ty0, ty1 = _axis_interval(olo.y, ohi.y, dlo.y, dhi.y, cl_lo.y, cl_hi.y)
    tz0, tz1 = _axis_interval(olo.z, ohi.z, dlo.z, dhi.z, cl_lo.z, cl_hi.z)
    tmin = jnp.maximum(jnp.maximum(tx0, ty0), tz0)
    tmax = jnp.minimum(jnp.minimum(tx1, ty1), tz1)
    hit = (tmin <= tmax) & (tmax >= 0.0)
    entry = jnp.maximum(tmin, 0.0)
    return hit, entry


def _masked_bounds(v, m, axis):
    inf = jnp.float32(jnp.inf)
    lo = jnp.min(jnp.where(m, v, inf), axis=axis, keepdims=True)
    hi = jnp.max(jnp.where(m, v, -inf), axis=axis, keepdims=True)
    return lo, hi


def _part1by2(x):
    """Spread the low 7 bits of x so consecutive bits are 3 apart."""
    x = (x | (x << 16)) & 0x030000FF
    x = (x | (x << 8)) & 0x0300F00F
    x = (x | (x << 4)) & 0x030C30C3
    x = (x | (x << 2)) & 0x09249249
    return x


def ray_sort_keys(o: Vec3, d: Vec3, mask, lo: Vec3, hi: Vec3):
    """Coherence keys: direction octant (major) then 21-bit Morton code of
    the origin within the scene bounds. Masked lanes get the max key so
    they compact into all-masked tiles at the end (which cost nothing).

    Sorting a bounce/shadow batch by this key is what keeps the per-tile
    direction and origin intervals tight: an unsorted diffuse-bounce tile
    spans the full hemisphere and its frustum covers most of the scene.
    """
    oct_ = (
        (d.x < 0).astype(jnp.int32) * 4
        + (d.y < 0).astype(jnp.int32) * 2
        + (d.z < 0).astype(jnp.int32)
    )
    # 2 more direction bits: dominant axis within the octant — tightens the
    # per-tile direction cone from a full octant to roughly a third of one
    ax, ay, az = jnp.abs(d.x), jnp.abs(d.y), jnp.abs(d.z)
    major = jnp.where(
        (ax >= ay) & (ax >= az), 0, jnp.where(ay >= az, 1, 2)
    ).astype(jnp.int32)

    def q(v, l, h):
        ext = jnp.maximum(h - l, 1e-20)
        cell = jnp.clip((v - l) / ext * 127.0, 0.0, 127.0)
        return cell.astype(jnp.int32)

    mx = _part1by2(q(o.x, lo.x, hi.x))
    my = _part1by2(q(o.y, lo.y, hi.y))
    mz = _part1by2(q(o.z, lo.z, hi.z))
    morton = (mx << 2) | (my << 1) | mz
    key = (oct_ << 23) | (major << 21) | morton
    return jnp.where(mask, key, jnp.int32(0x7FFFFFFF))


def trace_packets(o: Vec3, d: Vec3, pd: PacketData,
                  fine_td: TraceData | None = None, mask=None,
                  tile_size: int = 128, max_clusters: int = 32,
                  engine: str = "xla", sort: bool = False,
                  rounds: int = 1, first_round_slots: int = 3,
                  sort_window: int = 0,
                  two_level: bool | str | None = None,
                  super_factor: int = 8, super_slots: int = 16,
                  super_list: int = 255,
                  t_cap=None, intersector: str = "bw",
                  resident_pack=None, vis_band: float = 0.0,
                  warm_start: int | None = None,
                  ray_groups: int | None = None,
                  _need_out: bool = False):
    """Closest-hit for R rays via tile-packet traversal.

    Semantics identical to ``traversal.trace`` / ``trace_bruteforce``:
    closest triangle with 0 < t, MAX_FLOAT/-1 on miss, exact-t ties to the
    lower triangle index. ``fine_td`` enables the overflow fallback; without
    it, results are exact only when no tile drops a candidate cluster (the
    caller must then size ``max_clusters`` >= the worst-case candidate
    count — fine for tests, not recommended in production).

    ``engine``: 'xla' (lockstep slot scan), 'pallas' (per-tile dynamic-count
    kernel, ops/pallas/dense.py — the fast path on real TPUs) or
    'pallas_interpret' (same kernel in interpreter mode, for CPU tests).
    The engines agree on the chosen triangle everywhere and on t to ULP
    (Mosaic vs XLA FMA contraction).

    ``two_level``: False = flat cull; True = XLA-side two-level cull
    (supercluster shortlist + member expansion under a slot cap);
    'super' = SUPER SHORTLISTS (round 4): the shortlist itself is in
    supercluster units and the Mosaic kernel expands members behind its
    per-ray SMEM box gates — no member is ever dropped, so the U bound
    cannot collapse on fat tiles (the r3 53 s/trace cliff at 328k/C=256)
    and the XLA cull+top_k shrink by F. Requires the VMEM-resident kernel
    (falls back to auto otherwise). None = auto: 'super' when the resident
    kernel is in play and K > 2F, else the flat/two-level heuristic.
    ``super_list``: max supers per tile shortlist in 'super' mode (255
    covers every super of a 328k-tri scene at C=256 — no drops at all).

    ``t_cap``: optional (R,) f32 per-ray search cap. Hits with t >= cap are
    reported as a MISS (MAX_FLOAT/-1); hits below it are exact. For
    visibility-style queries (BDPT shadow connections: the decision is
    |t - len| <= eps, kernel.cu:402-405) a cap of len + 2*eps yields the
    identical decision while letting the Mosaic kernels' early exit fire
    as soon as candidate entries pass the cap, and skipping the fine-BVH
    fallback for rays whose dropped candidates all lie beyond it.

    ``vis_band``: static float > 0 marks the query as VISIBILITY-ONLY and
    enables occluded-lane dropout in the Mosaic kernels: a lane whose best
    hit falls strictly below ``t_cap - vis_band`` (a floor <= the caller's
    len - eps when t_cap = len + 2*eps and vis_band = 3*eps) is provably
    occluded and retires immediately — it stops gating, folding, and
    holding its tile's early exit open, and reports t = -1.0 with the
    occluder's id (a real hit below the floor, not necessarily the
    closest). The caller's band decision |t - len| <= eps is IDENTICAL to
    the closest-hit query's for every lane (|-1 - len| > eps for any
    len >= 0); the reported t itself is NOT the closest hit for retired
    lanes — only use with band-decision consumers (integrators/bdpt.py).
    The XLA engine ignores the flag (its closest-hit answer is
    decision-equivalent), so cross-engine tests compare decisions, not t.

    ``intersector``: 'bw' (Baldwin-Weber precomputed form — the default in
    every engine; measured -3%/-7% per trace at 20k/328k tris vs MT) or
    'mt' (the reference's Moller-Trumbore, modelLoader.h:49-123). Both are
    decision-equivalent in exact arithmetic (intersect.ray_triangle_bw);
    all engines and the fallback run the selected one so results stay
    engine-independent.

    ``warm_start`` / ``ray_groups``: Mosaic-kernel tuning (see
    ops/pallas/dense_resident.py — warm-start ungated fold of the first N
    entry-sorted slots; per-ray-subgroup gating). None = env defaults
    (PT_KERNEL_WARM / PT_KERNEL_RAYGROUPS). Bit-identical results at any
    setting (ungated folds are always sound; subgroup gates are the same
    conservative per-ray box test).

    ``resident_pack``: optional precomputed (packed, boxes) pair from
    ``make_resident_pack(pd, intersector)``. The Mosaic kernels' scene
    layout is a pure function of ``pd`` (~6 ms/dispatch at 20k tris,
    measured) — a static-scene caller (the renderer) computes it ONCE at
    setup; the default None keeps in-trace packing for callers whose
    vertices change under the same jit (differentiable vertex updates).
    """
    o = jax.lax.stop_gradient(o)
    d = jax.lax.stop_gradient(d)
    pd = jax.lax.stop_gradient(pd)
    assert vis_band == 0.0 or t_cap is not None, (
        "vis_band derives the occlusion floor from the per-ray cap")

    if rounds > 1:
        # Straggler splitting: most rays resolve within the first few
        # entry-sorted candidates, but a tile runs to its SLOWEST lane.
        # Early rounds cap every tile at a small candidate budget
        # (first_round_slots, growing 4x per round); rays whose best hit
        # exceeds the dropped-candidate bound carry into the next round,
        # where sorting compacts them into far fewer live tiles. The final
        # round runs the full shortlist (plus the fine-BVH fallback).
        #
        # DESIGN NOTE (round 2, measured): an incremental variant that
        # sorts ONCE and re-runs unresolved rays in place (kernel resume
        # from a carried (t, id) + per-live-lane re-cull) measured ~1.5x
        # SLOWER than this re-sorting structure on the interior bench —
        # the dense fold costs per TILE x SLOT regardless of how many
        # lanes are live, so the per-round re-sort that COMPACTS the ~17%
        # stragglers into ~2x fewer tiles buys more than the extra
        # argsort chain costs. Keep rounds compacting.
        m_cur = mask if mask is not None else jnp.ones((o.x.shape[0],), bool)
        acc_t = jnp.full((o.x.shape[0],), MAX_FLOAT, jnp.float32)
        acc_tri = jnp.full((o.x.shape[0],), -1, jnp.int32)
        budget = int(first_round_slots)
        for _ in range(rounds - 1):
            hi, need = trace_packets(
                o, d, pd, fine_td=None, mask=m_cur, tile_size=tile_size,
                max_clusters=min(budget, int(max_clusters)),
                engine=engine, sort=sort, rounds=1,
                sort_window=sort_window, two_level=two_level,
                super_factor=super_factor, super_slots=super_slots,
                super_list=super_list,
                t_cap=t_cap, intersector=intersector,
                resident_pack=resident_pack, vis_band=vis_band,
                warm_start=warm_start, ray_groups=ray_groups,
                _need_out=True,
            )
            done = m_cur & jnp.logical_not(need)
            acc_t = jnp.where(done, hi.t, acc_t)
            acc_tri = jnp.where(done, hi.tri, acc_tri)
            m_cur = need
            budget *= 4
        hf = trace_packets(
            o, d, pd, fine_td=fine_td, mask=m_cur, tile_size=tile_size,
            max_clusters=max_clusters, engine=engine, sort=sort, rounds=1,
            sort_window=sort_window, two_level=two_level,
            super_factor=super_factor, super_slots=super_slots,
            super_list=super_list,
            t_cap=t_cap, intersector=intersector,
            resident_pack=resident_pack, vis_band=vis_band,
            warm_start=warm_start, ray_groups=ray_groups,
        )
        return Hit(
            tri=jnp.where(m_cur, hf.tri, acc_tri),
            t=jnp.where(m_cur, hf.t, acc_t),
        )

    R = o.x.shape[0]
    P = int(tile_size)
    K = pd.num_clusters
    C = pd.cluster_size
    Rp = -(-R // P) * P
    Tl = Rp // P

    if mask is None:
        mask = jnp.ones((R,), bool)

    if sort:
        # Group incoherent rays (diffuse bounces, connections) into coherent
        # tiles. The permutation is applied by carrying every per-ray column
        # as a PAYLOAD OPERAND of one multi-operand ``lax.sort`` — measured
        # (tools/prof_sort.py, v5e, 1M rays): a key sort costs ~4.0 ms and
        # payload operands ride the sort network for FREE (8 payloads: 4.01
        # ms), while the old argsort + row-gather + inverse-argsort +
        # row-gather chain cost 13.7 ms. The original lane index travels as
        # one more payload; a second payload sort keyed on it restores the
        # original order (no inverse permutation, no gathers, no f32<->i32
        # bitcasts — tri ids stay int operands end to end).
        lo = Vec3(pd.cl_lo.x.min(), pd.cl_lo.y.min(), pd.cl_lo.z.min())
        hi = Vec3(pd.cl_hi.x.max(), pd.cl_hi.y.max(), pd.cl_hi.z.max())
        key = ray_sort_keys(o, d, mask, lo, hi)
        # payload operands are NOT free (measured r4: ~0.5 ms per extra
        # column at 1M rays), so the mask does not travel as a column: real
        # keys are clamped one below the masked sentinel (merging two
        # grouping buckets — ordering is irrelevant to exactness) and the
        # mask is recovered from the sorted key. The per-ray cap column
        # only rides when the caller actually passed one.
        key = jnp.where(mask, jnp.minimum(key, 0x7FFFFFFE), key)
        iota = jnp.arange(R, dtype=jnp.int32)
        cols = (key, iota, o.x, o.y, o.z, d.x, d.y, d.z)
        if t_cap is not None:
            cols = cols + (jnp.broadcast_to(
                jnp.asarray(t_cap, jnp.float32), o.x.shape),)

        W = int(sort_window)
        windowed = W > 0 and W % P == 0 and R > W
        if windowed:
            # WINDOWED sort: sort independent windows of W rays instead of
            # all R at once. Sorting cost is superlinear in length (XLA's
            # TPU sort is a bitonic-style network, O(n log^2 n)) and tile
            # grouping only needs LOCAL coherence — rays that land in the
            # same P-tile must be similar, but the order of tiles is
            # irrelevant. The input is in pixel-Morton order, so a window
            # covers a compact screen region whose bounce rays already
            # share origin locality; sorting within it captures almost all
            # of the key's tile-tightening power at a fraction of the sort
            # cost. Results are bit-identical to the global sort: every
            # (ray, triangle) test computes the same f32 everywhere, and
            # the U-bound/fallback makes the hit exact under ANY grouping.
            Rw = -(-R // W) * W
            if Rw != R:
                # pad lanes: masked (max key), unit direction.
                # The index payload pads with R..Rw-1 (NOT a constant): the
                # back sort keys on it, so pad indices must stay above every
                # real lane's to land at the end and be sliced off.
                pads = (0x7FFFFFFF, None, 0.0, 0.0, 0.0, 1.0, 1.0, 1.0,
                        0.0)[:len(cols)]
                cols = tuple(
                    jnp.concatenate([
                        c,
                        jnp.arange(R, Rw, dtype=jnp.int32) if p is None
                        else jnp.full((Rw - R,), p, c.dtype),
                    ])
                    for c, p in zip(cols, pads)
                )
            NW = Rw // W
            cols = jax.lax.sort(
                tuple(c.reshape(NW, W) for c in cols),
                dimension=1, num_keys=1, is_stable=False,
            )
            cols = tuple(c.reshape(Rw) for c in cols)
        else:
            cols = jax.lax.sort(cols, num_keys=1, is_stable=False)
        (skey, sidx, sox, soy, soz, sdx, sdy, sdz) = cols[:8]
        scap = cols[8] if t_cap is not None else None
        smask = skey < 0x7FFFFFFF  # masked lanes carry the sentinel key

        out = trace_packets(
            Vec3(sox, soy, soz), Vec3(sdx, sdy, sdz),
            pd, fine_td=fine_td, mask=smask,
            tile_size=tile_size, max_clusters=max_clusters,
            engine=engine, sort=False, two_level=two_level,
            super_factor=super_factor, super_slots=super_slots,
            super_list=super_list,
            t_cap=scap,
            intersector=intersector, resident_pack=resident_pack,
            vis_band=vis_band, warm_start=warm_start,
            ray_groups=ray_groups, _need_out=_need_out,
        )
        hit, need = out if _need_out else (out, None)
        # un-sort: one more payload sort keyed on the carried original lane
        # index (unique, so is_stable is irrelevant). Windowed: each
        # window's index set is its own contiguous range, so the in-window
        # sort restores in-window order and the reshape restores the rest.
        back = (sidx, hit.t, hit.tri) + (
            (need.astype(jnp.int32),) if _need_out else ()
        )
        if windowed:
            back = jax.lax.sort(
                tuple(c.reshape(NW, W) for c in back),
                dimension=1, num_keys=1, is_stable=False,
            )
            back = tuple(c.reshape(Rw)[:R] for c in back)
        else:
            back = jax.lax.sort(back, num_keys=1, is_stable=False)
        hit = Hit(tri=back[2], t=back[1])
        if _need_out:
            return hit, back[3] > 0
        return hit

    def padv(a, fill):
        if Rp == R:
            return a
        return jnp.concatenate(
            [a, jnp.full((Rp - R,), fill, a.dtype)]
        )

    ox = padv(o.x, 0.0).reshape(Tl, P)
    oy = padv(o.y, 0.0).reshape(Tl, P)
    oz = padv(o.z, 0.0).reshape(Tl, P)
    dx = padv(d.x, 1.0).reshape(Tl, P)
    dy = padv(d.y, 1.0).reshape(Tl, P)
    dz = padv(d.z, 1.0).reshape(Tl, P)
    m = padv(mask, False).reshape(Tl, P)

    # ---- tile bounds (masked lanes excluded) ------------------------------
    # one stacked (Tl, 6, P) reduction pair instead of 12 separate
    # (Tl, P) reduces: the separate slice_reduce fusions measured
    # ~14 ms/trace at 1M rays, the stacked form ~1/3 of that
    arr = jnp.stack([ox, oy, oz, dx, dy, dz], axis=1)  # (Tl, 6, P)
    m3 = m[:, None, :]
    inf_ = jnp.float32(jnp.inf)
    mins = jnp.min(jnp.where(m3, arr, inf_), axis=2, keepdims=True)
    maxs = jnp.max(jnp.where(m3, arr, -inf_), axis=2, keepdims=True)
    olo = Vec3(mins[:, 0], mins[:, 1], mins[:, 2])
    ohi = Vec3(maxs[:, 0], maxs[:, 1], maxs[:, 2])
    dlo = Vec3(mins[:, 3], mins[:, 4], mins[:, 5])
    dhi = Vec3(maxs[:, 3], maxs[:, 4], maxs[:, 5])

    any_lane = jnp.any(m, axis=1, keepdims=True)
    inf = jnp.float32(jnp.inf)

    F = int(super_factor)
    Ms = min(int(super_slots), -(-K // F))

    # SUPER-shortlist mode (round 4): needs the VMEM-resident Mosaic kernel
    # (the member expansion lives behind its SMEM box gates).
    can_resident = engine in ("pallas", "pallas_interpret") and C % 128 == 0
    if can_resident:
        from .pallas.dense_resident import resident_fits as _rfits

        can_resident = _rfits(K, C)
    can_super = can_resident and K > 2 * F
    use_super = two_level == "super" and can_super
    if two_level == "super" and not use_super:
        two_level = None  # fall back to the auto heuristic
    if two_level is None:
        # auto (re-measured r4 at 328k tris): the FLAT (Tl, K) cull wins
        # up to K ~ 2000 — flat C=512 (K=917) 75 ms/trace vs super 76-80
        # and flat C=256 (K=1842) 107 vs the r3 two-level C=256 53 s(!)
        # cliff (the XLA two-level's expansion cap DROPS close members
        # and collapses the U bound on fat tiles). Past that, prefer
        # SUPER shortlists (no drops by construction) whenever the
        # resident kernel is in play; the capped two-level is the last
        # resort for huge non-resident scenes (its drops cost per-ray
        # fallback work, never correctness).
        if K <= 2048:
            two_level = False
        elif can_super:
            use_super = True
            two_level = False  # unused when use_super
        else:
            two_level = True

    if use_super:
        # ---- supercluster-granular shortlist ---------------------------
        # Cull (Tl, S) super boxes, keep EVERY hit super (up to
        # ``super_list``) entry-sorted; the Mosaic kernel gates members
        # per ray. U comes only from supers beyond the list cap.
        S = -(-K // F)
        KP = S * F

        def padc(a, fill):
            if KP == K:
                return a
            return jnp.concatenate([a, jnp.full((KP - K,), fill, a.dtype)])

        sup_lo = Vec3(padc(pd.cl_lo.x, inf).reshape(S, F).min(1),
                      padc(pd.cl_lo.y, inf).reshape(S, F).min(1),
                      padc(pd.cl_lo.z, inf).reshape(S, F).min(1))
        sup_hi = Vec3(padc(pd.cl_hi.x, -inf).reshape(S, F).max(1),
                      padc(pd.cl_hi.y, -inf).reshape(S, F).max(1),
                      padc(pd.cl_hi.z, -inf).reshape(S, F).max(1))
        hit_s, entry_s = tile_cull(
            olo, ohi, dlo, dhi,
            Vec3(sup_lo.x[None, :], sup_lo.y[None, :], sup_lo.z[None, :]),
            Vec3(sup_hi.x[None, :], sup_hi.y[None, :], sup_hi.z[None, :]),
        )  # (Tl, S)
        entry_s = jnp.where(hit_s & any_lane, entry_s, inf)
        M = min(S, max(1, int(super_list)),
                max(1, int(max_clusters) // F) if max_clusters < 4095
                else S)
        if S > M:
            negv, idxs = jax.lax.top_k(-entry_s, M + 1)
            U = -negv[:, M]  # a dropped super's entry lower-bounds members'
            negv = negv[:, :M]
            idxs = idxs[:, :M]
        else:
            negv, idxs = jax.lax.top_k(-entry_s, M)
            U = jnp.full((Tl,), inf)
        entries = -negv
        slot_ok = entries < inf
        ids = jnp.where(slot_ok, idxs, S).astype(jnp.int32)  # S = sentinel
    elif two_level and K > F:
        # ---- level 1: supercluster cull -------------------------------
        # Superclusters = F preorder-consecutive clusters (spatial
        # neighbors by construction of the flat BVH), boxes merged on the
        # fly (cheap: one (S, F) min/max reduce per axis per call).
        S = -(-K // F)
        KP = S * F

        def padc(a, fill):
            if KP == K:
                return a
            return jnp.concatenate([a, jnp.full((KP - K,), fill, a.dtype)])

        # pad with inverted boxes: min over +inf / max over -inf is
        # identity, and the padded CLUSTER slots cull to entry = inf below
        clx0 = padc(pd.cl_lo.x, inf)
        cly0 = padc(pd.cl_lo.y, inf)
        clz0 = padc(pd.cl_lo.z, inf)
        clx1 = padc(pd.cl_hi.x, -inf)
        cly1 = padc(pd.cl_hi.y, -inf)
        clz1 = padc(pd.cl_hi.z, -inf)
        sup_lo = Vec3(clx0.reshape(S, F).min(1), cly0.reshape(S, F).min(1),
                      clz0.reshape(S, F).min(1))
        sup_hi = Vec3(clx1.reshape(S, F).max(1), cly1.reshape(S, F).max(1),
                      clz1.reshape(S, F).max(1))
        hit_s, entry_s = tile_cull(
            olo, ohi, dlo, dhi,
            Vec3(sup_lo.x[None, :], sup_lo.y[None, :], sup_lo.z[None, :]),
            Vec3(sup_hi.x[None, :], sup_hi.y[None, :], sup_hi.z[None, :]),
        )  # (Tl, S)
        entry_s = jnp.where(hit_s & any_lane, entry_s, inf)
        if S > Ms:
            negs, sup_ids = jax.lax.top_k(-entry_s, Ms + 1)
            # a dropped super's entry lower-bounds every member cluster's
            # (its box contains theirs) — fold it into the U bound
            U_s = -negs[:, Ms]
            sup_ids = sup_ids[:, :Ms]
            sup_ok = -negs[:, :Ms] < inf
        else:
            negs, sup_ids = jax.lax.top_k(-entry_s, Ms)
            U_s = jnp.full((Tl,), inf)
            sup_ok = -negs < inf

        # ---- expand members + level 2: cluster cull -------------------
        # Member boxes travel as (S, 6, F) ROW blocks — one row gather per
        # tile-slot (~15 G elem/s) instead of Tl*Ms*F scalar gathers
        # (~0.1 G elem/s).
        box_rows = jnp.stack(
            [clx0, cly0, clz0, clx1, cly1, clz1], axis=0
        ).reshape(6, S, F).transpose(1, 0, 2)          # (S, 6, F)
        cand = jnp.take(box_rows, sup_ids, axis=0)     # (Tl, Ms, 6, F)
        cand = cand.reshape(Tl, Ms, 6, F)
        bl = Vec3(cand[:, :, 0].reshape(Tl, Ms * F),
                  cand[:, :, 1].reshape(Tl, Ms * F),
                  cand[:, :, 2].reshape(Tl, Ms * F))
        bh = Vec3(cand[:, :, 3].reshape(Tl, Ms * F),
                  cand[:, :, 4].reshape(Tl, Ms * F),
                  cand[:, :, 5].reshape(Tl, Ms * F))
        cl_ids = (sup_ids[:, :, None] * F
                  + jnp.arange(F, dtype=jnp.int32)[None, None, :]
                  ).reshape(Tl, Ms * F)                # (Tl, Ms*F)
        hit2, entry2 = tile_cull(olo, ohi, dlo, dhi, bl, bh)
        valid2 = (hit2 & any_lane & (cl_ids < K)
                  & jnp.repeat(sup_ok, F, axis=1))
        entry = jnp.where(valid2, entry2, inf)         # (Tl, Ms*F)

        M = min(int(max_clusters), Ms * F)
        if Ms * F > M:
            negv, idxs = jax.lax.top_k(-entry, M + 1)
            U = jnp.minimum(U_s, -negv[:, M])
            negv = negv[:, :M]
            idxs = idxs[:, :M]
        else:
            negv, idxs = jax.lax.top_k(-entry, M)
            U = U_s
        entries = -negv
        slot_ok = entries < inf
        ids = jnp.where(
            slot_ok, jnp.take_along_axis(cl_ids, idxs, axis=1), K
        ).astype(jnp.int32)                            # K = sentinel row
    else:
        cl_lo = Vec3(pd.cl_lo.x[None, :], pd.cl_lo.y[None, :],
                     pd.cl_lo.z[None, :])
        cl_hi = Vec3(pd.cl_hi.x[None, :], pd.cl_hi.y[None, :],
                     pd.cl_hi.z[None, :])

        hit, entry = tile_cull(olo, ohi, dlo, dhi, cl_lo, cl_hi)  # (Tl, K)
        entry = jnp.where(hit & any_lane, entry, inf)

        # ---- shortlist: M nearest candidates (entry-ascending) + dropped-
        # candidate bound U --------------------------------------------------
        M = min(int(max_clusters), K)
        if K > M:
            negv, idxs = jax.lax.top_k(-entry, M + 1)
            U = -negv[:, M]       # min entry among dropped candidates
            negv = negv[:, :M]
            idxs = idxs[:, :M]
        else:
            negv, idxs = jax.lax.top_k(-entry, M)
            U = jnp.full((Tl,), inf)
        entries = -negv           # ascending (top_k of -entry)
        slot_ok = entries < inf
        ids = jnp.where(slot_ok, idxs, K).astype(jnp.int32)  # K = sentinel

    # ---- dense per-slot intersection --------------------------------------
    T = pd.num_tris

    if engine in ("pallas", "pallas_interpret"):
        interpret = engine == "pallas_interpret"
        counts = jnp.sum(slot_ok, axis=1).astype(jnp.int32)
        mrow = m.astype(jnp.float32)

        from .pallas.dense_resident import (
            dense_intersect_resident,
            pack_cluster_boxes,
            pack_clusters_resident,
            resident_fits,
        )

        # Row 7: per-ray search CAP = scene-box exit distance (+ margin).
        # The kernels use it as the closest-fold INIT, so a ray that
        # misses everything stops holding its tile's early exit open once
        # candidates pass its exit point — at zero per-iteration cost
        # (capping the exit CRITERION instead cost ~15-20%/trace; a cap
        # on the init is free). No real hit can exceed the cap: all
        # geometry lies inside the scene box, so any hit t <= exit < cap.
        # Unfound rays return t == cap with tri == -1; _finish restores
        # the MAX_FLOAT miss sentinel from tri < 0.
        def axis_exit(o_, d_, l_, h_):
            ds = jnp.where(jnp.abs(d_) < 1e-30,
                           jnp.where(d_ < 0, -1e-30, 1e-30), d_)
            return jnp.maximum((l_ - o_) / ds, (h_ - o_) / ds)

        slo = Vec3(pd.cl_lo.x.min(), pd.cl_lo.y.min(), pd.cl_lo.z.min())
        shi = Vec3(pd.cl_hi.x.max(), pd.cl_hi.y.max(), pd.cl_hi.z.max())
        cap_row = jnp.maximum(0.0, jnp.minimum(
            jnp.minimum(axis_exit(ox, dx, slo.x, shi.x),
                        axis_exit(oy, dy, slo.y, shi.y)),
            axis_exit(oz, dz, slo.z, shi.z))) * 1.0001 + 1e-4
        if t_cap is not None:
            # caller cap (visibility queries): tighter of the two. The fold
            # never finds t >= the init, so capped hits report as miss.
            cap_row = jnp.minimum(
                cap_row, padv(jnp.asarray(t_cap, jnp.float32),
                              jnp.inf).reshape(Tl, P))

        rays = jnp.stack(
            [ox, oy, oz, dx, dy, dz, mrow, cap_row], axis=1
        )  # (Tl, 8, P): rays + lane mask (masked lanes must not block the
        #    kernel's early exit) + search cap; lane-dim P keeps it unpadded
        bw = intersector == "bw"
        from .pallas.dense_resident import pack_clusters_resident_bw
        pack = pack_clusters_resident_bw if bw else pack_clusters_resident
        if resident_pack is not None:
            packed, boxes = resident_pack
        else:
            packed, boxes = pack(pd), pack_cluster_boxes(pd)
        if use_super:
            from .pallas.dense_resident import (
                dense_intersect_resident_super,
            )

            t_best, tri_best = dense_intersect_resident_super(
                ids, counts, entries, rays, packed,
                boxes, pd.num_tris, F, interpret=interpret,
                bw=bw, vis_band=float(vis_band),
            )
        elif C % 128 == 0 and resident_fits(K, C):
            # whole scene pinned in VMEM: every slot is pure VPU work
            t_best, tri_best = dense_intersect_resident(
                ids, counts, entries, rays, packed,
                boxes, pd.num_tris, interpret=interpret,
                bw=bw, vis_band=float(vis_band),
                warm_start=warm_start, ray_groups=ray_groups,
            )
        else:
            from .pallas.dense import dense_intersect

            t_best, tri_best = dense_intersect(
                ids, counts, entries, rays, packed,
                boxes, pd.num_tris, interpret=interpret,
                bw=bw, vis_band=float(vis_band),
                warm_start=warm_start, ray_groups=ray_groups,
            )
        return _finish(o, d, t_best, tri_best, mask, U, fine_td, R, Tl, P,
                       t_cap=t_cap, intersector=intersector,
                       need_out=_need_out, vis=vis_band > 0.0)

    o_b = Vec3(ox[:, :, None], oy[:, :, None], oz[:, :, None])
    d_b = Vec3(dx[:, :, None], dy[:, :, None], dz[:, :, None])

    if intersector == "bw":
        # one-time (K+1, C) precompute; the slot scan then gathers the
        # cheap precomputed rows (same single-source formula as the packs)
        p_n, p_m1, p_m2 = bw_precompute(pd.e1, pd.e2)

    def slot(carry, sid):  # sid: (Tl,)
        t_best, tri_best = carry  # (Tl, P)
        tids = jnp.take(pd.tri, sid, axis=0)  # (Tl, C)

        def mid(v):
            g = gather(v, sid)    # (Tl, C)
            return Vec3(g.x[:, None, :], g.y[:, None, :], g.z[:, None, :])

        if intersector == "bw":
            ts = ray_triangle_bw(o_b, d_b, mid(pd.v0),
                                 mid(p_n), mid(p_m1), mid(p_m2))
        else:
            ts = ray_triangle(o_b, d_b, mid(pd.v0), mid(pd.e1), mid(pd.e2))
        # ts: (Tl, P, C)
        valid = (
            (tids[:, None, :] < T)
            & (ts > 0.0)
            & (ts <= t_best[:, :, None])
            & m[:, :, None]
        )
        ts = jnp.where(valid, ts, MAX_FLOAT)
        tids_b = jnp.broadcast_to(tids[:, None, :], ts.shape)
        t_new, tri_new = _closest_update(
            ts.reshape(-1, C), tids_b.reshape(-1, C),
            t_best.reshape(-1), tri_best.reshape(-1),
        )
        return (t_new.reshape(Tl, P), tri_new.reshape(Tl, P)), None

    init = (
        jnp.full((Tl, P), MAX_FLOAT, jnp.float32),
        jnp.full((Tl, P), -1, jnp.int32),
    )
    (t_best, tri_best), _ = jax.lax.scan(slot, init, ids.T)
    return _finish(o, d, t_best, tri_best, mask, U, fine_td, R, Tl, P,
                   t_cap=t_cap, intersector=intersector,
                   need_out=_need_out)


def _finish(o, d, t_best, tri_best, mask, U, fine_td, R, Tl, P,
            t_cap=None, intersector: str = "bw", need_out: bool = False,
            vis: bool = False):
    """Trim padding, apply the lane mask, the t-cap, and the fallback.

    ``need_out=True`` skips the fallback and instead returns the mask of
    rays whose result could still be beaten by a dropped candidate (the
    multi-round splitting in trace_packets re-traces exactly those)."""
    t_flat = t_best.reshape(-1)[:R]
    tri_flat = tri_best.reshape(-1)[:R]
    t_flat = jnp.where(mask, t_flat, MAX_FLOAT)
    tri_flat = jnp.where(mask, tri_flat, -1)
    # rays whose fold never beat the search-cap init carry t == cap with
    # tri == -1: restore the canonical miss sentinel
    t_flat = jnp.where(tri_flat < 0, MAX_FLOAT, t_flat)
    if vis:
        # visibility mode: lanes the kernels retired as provably occluded
        # carry the masked sentinel; normalize to the vis-mode occluded
        # report t = -1.0 (|-1 - len| > eps for any len >= 0, so the band
        # decision is identical to a closest-hit query's; tri keeps the
        # occluder found at retirement). Must happen BEFORE need_fb: the
        # sentinel would otherwise compare against U, but a retired lane
        # can never need the fallback (its decision is final).
        t_flat = jnp.where(
            mask & (t_flat < -1.0e38), jnp.float32(-1.0), t_flat)
    u_ray = jnp.broadcast_to(U[:, None], (Tl, P)).reshape(-1)[:R]
    # >= (not >): when the best hit t EQUALS a dropped cluster's conservative
    # entry, an equal-t triangle with a lower index could live in that
    # cluster, and the lower-index tie-break contract requires checking it.
    # With a caller t_cap the comparison uses min(t, cap): dropped clusters
    # whose entry is at/beyond the cap can only hold hits the capped query
    # reports as miss anyway — no fallback needed for those rays.
    t_eff = t_flat if t_cap is None else \
        jnp.minimum(t_flat, jnp.asarray(t_cap, jnp.float32))
    need_fb = mask & (t_eff >= u_ray)

    def _apply_cap(t_f, tri_f):
        if t_cap is None:
            return t_f, tri_f
        beyond = t_f >= jnp.asarray(t_cap, jnp.float32)
        return (jnp.where(beyond, MAX_FLOAT, t_f),
                jnp.where(beyond, -1, tri_f))

    if need_out:
        t_flat, tri_flat = _apply_cap(t_flat, tri_flat)
        return Hit(tri=tri_flat, t=t_flat), need_fb

    # ---- overflow fallback (unconditional correctness) ---------------------
    if fine_td is not None:
        fb = trace(o, d, fine_td, mask=need_fb, intersector=intersector)
        t_flat = jnp.where(need_fb, fb.t, t_flat)
        tri_flat = jnp.where(need_fb, fb.tri, tri_flat)

    t_flat, tri_flat = _apply_cap(t_flat, tri_flat)
    return Hit(tri=tri_flat, t=t_flat)
