"""Pallas TPU kernel: dense per-tile cluster intersection.

This is the hot inner loop of packet traversal (ops/packets.py) moved into
a hand-written kernel. The pure-XLA slot scan has three structural costs the
kernel removes:

1. **Lockstep slots** — XLA's ``lax.scan`` over shortlist slots makes every
   tile pay for the *longest* shortlist. Here each tile runs a
   ``while_loop`` over its OWN candidate list.
2. **No early exit** — the shortlist arrives sorted by conservative entry
   distance, so the tile stops as soon as every ray's current best hit is
   closer than the next cluster could possibly be. A primary-ray tile with
   100 candidates typically folds 2-5 clusters and leaves.
3. **HBM intermediates** — the (tiles, P, C) Moller-Trumbore candidate
   tensor never exists: each (C, P) block lives in VMEM/registers and is
   folded into the running (1, P) closest-hit immediately.

Each candidate additionally gets a per-tile **box pre-test** (the cluster
AABB rides inside its packed block): ~20 VPU ops against the full (C, P)
Moller-Trumbore sweep, so clusters that no ray in the tile can touch cost
only their (overlapped) DMA.

Cluster triangle blocks are DMA'd from HBM on demand, double-buffered so
the DMA of slot s+1 overlaps the intersection math of slot s. Shortlists
are staged per tile-group from HBM into SMEM scratch (they are too large
for the scalar-prefetch channel at scale).

Data layout (built by ``pack_clusters``): one cluster = a contiguous
(C, 128) f32 block — triangles along sublanes; lanes 0-8 = v0/e1/e2 xyz,
lane 9 = triangle ids (bitcast), lanes 10-15 = the cluster AABB
(lo.xyz/hi.xyz, replicated down the sublanes). Rays are (6, P) per tile:
o.xyz/d.xyz rows, rays along lanes.

Intersection semantics are identical to ops/intersect.ray_triangle and the
closest-fold to ops/traversal._closest_update (same formulas — but Mosaic
may fuse multiplies differently than XLA, so cross-engine agreement is
ULP-level on t; the integration layer treats this engine and the XLA slot
scan as interchangeable).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ...utils.constants import EPS_PARALLEL, MAX_FLOAT

# plain int, not jnp.int32: a module-level jnp constant would be captured
# by the kernel as a traced constant, which pallas_call rejects
_TRI_SENTINEL = 0x7FFFFFFF
_LANES = 128       # Mosaic DMA slices must be lane-aligned
_TILE_GROUP = 8    # tiles per grid step (sublane-divisibility of blocks)
_NBUF = 4          # cluster DMA pipeline depth
MAX_SHORTLIST = 4095  # shortlist cap; SMEM row width adapts to the
#                       actual M (multiples of 128 lanes)
_ID_OFFSET = float(1 << 23)  # exact-integer float window for triangle ids
MAX_TRIS = (1 << 23) - 2     # ids (incl. the pad id T) must stay exact
_MASKED_T_INIT = -3.0e38  # masked lanes start below any real t so they
#                           never update and never block the early exit


def pack_clusters(pd) -> jnp.ndarray:
    """PacketData -> (K+1, C, 128) f32 contiguous cluster blocks.

    Triangles along the sublane axis; lanes 0-9 = v0/e1/e2 xyz + ids,
    lanes 10-15 = cluster AABB (broadcast down sublanes). Lane-padded to
    128 so the per-cluster DMA slice (1, C, 128) is aligned. The 8x padding
    costs HBM capacity only (32 KB/cluster at C=64); DMA time is still
    ~45 ns/cluster at HBM bandwidth."""
    # Transport ids as exact float VALUES (id + 2^23), not bitcasts: small
    # ids bitcast to f32 are denormals, and the TPU flushes denormals to
    # zero whenever a relayout/copy touches them. f32 holds integers up to
    # 2^24 exactly, so ids < 2^23 survive the +2^23 offset losslessly.
    K1, C = pd.tri.shape
    ids_f = (pd.tri.astype(jnp.float32) + _ID_OFFSET)

    def rep(v):  # (K,) -> (K+1, C) with a zero sentinel row
        v = jnp.concatenate([v, jnp.zeros((1,), v.dtype)])
        return jnp.broadcast_to(v[:, None], (K1, C))

    packed = jnp.stack(
        [pd.v0.x, pd.v0.y, pd.v0.z,
         pd.e1.x, pd.e1.y, pd.e1.z,
         pd.e2.x, pd.e2.y, pd.e2.z,
         ids_f,
         rep(pd.cl_lo.x), rep(pd.cl_lo.y), rep(pd.cl_lo.z),
         rep(pd.cl_hi.x), rep(pd.cl_hi.y), rep(pd.cl_hi.z)], axis=2
    )  # (K+1, C, 15)
    A = packed.shape[2]
    return jnp.concatenate(
        [packed, jnp.zeros((K1, C, _LANES - A), jnp.float32)], axis=2
    )


def _mt_fold(cl, ox, oy, oz, dx, dy, dz, t_best, id_best, num_tris):
    """One cluster block (C, 128) against one ray tile (1, P) -> fold into
    the running closest hit ((1, P) f32, (1, P) i32)."""
    v0x = cl[:, 0:1]
    v0y = cl[:, 1:2]
    v0z = cl[:, 2:3]
    e1x = cl[:, 3:4]
    e1y = cl[:, 4:5]
    e1z = cl[:, 5:6]
    e2x = cl[:, 6:7]
    e2y = cl[:, 7:8]
    e2z = cl[:, 8:9]
    tid = (cl[:, 9:10] - _ID_OFFSET).astype(jnp.int32)

    # Moller-Trumbore, formulas identical to ops/intersect.ray_triangle
    # (modelLoader.h:49-123 semantics: |a| < 1e-5 parallel cutoff, strict
    # negative-barycentric rejection, no t>0 check here).
    qx = dy * e2z - dz * e2y          # q = cross(d, e2) -> (C, P)
    qy = dz * e2x - dx * e2z
    qz = dx * e2y - dy * e2x
    a = e1x * qx + e1y * qy + e1z * qz
    parallel = jnp.abs(a) < EPS_PARALLEL
    inv_a = jnp.where(parallel, 0.0, 1.0 / jnp.where(parallel, 1.0, a))
    sx = (ox - v0x) * inv_a           # s = (o - v0) * inv_a -> (C, P)
    sy = (oy - v0y) * inv_a
    sz = (oz - v0z) * inv_a
    rx = sy * e1z - sz * e1y          # r = cross(s, e1)
    ry = sz * e1x - sx * e1z
    rz = sx * e1y - sy * e1x
    b0 = sx * qx + sy * qy + sz * qz
    b1 = rx * dx + ry * dy + rz * dz
    b2 = 1.0 - b0 - b1
    reject = parallel | (b0 < 0.0) | (b1 < 0.0) | (b2 < 0.0)
    t = e2x * rx + e2y * ry + e2z * rz
    ts = jnp.where(reject, MAX_FLOAT, t)

    valid = (tid < num_tris) & (ts > 0.0) & (ts <= t_best)
    ts = jnp.where(valid, ts, MAX_FLOAT)

    # closest fold with lower-index tie-break (traversal._closest_update)
    t_new = jnp.min(ts, axis=0, keepdims=True)             # (1, P)
    is_min = (ts == t_new) & (ts < MAX_FLOAT)
    id_new = jnp.min(
        jnp.where(is_min, tid, _TRI_SENTINEL), axis=0, keepdims=True
    )
    better = (t_new < t_best) | (
        (t_new == t_best) & (id_new < id_best)
        & (id_new < _TRI_SENTINEL) & (id_best >= 0)
    )
    t_out = jnp.where(better, t_new, t_best)
    id_out = jnp.where(better, id_new, id_best)
    return t_out, id_out


def _box_any_hit(cl, ox, oy, oz, idx, idy, idz, t_best):
    """Does any ray in the tile enter this cluster's AABB before its current
    best hit? ~20 (1, P) VPU ops — the cheap gate before the (C, P) MT."""
    blox = cl[0:1, 10:11]
    bloy = cl[0:1, 11:12]
    bloz = cl[0:1, 12:13]
    bhix = cl[0:1, 13:14]
    bhiy = cl[0:1, 14:15]
    bhiz = cl[0:1, 15:16]
    tx0 = (blox - ox) * idx
    tx1 = (bhix - ox) * idx
    ty0 = (bloy - oy) * idy
    ty1 = (bhiy - oy) * idy
    tz0 = (bloz - oz) * idz
    tz1 = (bhiz - oz) * idz
    tmin = jnp.maximum(
        jnp.maximum(jnp.minimum(tx0, tx1), jnp.minimum(ty0, ty1)),
        jnp.minimum(tz0, tz1),
    )
    tmax = jnp.minimum(
        jnp.minimum(jnp.maximum(tx0, tx1), jnp.maximum(ty0, ty1)),
        jnp.maximum(tz0, tz1),
    )
    hit = (tmin <= tmax) & (tmax >= 0.0) & (tmin <= t_best)
    return jnp.any(hit)


def _kernel(meta_ref, rays_ref, slid_hbm, slent_hbm, cl_hbm,
            t_out, id_out, slid, slent, sl_sem, buf, sem):
    i = pl.program_id(0)
    num_tris = meta_ref[0]
    P = rays_ref.shape[2]
    G = _TILE_GROUP
    W = slid.shape[1]  # 512

    # Stage this group's shortlists (ids+count, entry distances) into SMEM.
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
        tile = rays_ref[pl.ds(g, 1)].reshape(8, P)
        ox = tile[0:1, :]
        oy = tile[1:2, :]
        oz = tile[2:3, :]
        dx = tile[3:4, :]
        dy = tile[4:5, :]
        dz = tile[5:6, :]
        lane_on = tile[6:7, :] > 0.5

        # guarded reciprocals (same fix as dense_resident.py): an exactly
        # axis-aligned ray with origin on a cluster slab plane would produce
        # 0*inf = NaN in _box_any_hit, all comparisons go False, and the
        # gate would UNconservatively skip a cluster that may hold the hit
        def _inv(d_):
            return 1.0 / jnp.where(jnp.abs(d_) < 1e-30,
                                   jnp.where(d_ < 0, -1e-30, 1e-30), d_)

        idx = _inv(dx)
        idy = _inv(dy)
        idz = _inv(dz)

        def dma(slot, s):
            return pltpu.make_async_copy(
                cl_hbm.at[slid[g, 1 + s]], buf.at[slot], sem.at[slot]
            )

        # pipeline warm-up: _NBUF-1 cluster fetches in flight (the last
        # buffer stays free so a new start never lands on the slot the
        # current iteration is reading)
        for w in range(_NBUF - 1):
            @pl.when(w < cnt)
            def _(w=w):
                dma(w, w).start()

        def cond(carry):
            s, done, t_best, id_best = carry
            return jnp.logical_not(done)

        def body(carry):
            s, done, t_best, id_best = carry
            slot = jax.lax.rem(s, _NBUF)

            # keep the pipeline _NBUF-1 deep; index s+_NBUF-1 lands in slot
            # (s-1) mod _NBUF — never the slot this iteration reads.
            # Stragglers are drained after the loop on early exit.
            @pl.when(s + _NBUF - 1 < cnt)
            def _():
                dma(jax.lax.rem(s + _NBUF - 1, _NBUF), s + _NBUF - 1).start()

            dma(slot, s).wait()
            cl = buf[slot]

            plausible = _box_any_hit(cl, ox, oy, oz, idx, idy, idz, t_best)
            t_best, id_best = jax.lax.cond(
                plausible,
                lambda tb, ib: _mt_fold(cl, ox, oy, oz, dx, dy, dz,
                                        tb, ib, num_tris),
                lambda tb, ib: (tb, ib),
                t_best, id_best,
            )

            # early exit: the shortlist is entry-sorted, so once every
            # ray's best hit is closer than the next cluster's conservative
            # entry, nothing later can matter
            nxt = s + 1
            exhausted = nxt >= cnt
            next_entry = slent[g, jnp.minimum(nxt, W - 1)]
            t_max = jnp.max(t_best)
            # strict <: at t_max == next_entry an equal-t lower-index
            # triangle could still live in the next cluster (tie-break)
            done = exhausted | (t_max < next_entry)
            return nxt, done, t_best, id_best

        init = (
            jnp.int32(0),
            cnt == 0,
            # masked lanes start below any real t: they never update and
            # never hold the early exit open; live lanes start at their
            # search cap (row 7: scene-exit distance, see ops/packets.py)
            jnp.where(lane_on, jnp.minimum(MAX_FLOAT, tile[7:8, :]),
                      _MASKED_T_INIT),
            jnp.full((1, P), -1, jnp.int32),
        )
        s_end, _, t_best, id_best = jax.lax.while_loop(cond, body, init)

        # drain prefetches left in flight by an early exit
        def drain(s, _):
            @pl.when(s < cnt)
            def _():
                dma(jax.lax.rem(s, _NBUF), s).wait()
            return 0

        jax.lax.fori_loop(s_end, s_end + _NBUF - 1, drain, 0)

        t_out[pl.ds(g, 1), :] = t_best
        id_out[pl.ds(g, 1), :] = id_best
        return 0

    jax.lax.fori_loop(0, G, one_tile, 0)


@functools.partial(jax.jit, static_argnames=("interpret",))
def dense_intersect(ids, counts, entries, rays, cl_packed, num_tris,
                    interpret: bool = False):
    """Run the dense intersection kernel.

    ids:       (Tl, M) i32 shortlist, sorted by conservative entry distance
    counts:    (Tl,) i32 — candidates per tile (<= M <= MAX_SHORTLIST)
    entries:   (Tl, M) f32 — conservative entry distance per slot (+inf pad)
    rays:      (Tl, 8, P) f32 — o.xyz / d.xyz / lane-mask / pad
    cl_packed: (K+1, C, 128) f32 from pack_clusters
    num_tris:  () i32 (pad-slot filter)

    Returns (t (Tl, P) f32, tri (Tl, P) i32) — closest hit per ray over the
    shortlisted clusters only (caller handles the overflow fallback).
    """
    Tl, M = ids.shape
    P = rays.shape[2]
    C = cl_packed.shape[1]
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

    Tp = -(-Tl // G) * G
    if Tp != Tl:
        slid = jnp.concatenate(
            [slid, jnp.zeros((Tp - Tl, W), jnp.int32)], axis=0)
        slent = jnp.concatenate(
            [slent, jnp.full((Tp - Tl, W), jnp.inf, jnp.float32)], axis=0)
        rays = jnp.concatenate(
            [rays, jnp.zeros((Tp - Tl, 8, P), rays.dtype)], axis=0)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,   # meta only (shortlists ride HBM -> SMEM)
        grid=(Tp // G,),
        in_specs=[
            pl.BlockSpec(
                (G, 8, P), lambda i, *_: (i, 0, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(memory_space=pl.ANY),  # shortlist ids
            pl.BlockSpec(memory_space=pl.ANY),  # shortlist entries
            pl.BlockSpec(memory_space=pl.ANY),  # cl_packed stays in HBM
        ],
        out_specs=[
            pl.BlockSpec((G, P), lambda i, *_: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((G, P), lambda i, *_: (i, 0),
                         memory_space=pltpu.VMEM),
        ],
        scratch_shapes=[
            pltpu.SMEM((G, W), jnp.int32),
            pltpu.SMEM((G, W), jnp.float32),
            pltpu.SemaphoreType.DMA((2,)),
            pltpu.VMEM((_NBUF, C, _LANES), jnp.float32),  # DMA pipeline
            pltpu.SemaphoreType.DMA((_NBUF,)),
        ],
    )
    t, tri = pl.pallas_call(
        _kernel,
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct((Tp, P), jnp.float32),
            jax.ShapeDtypeStruct((Tp, P), jnp.int32),
        ],
        interpret=interpret,
    )(meta, rays, slid, slent, cl_packed)
    return t[:Tl], tri[:Tl]
