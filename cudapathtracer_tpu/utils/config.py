"""Render configuration.

The reference configures everything at compile time: a #define block
(IMAGE 512x512, NUM_SAMPLES=100, NUM_BOUNCES=3, kernel.cu:28-35) plus
hard-coded scene and camera in main() (kernel.cu:590-648). This dataclass is
the replacement (SURVEY.md §5.6): one frozen, hashable config object passed
as a static jit argument.

Note the reference's sample loop runs sampleNum = 1..NUM_SAMPLES-1, i.e.
NUM_SAMPLES=100 accumulates 99 samples (kernel.cu:709-710). Our ``spp`` is
the honest count of samples actually accumulated.
"""

from __future__ import annotations

from dataclasses import dataclass


@dataclass(frozen=True)
class RenderConfig:
    width: int = 512
    height: int = 512
    spp: int = 99                   # reference-equivalent default (see above)
    num_bounces: int = 3            # kernel.cu:33
    integrator: str = "bdpt"        # 'bdpt' (live, kernel.cu:549) | 'pt_nee'
    traversal: str = "packets"      # 'packets' | 'bvh' | 'brute'
    leaf_size: int = 4
    samples_per_call: int = 1       # progressive granularity (checkpoint unit)
    sample_batch: int = 1           # samples whose BOUNCE RAYS are traced as
    #                                 one jointly-sorted batch: S x the rays
    #                                 per sort window => denser, tighter
    #                                 packet tiles (fewer candidate clusters
    #                                 per tile) and S-amortized fixed costs.
    #                                 Radiance per sample and the accumulation
    #                                 sequence are bit-identical to S=1 (the
    #                                 RNG keys on absolute sample index and
    #                                 updates stay sequential). Costs ~S x
    #                                 transient HBM for the in-flight rays.
    # packet-traversal knobs (ops/packets.py)
    tile_size: int | None = None    # rays per packet tile; None = AUTO by
    #                                 scene size (render/renderer.py): with
    #                                 the r5 subgroup-gated kernel P=256
    #                                 ties P=128 at the kernel level for
    #                                 small scenes and wins at the trace
    #                                 level (half the cull/sort tiles:
    #                                 61.1 vs 54.9 Mrays/s headline), but
    #                                 COLLAPSES at sponza scale (kernel
    #                                 118.9 vs 58.4 ms at 328k — the (P,C)
    #                                 fold doubles and the early exit drags
    #                                 over 256 lanes), so auto picks 256
    #                                 for small scenes, 128 beyond.
    tile_size_vis: int | None = None  # per-call-site tile size for
    #                                 VISIBILITY traces (vis_band > 0 —
    #                                 BDPT's 4R connection batch): its
    #                                 occluded-lane dropout changes the
    #                                 early-exit economics vs closest-hit
    #                                 subpath traces, so the optimum P can
    #                                 differ per call site. None = use
    #                                 tile_size for both.
    vis_dropout: bool = False       # occluded-lane dropout (vis_band) in
    #                                 the Mosaic kernels for visibility
    #                                 traces. Decision-identical either way;
    #                                 measured a ~5% LOSS on the bench BDPT
    #                                 workload (4R shadow batch 24.6 vs 23.4
    #                                 ms without — short shortlists, tight
    #                                 t_caps leave little to retire), so OFF
    #                                 by default; flip for long-shortlist
    #                                 scenes where mid-shortlist retirement
    #                                 can pay (BASELINE.md r4 ledger).
    cluster_size: int | None = None  # triangles per scene cluster; None =
    #                                  adaptive (~T/8192 rounded to 128s —
    #                                  bigger scenes get bigger clusters)
    max_clusters: int = 4095        # shortlist cap per tile (pallas loops
    #                                 only each tile's true candidate count)
    packet_sort: bool = True        # sort rays by octant+origin Morton
    packet_rounds: int = 1          # straggler splitting: early rounds cap
    #                                 each tile's candidate budget; stragglers
    #                                 compact into the next pass. Was a +19%
    #                                 win in r1; the r3 SMEM box gates made
    #                                 over-budget slots nearly free, so r=2
    #                                 is now a net LOSS (68 vs 57 ms/bounce
    #                                 trace at 20k tris, 22.7 -> 26.0 Mrays/s
    #                                 end to end) — default is one round.
    packet_first_round: int = 2     # round-1 candidate budget per tile
    packet_rounds_bdpt: int = 1     # straggler rounds for BDPT's traces.
    #                                 Round 2 measured rounds as a net loss
    #                                 on BDPT's 7 short per-call batches;
    #                                 round 3 batches those into 2 calls
    #                                 (integrators/bdpt.py), so the knob is
    #                                 separately tunable again.
    packet_engine: str = "auto"     # 'auto' | 'pallas' | 'xla' |
    #                                 'pallas_interpret' (CPU debugging)
    two_level_cull: bool | str | None = None  # hierarchical cull.
    #                                 False = flat (Tl, K) cull; True =
    #                                 r3 XLA-side two-level (supercluster
    #                                 shortlist + member expansion under a
    #                                 slot cap — the cap can drop close
    #                                 members on fat tiles and collapse the
    #                                 U bound); 'super' = r4 SUPER
    #                                 SHORTLISTS: the shortlist is in super
    #                                 units and the resident Mosaic kernel
    #                                 expands members behind its per-ray
    #                                 SMEM box gates — no member drops, no
    #                                 U collapse, XLA cull/top_k shrink by
    #                                 F. None = auto (ops/packets.py).
    super_factor: int = 8           # clusters per supercluster (F)
    super_slots: int = 16           # two-level member-expansion slots (Ms)
    super_list: int = 255           # 'super' mode: max supers per tile
    #                                 shortlist (255 = every super of a
    #                                 328k-tri scene at C=256; no drops)
    sort_window: int = 0            # ray-sort window length (0 = one global
    #                                 sort). Windowed sorting trades a hair
    #                                 of tile tightness for a much cheaper
    #                                 sort (bitonic cost is superlinear and
    #                                 windows parallelize); results are
    #                                 bit-identical under any grouping
    #                                 (ops/packets.py). Must be a multiple
    #                                 of tile_size.
    warm_start: int | None = None   # Mosaic kernels: fold the first N
    #                                 entry-sorted slots UNGATED before the
    #                                 gated while loop, so every gate group
    #                                 sees a hit-informed running t instead
    #                                 of the init cap (the first group's
    #                                 gates otherwise pass nearly everything
    #                                 — measured 2-3x the fold budget a
    #                                 fresh-t model predicts). None = env
    #                                 PT_KERNEL_WARM (default 0).
    ray_groups: int | None = None   # Mosaic kernels: gate/fold rays in NS
    #                                 independent subgroups of P/NS rays
    #                                 (one passing ray no longer drags all
    #                                 P through the fold). None = env
    #                                 PT_KERNEL_RAYGROUPS (default 1).
    intersector: str = "bw"         # triangle test: 'bw' (Baldwin-Weber
    #                                 precomputed form — decision-equivalent
    #                                 to the reference's Moller-Trumbore in
    #                                 exact arithmetic, ~20% fewer VPU ops,
    #                                 measured -3%/-7% per trace at 20k/328k
    #                                 tris) | 'mt' (the reference's exact
    #                                 formulation, modelLoader.h:49-123).
    #                                 Every engine runs the selected one, so
    #                                 results stay engine-independent; the
    #                                 two differ only on exact-tie shared
    #                                 edges (t to ~2e-7 relative; §7 ledger).
    # quirk flags (defaults = reference behavior; SURVEY.md §7 ledger)
    orthonormal_frame: bool = False
    light_normal_mode: str = "fixed"
    branch_pdf_correction: bool = False
    jitter: bool = False
    # accumulation
    compensated_accum: bool = True  # Kahan compensation (reference uses f64)
    # primary rays are identical every sample when the camera is a pinhole
    # (radius == 0) and jitter is off — the reference's exact live config
    # (kernel.cu:646, no sub-pixel jitter). With this flag the renderer
    # traces them once per batch instead of once per sample. Set by
    # render()/bench automatically (they see the concrete camera); only
    # valid under the pinhole/no-jitter condition.
    reuse_primary_hit: bool = False

    @property
    def num_pixels(self):
        return self.width * self.height

    def __post_init__(self):
        assert self.width > 0 and (self.width & (self.width - 1)) == 0, (
            "width must be a power of two (Morton indexing)"
        )
        assert self.height > 0 and (self.height & (self.height - 1)) == 0
        assert self.integrator in ("bdpt", "pt_nee")
        assert self.traversal in ("packets", "bvh", "brute")
        assert self.light_normal_mode in ("fixed", "true")
        assert self.packet_engine in ("auto", "pallas", "xla",
                                      "pallas_interpret")
        assert self.intersector in ("bw", "mt")
