"""Typed configuration for the slideo-tpu matching engine.

Every algorithmic constant of the reference implementation is lifted into this
config with the reference's exact default value, because output fidelity
depends on them.  Reference locations (in /root/reference):

- ORB params:            crates/matching-opencv/src/feature_extractor.rs:13-23
- LSH / kNN params:      crates/matching-opencv/src/flann.rs:15-21, lib.rs:266
- ratio filter 1.05:     crates/matching-opencv/src/lib.rs:275
- top-40 candidates:     crates/matching-opencv/src/lib.rs:295
- RANSAC 3.0/2000/0.99/10: crates/matching-opencv/src/image_utils.rs:52
- rating>50, ratio>0.2:  crates/matching-opencv/src/lib.rs:333
- similarity>0.5:        crates/matching-opencv/src/lib.rs:381
- frame dedup 0.98:      crates/matching-opencv/src/video_capture.rs:98
- sample interval 5 s:   crates/matching-opencv/src/lib.rs:145,175
- small-image area 300*400: crates/matching-opencv/src/image_utils.rs:11
"""

from __future__ import annotations

import dataclasses
from functools import cached_property


@dataclasses.dataclass(frozen=True)
class OrbConfig:
    """ORB-style feature extraction (reference: feature_extractor.rs:13-23)."""

    n_features: int = 2000          # max keypoints per image
    scale_factor: float = 1.2       # pyramid scale between levels
    n_levels: int = 8               # pyramid levels
    edge_threshold: int = 62        # border (px, per level) where no keypoints live
    fast_threshold: int = 20        # FAST-9/16 intensity threshold
    patch_size: int = 62            # orientation patch diameter
    # TPU-specific (static-shape) knobs: keypoint slots are padded to this.
    max_keypoints: int = 2048       # fixed keypoint slot count (>= n_features)
    # Frame-side query-count buckets: real lecture frames carry ~200-700
    # keypoints (reference BACKGROUND.md:11) while everything pads to
    # max_keypoints. match_frame picks the smallest bucket >= the frame's
    # valid-keypoint count at runtime (lax.switch), so description + the
    # [Q, S] match table run at the frame's true size. Exact: a bucket always
    # covers every valid keypoint. max_keypoints is always the last bucket.
    query_buckets: tuple[int, ...] = (768,)
    # (r5: detect_batch knob deleted — batched pyramid+FAST launches measured
    # SLOWER on v5e at batch 64, 133 vs 142 fps: the (B, bands) grid
    # serializes the per-band DMA pipeline across frames while per-frame
    # lax.map lets XLA overlap launches. score_map_batch survives as a
    # library op for profiling tools; production always maps per frame.)
    fast_polarity_fused: bool = True  # interleave the FAST kernel's
                                    # bright/dark van Herk chains (one read
                                    # of each diff plane per chain step;
                                    # identical scores — scheduling only).
                                    # v5e A/B: 366.9 vs 390.7 ms/batch-64
                                    # (r4, tools/bench_config_ab.py).
    fast_chunk_w: int = 640         # FAST kernel column-chunk width (lane
                                    # multiple of 128). 640 divides 1920
                                    # exactly — no 2048 round-up columns.
                                    # v5e A/B: 370.4 vs 390.7 ms/batch-64;
                                    # composes with fused polarity (362.1).
    fast_sparse_skip: bool = True   # per-(band, chunk) compass-pretest
                                    # early-out in the FAST kernel: a chunk
                                    # with no pixel whose adjacent compass
                                    # tap pair clears the threshold provably
                                    # has an all-zero score map and skips
                                    # the van Herk chains entirely. EXACT
                                    # (bit-equal on chip, both content
                                    # regimes). v5e pyramid+FAST A/B at
                                    # batch 8: realistic lecture content
                                    # 4.46 -> 3.52 ms/frame (only ~18% of
                                    # tiles hold candidates); worst-case
                                    # corner-dense 4.45 -> 4.93 (pretest
                                    # overhead) — the production regime
                                    # (BACKGROUND.md:11, 200-700 kps) is
                                    # the sparse one.
    fast_min_first: bool = False    # run the FAST van Herk chains on RAW
                                    # circle taps and subtract the center
                                    # once from the window extrema (exact
                                    # f32 subtract of bf16 operands),
                                    # instead of materializing 16 rounded
                                    # (tap - center) bf16 diff planes:
                                    # ~13 fewer VPU plane-ops per chunk.
                                    # Bit-equal to the diff form wherever
                                    # pixels are integers (pyramid level 0);
                                    # on resized upper levels the single
                                    # late subtract is STRICTLY less rounded
                                    # than the per-tap bf16 diffs, so
                                    # borderline scores can differ by 1 ulp.
                                    # Gates: test_pallas_fast minfirst
                                    # parity, golden fixtures, production
                                    # oracle A/B. Off until the chip A/B
                                    # lands (NOTES.md round 5).
    atlas_bf16: bool = True         # store the pyramid atlas as bfloat16:
                                    # halves the FAST sweep's DMA + tap-plane
                                    # VMEM traffic. Level-0 pixels (integers
                                    # <= 255) are exact in bf16; upper-level
                                    # resized pixels round at the same ~0.5
                                    # scale the describe kernel's bf16
                                    # windows already round at. The FAST
                                    # cascade itself is bf16 either way, and
                                    # the Pallas and XLA paths stay mutually
                                    # bit-identical on a bf16 atlas.
                                    # v5e A/B: -6.5 ms alone, -20.5 ms on
                                    # top of polfused+c640 (341.6 vs 390.7
                                    # ms/batch-64); fidelity gates green.
    describe_pass2: str = "sublanes_loop"  # pass-2 epilogue of the fused
                                    # describe kernel (ops/pallas_orb.py):
                                    # "sublanes_loop" stacks windows on
                                    # sublanes so the MXU contracts the full
                                    # 128 window lanes (the "lanes" form
                                    # pads 72->128, 44% wasted passes) and
                                    # the per-keypoint reduce runs over 72
                                    # sublanes instead of 128 lanes with an
                                    # f32 d-cast per block. v5e describe
                                    # marginal at batch 8: 0.51 vs 0.76
                                    # ms/frame ("sublanes" 3-D-reshape form
                                    # 0.85 — rejected). Interpret-mode
                                    # bit-equal; golden/oracle gates
                                    # arbitrate the f32 summation-order
                                    # change on chip.
    descriptor_bits: int = 256      # rBRIEF descriptor length in bits
    blur_ksize: int = 7             # Gaussian blur before description (OpenCV ORB)
    blur_sigma: float = 2.0
    pattern_seed: int = 0x51DE0     # seed of the deterministic BRIEF point pattern

    @cached_property
    def per_level_quota(self) -> tuple[int, ...]:
        """Keypoints allocated per pyramid level, geometric decay like OpenCV ORB.

        n_l proportional to (1/scale_factor)^l, summing to n_features.
        """
        inv = 1.0 / self.scale_factor
        factor = (1 - inv) / (1 - inv ** self.n_levels)
        quotas = []
        remaining = self.n_features
        desired = self.n_features * factor
        for lvl in range(self.n_levels - 1):
            q = min(int(round(desired)), remaining)
            quotas.append(q)
            remaining -= q
            desired *= inv
        quotas.append(remaining)
        return tuple(quotas)


@dataclasses.dataclass(frozen=True)
class MatchConfig:
    """Descriptor matching + verification cascade (reference: lib.rs:249-414)."""

    knn_k: int = 30                 # kNN fan-out per query descriptor (lib.rs:266)
    ratio: float = 1.05             # keep match iff dist < best*1.05 (lib.rs:275)
    top_slides: int = 40            # candidate slides by match count (lib.rs:295)
    max_matches_per_slide: int = 512  # static cap of match slots per candidate (TPU)
    # RANSAC (image_utils.rs:52)
    ransac_threshold: float = 3.0   # inlier reprojection threshold (px)
    # The reference passes max_iters=2000 to OpenCV, but OpenCV's RANSAC
    # early-exits once 0.99 confidence is reached — for any candidate with
    # enough inliers to pass the rating floor (w >= ~0.12 of 512 sampled
    # matches) that is < 320 iterations. 512 parallel hypotheses therefore
    # dominate the reference's effective sampling; the cv2 oracle A/B
    # (tests/test_fidelity_oracle.py) gates assignment parity.
    ransac_iters: int = 512         # hypothesis count (cap; see above).
    # TPU hazard: keep this a power of two. An odd count (measured: 1000)
    # combined with the screened path's native stage-2 table kernel crashed
    # the TPU worker at one toy shape combination (r5 bisection, NOTES.md
    # "Screened-path TPU worker crash") — a compiler-level fault; 512/
    # screen_slides=24/interpret variants all run clean and bit-equal.
    ransac_refine_iters: int = 10   # least-squares refinement iterations
    ransac_seed: int = 0xA5AC       # base PRNG seed (reference uses OpenCV's RNG)
    # Acceptance cascade (lib.rs:329-381)
    top_rated: int = 10             # candidates kept after RANSAC rating
    # Lossless cascade trim: when at most this many candidates have a
    # kept-match count above min_rating, compaction + RANSAC + verification
    # run on that prefix only (lax.cond; candidates are sorted by count
    # desc). EXACT, not approximate: a candidate with <= min_rating kept
    # matches can never have rating (= inlier count <= match count) >
    # min_rating, so it can neither win nor displace a floor-passing
    # candidate from the top-10, nor change best_rating for the ratio test
    # (best_rating is always attained by a floor-passer when one exists).
    # 0 disables — the shipped default: decks whose slides share template
    # chrome (headers/footers) put >8 slides above the 50-match floor on
    # most frames, so the trim branch rarely engages and the duplicated
    # lax.cond branches cost ~2% (v5e A/B, tools/bench_config_ab.py:
    # 140.8 fps with prefix=8 vs 143.6 disabled at 500 slides, batch 64).
    cascade_viable_prefix: int = 0
    min_rating: float = 50.0        # required inlier count
    min_rating_ratio: float = 0.2   # required rating / best rating
    min_similarity: float = 0.5     # required warped-image similarity
    verify_stride: int = 2          # verification sampling stride over the
                                    # thumbnail grid (1 = reference-exact
                                    # dense comparison; 2 = every 2nd pixel,
                                    # 4x less sampling work — measured
                                    # similarity shift < 0.01 vs the 0.5
                                    # threshold; ~2 ms/frame on v5e. The cv2
                                    # oracle gates assignment parity.)
    # Two-stage screening for large decks (TPU-specific; FLANN-LSH analogue,
    # flann.rs:14-26). Stage 1 votes with the strongest frame descriptors
    # against the index (descriptor-bit prefixes over every row by default —
    # see hamming._screen_slides for the mode trade-off); stage 2 runs the
    # exact table over the surviving slides only. Fidelity gates:
    # tests/test_fidelity_oracle.py screened-vs-exact A/B and
    # tests/test_hamming.py screening recall tests.
    screen_above_slides: int = 96   # screen when the deck has more slides than this
    screen_slides: int = 16         # candidate slides surviving stage-1 screening
                                    # (tools/ab_screen.py: 128-bit prefix
                                    # voting matches exact assignments 96/96
                                    # at 500 slides x 96 frames at every
                                    # tested setting incl. this one)
    # (r5: screen_mode="sketch" deleted — measured recall loss at 500 slides
    # with no covering gate; prefix full-K voting is the one screening mode.)
    screen_bits: int = 128          # descriptor prefix bits for stage-1
                                    # voting (128 keeps stage 1 on the fused
                                    # Pallas kernel — lane-aligned — and
                                    # buys recall)
    screen_queries: int = 256       # strongest frame keypoints used for screening
    screen_k_per_slide: int = 2048  # index slots per slide used by stage-1
                                    # voting ("prefix" mode). FULL K: slots
                                    # are ordered level-major (level-0 first)
                                    # and a 512-slot trim measurably loses
                                    # frames whose discriminative matches sit
                                    # on higher pyramid levels / lower-score
                                    # level-0 corners (tools/debug_ab_diff.py:
                                    # true slide ranked 89th at k=512, 1st at
                                    # full K on the failing frame; r3 A/B)
    # Hierarchical stage-1 (batched path only): a cheap strided-K pre-vote
    # over the whole deck keeps screen_prevote_slides candidates per frame,
    # and the full-K vote then runs on those slides only — the stage-1 MXU
    # work drops ~2.7x at 500 slides (the sweep is MXU-bound: the int8
    # contraction pads D=160 to its granularity, so cost scales with S*K,
    # not bits). The pre-vote only needs the true slide in the top-64 of
    # 500 (vs top-16 final) and the strided subsample keeps every pyramid
    # level (unlike the rejected level-major 512-slot trim — config above).
    # Fidelity gates: tools/ab_screen.py 500x144 exact-vs-screened A/B and
    # the production near-duplicate deck test must stay at 0 diffs.
    screen_prevote: bool = False    # off until the chip A/B + fidelity
                                    # gates land (see NOTES.md round 5)
    screen_prevote_slides: int = 64   # survivors of the strided pre-vote
    screen_prevote_k_stride: int = 4  # index-slot stride of the pre-vote
                                      # (keeps all levels; 2048/4=512 slots)
    screen_prevote_queries: int = 128  # strongest queries for the pre-vote
                                       # (subset of screen_queries)
    knn_chunk: int = 65536          # index descriptors per top-k scan chunk


@dataclasses.dataclass(frozen=True)
class SiftConfig:
    """SIFT-family scale-invariant features (second engine; the reference
    has no SIFT — these are this framework's own defaults, see ops/sift.py)."""

    max_keypoints: int = 2048       # fixed keypoint slots (sum of octave quotas)
    n_octaves: int = 5
    octave_quota_decay: float = 0.5  # keypoint quota halves per octave
    sigma0: float = 1.6             # base blur of the scale space
    blur_ksize: int = 9
    contrast_threshold: float = 8.0  # |DoG| floor (on 0..255 pixel scale)
    edge_ratio: float = 10.0        # SIFT r: tr^2/det < (r+1)^2/r
    border: int = 40                # keypoint-free border per octave (px)
    descriptor_radius: float = 12.0  # descriptor support half-width (patch px)
    # Matching (Lowe's ratio test)
    lowe_ratio: float = 0.8
    # Acceptance floor for this engine: Lowe filtering keeps at most one
    # high-precision match per query, so far fewer inliers carry the same
    # evidence as ORB's multi-match counting (MatchConfig.min_rating=50).
    min_rating: float = 10.0


@dataclasses.dataclass(frozen=True)
class VideoConfig:
    """Frame sampling and dedup (reference: video_capture.rs, lib.rs:145)."""

    interval_s: float = 5.0         # sample one frame per interval
    dedup_similarity: float = 0.98  # frame changed iff similarity < this
    small_image_area: int = 300 * 400  # max area of the comparison thumbnails
    batch_size: int = 64            # frames per device batch (amortizes
                                    # the ~30 ms dispatch+fetch floor; the
                                    # pipeline keeps one batch in flight)
    decode_mode: str = "grab"       # "grab" (reference-exact sequential) |
                                    # "chunk" (parallel segmented grab —
                                    # byte-identical frames, recommended on
                                    # multi-core hosts) | "seek" (per-sample
                                    # seeking, needs dense keyframes)
    decode_workers: int = 8         # parallel decode segments ("chunk"/"seek")


@dataclasses.dataclass(frozen=True)
class SlideoConfig:
    orb: OrbConfig = dataclasses.field(default_factory=OrbConfig)
    sift: SiftConfig = dataclasses.field(default_factory=SiftConfig)
    match: MatchConfig = dataclasses.field(default_factory=MatchConfig)
    video: VideoConfig = dataclasses.field(default_factory=VideoConfig)
    engine: str = "orb"             # feature engine: "orb" | "sift"


DEFAULT_CONFIG = SlideoConfig()
