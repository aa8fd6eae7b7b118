"""Multi-chip scaling: frame-data-parallel and index-parallel sharding.

The reference's only parallelism is a CPU rayon pool over frames
(crates/matching-opencv/src/lib.rs:174-221, SURVEY.md §2.8). The TPU-native
equivalents here:

- **Frame DP** (primary): shard the frame batch over a 1-D mesh; the slide
  descriptor index is replicated (<=1000 slides x 2048 x 256 int8 = 512 MB,
  fits HBM). No collectives are needed beyond the output gather: each frame's
  result is 3 scalars.

- **Index parallel** (for decks beyond HBM or to cut per-frame latency):
  shard the *descriptor index rows* over the mesh; every device computes
  its local top-k against its shard, then an all_gather + merge produces the
  exact global top-k (the merge of per-shard top-k is exact because the
  global top-k is a subset of the union).

Both compose in a 2-D ("frames", "index") mesh; ICI carries only [Q, k]
top-k tuples, never descriptors.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..config import SlideoConfig
from ..models import orb_matcher
from ..ops import hamming
from ..ops.features import extract_features

__all__ = [
    "initialize_distributed",
    "host_frame_shard",
    "gather_host_matchings",
    "make_mesh",
    "shard_index",
    "match_frames_sharded",
    "match_frames_mesh",
    "knn_index_sharded",
]


def initialize_distributed(
    coordinator_address: str | None = None,
    num_processes: int | None = None,
    process_id: int | None = None,
) -> None:
    """Multi-host initialization (jax.distributed) for pod-slice runs.

    Each host decodes its own shard of the sampled-frame stream and feeds
    its local devices; the slide index is built once and replicated. Only
    per-frame result records ([B] int32 + 2 floats) cross hosts. No-op when
    the arguments are absent and the environment provides no cluster info
    (single-host, the common case).
    """
    import jax

    try:
        if coordinator_address is not None:
            jax.distributed.initialize(
                coordinator_address=coordinator_address,
                num_processes=num_processes,
                process_id=process_id,
            )
        elif any(
            k in __import__("os").environ
            for k in ("COORDINATOR_ADDRESS", "MEGASCALE_COORDINATOR_ADDRESS")
        ):
            jax.distributed.initialize()
    except RuntimeError:
        pass  # already initialized


def host_frame_shard(
    frame_indices: list[int],
    process_index: int | None = None,
    process_count: int | None = None,
) -> list[int]:
    """The contiguous block of sampled-frame indices this host decodes.

    Contiguous blocks (not round-robin) keep the frame-dedup chain local:
    within a block consecutive sampled frames dedup exactly as on a single
    host; each block's first frame has no previous frame so it is matched
    unconditionally, and the final consecutive-duplicate drop
    (lib.rs:229-244) then restores the single-host timeline byte-for-byte.
    Blocks also mean each host decodes one contiguous video span instead of
    seeking across the whole file.
    """
    pi = jax.process_index() if process_index is None else process_index
    pc = jax.process_count() if process_count is None else process_count
    per = -(-len(frame_indices) // pc)
    return frame_indices[pi * per : (pi + 1) * per]


def gather_host_matchings(
    rows: list[tuple[int, int, int]], process_count: int | None = None
) -> list[tuple[int, int, int]]:
    """All-gather per-host result records across processes.

    rows: (frame_idx, video_ms, page_global_idx or -1) int records for this
    host's frame shard. Every host returns the concatenation of all hosts'
    rows (order within a host preserved). Only these tiny int tuples cross
    DCN — descriptors, frames, and thumbnails never leave their host.
    """
    pc = jax.process_count() if process_count is None else process_count
    if pc == 1:
        return list(rows)
    from jax.experimental import multihost_utils

    arr = np.asarray(rows, np.int64).reshape(-1, 3)
    counts = multihost_utils.process_allgather(
        np.asarray([arr.shape[0]], np.int64)
    ).reshape(-1)
    m = int(counts.max()) if counts.size else 0
    pad = np.full((m - arr.shape[0], 3), -1, np.int64)
    gathered = np.asarray(
        multihost_utils.process_allgather(np.concatenate([arr, pad], axis=0))
    ).reshape(pc, m, 3)
    out: list[tuple[int, int, int]] = []
    for p in range(pc):
        for r in gathered[p, : int(counts[p])]:
            out.append((int(r[0]), int(r[1]), int(r[2])))
    return out


def make_mesh(devices=None, axis: str = "frames") -> Mesh:
    """Frame-DP mesh. In a multi-process run each host drives its OWN frame
    shard through host-local loops (different batch counts per host), so the
    mesh must span only this host's devices — a global-device mesh would
    require every host to issue identical collectives. Cross-host exchange
    happens once, at the end, via gather_host_matchings."""
    if devices is None:
        devices = (
            jax.local_devices() if jax.process_count() > 1 else jax.devices()
        )
    return Mesh(np.asarray(devices), (axis,))


def match_frames_sharded(
    mesh: Mesh,
    frames: jax.Array,
    frame_seeds: jax.Array,
    index: orb_matcher.SlideIndex,
    slide_hw: tuple[int, int],
    cfg: SlideoConfig,
) -> orb_matcher.FrameMatch:
    """Frame-data-parallel matching over a 1-D mesh (the production multi-
    chip path — MatchingEngine picks it automatically when the runtime has
    more than one device; reference analogue: the rayon frame pool,
    lib.rs:174-221).

    frames: [B, H, W] with B divisible by the mesh size. The index is passed
    as a replicated argument (never closed over: closed-over device arrays
    are embedded as jit constants); each device runs the full per-frame
    program on its shard.
    """
    axis = mesh.axis_names[0]
    fn = jax.shard_map(
        lambda fr, seeds, idx: orb_matcher.match_frames(
            fr, seeds, idx, slide_hw, cfg
        ),
        mesh=mesh,
        in_specs=(P(axis), P(axis), P()),
        out_specs=P(axis),
        check_vma=False,
    )
    return fn(frames, frame_seeds, index)


def match_frames_sift_sharded(
    mesh: Mesh,
    frames: jax.Array,
    frame_seeds: jax.Array,
    index,
    slide_hw: tuple[int, int],
    cfg: SlideoConfig,
):
    """Frame-data-parallel SIFT matching over a 1-D mesh (the SIFT engine's
    production multi-chip path, same shape as match_frames_sharded: the
    SiftSlideIndex is replicated, each device matches its frame shard)."""
    from ..models import sift_matcher

    axis = mesh.axis_names[0]
    fn = jax.shard_map(
        lambda fr, seeds, idx: sift_matcher.match_frames_sift(
            fr, seeds, idx, slide_hw, cfg
        ),
        mesh=mesh,
        in_specs=(P(axis), P(axis), P()),
        out_specs=P(axis),
        check_vma=False,
    )
    return fn(frames, frame_seeds, index)


def shard_index(
    mesh: Mesh, index: orb_matcher.SlideIndex, axis: str = "index"
) -> orb_matcher.SlideIndex:
    """Place the descriptor index rows on the mesh's ``axis``; keypoint
    tables and thumbnails stay replicated (they are consumed per-candidate)."""
    row_sharding = NamedSharding(mesh, P(axis, None))
    vec_sharding = NamedSharding(mesh, P(axis))
    rep = NamedSharding(mesh, P())
    di = index.desc_index
    return orb_matcher.SlideIndex(
        desc_index=hamming.DescriptorIndex(
            desc=jax.device_put(di.desc, row_sharding),
            slide_ids=jax.device_put(di.slide_ids, vec_sharding),
            train_ids=jax.device_put(di.train_ids, vec_sharding),
            valid=jax.device_put(di.valid, vec_sharding),
        ),
        pts=jax.device_put(index.pts, rep),
        smalls=jax.device_put(index.smalls, rep),
    )


def match_frames_mesh(
    frames: jax.Array,
    frame_seeds: jax.Array,
    index: orb_matcher.SlideIndex,
    *,
    mesh: Mesh,
    slide_hw: tuple[int, int],
    cfg: SlideoConfig,
) -> orb_matcher.FrameMatch:
    """Full match step over a 2-D ("frames", "index") mesh.

    Frames are data-parallel over "frames"; the descriptor index rows are
    sharded over "index". Each device extracts features for its local
    frames, computes top-k against its local index shard, and the exact
    global top-k is recovered with one all_gather of [Q, k] tuples over the
    "index" axis (the heavy descriptor arrays never move). The verification
    cascade then runs replicated within each frame row.
    """
    def body(frames_l, seeds_l, desc_l, sid_l, tid_l, val_l, pts, smalls):
        k_per_slide = pts.shape[1]
        s_local = desc_l.shape[0] // k_per_slide
        local_index = hamming.DescriptorIndex(desc_l, sid_l, tid_l, val_l)
        local_slide_ids = sid_l[::k_per_slide]

        def match_one(args):
            frame, seed = args
            feats = extract_features(frame, cfg.orb)
            # Local best-match table over this device's slide columns, then
            # one all_gather of the tiny [Q, S_local] tables recovers the
            # exact global table (descriptors never cross ICI).
            t = hamming.match_table(
                feats.desc, local_index, s_local, k_per_slide,
                slide_ids=local_slide_ids,
            )
            qn = feats.desc.shape[0]
            cat = lambda a: jax.lax.all_gather(a, "index", axis=1).reshape(qn, -1)
            table = hamming.MatchTable(
                dist=cat(t.dist),
                train=cat(t.train),
                slide_ids=jax.lax.all_gather(t.slide_ids, "index", axis=0).reshape(-1),
                valid=cat(t.valid),
            )
            return orb_matcher.cascade_from_table(
                frame, seed, feats, table, pts, smalls, slide_hw, cfg
            )

        return jax.lax.map(match_one, (frames_l, seeds_l))

    fn = jax.shard_map(
        body,
        mesh=mesh,
        in_specs=(
            P("frames", None, None),
            P("frames"),
            P("index", None),
            P("index"),
            P("index"),
            P("index"),
            P(),
            P(),
        ),
        out_specs=orb_matcher.FrameMatch(
            slide=P("frames"), similarity=P("frames"), rating=P("frames")
        ),
        check_vma=False,
    )
    di = index.desc_index
    return fn(
        frames,
        frame_seeds,
        di.desc,
        di.slide_ids,
        di.train_ids,
        di.valid,
        index.pts,
        index.smalls,
    )


def knn_index_sharded(
    mesh: Mesh,
    query: jax.Array,
    index: hamming.DescriptorIndex,
    k: int,
    chunk: int,
    axis: str = "index",
) -> hamming.KnnResult:
    """Exact global kNN with the index sharded over ``axis``.

    Each device computes top-k against its local index shard (streamed in
    chunks), then the per-shard candidate lists are all_gathered and merged.
    ICI traffic: [Q, k * n_dev] score/id tuples — tiny next to the index.
    """
    n_dev = mesh.shape[axis]
    n_total = index.desc.shape[0]
    d_bits = query.shape[1]

    def local(q, desc, slide_ids, train_ids, valid):
        my = jax.lax.axis_index(axis)
        scores, rows = hamming._chunked_topk_scores(q, desc, valid, k, chunk)
        slide = jnp.take(slide_ids, rows)
        train = jnp.take(train_ids, rows)
        # Gather each shard's candidates and merge to the global top-k.
        all_scores = jax.lax.all_gather(scores, axis, axis=1)  # [Q, n_dev, k]
        all_slide = jax.lax.all_gather(slide, axis, axis=1)
        all_train = jax.lax.all_gather(train, axis, axis=1)
        qn = q.shape[0]
        flat_s = all_scores.reshape(qn, n_dev * k)
        best, sel = jax.lax.top_k(flat_s, k)
        take = lambda a: jnp.take_along_axis(a.reshape(qn, n_dev * k), sel, axis=1)
        dist = (d_bits - best).astype(jnp.float32) * 0.5
        return hamming.KnnResult(
            dist=dist,
            slide=take(all_slide),
            train=take(all_train),
            valid=best > hamming._NEG // 2,
        )

    fn = jax.shard_map(
        local,
        mesh=mesh,
        in_specs=(P(), P(axis, None), P(axis), P(axis), P(axis)),
        out_specs=P(),
        check_vma=False,
    )
    return fn(query, index.desc, index.slide_ids, index.train_ids, index.valid)
