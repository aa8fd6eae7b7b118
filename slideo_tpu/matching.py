"""Engine-neutral matching interfaces — the reference's ``matching`` crate.

The reference keeps a tiny trait layer (crates/matching/src/lib.rs:1-40) so
the compute engine is pluggable (its OpenCV engine implements it; an AKAZE
prototype exists as a second engine). This module is the Python equivalent:
structural protocols for the 3-stage lifecycle

    ImageVideoMatcher.create_video_matcher(images)  -> VideoMatcher
    VideoMatcher.match_images_with_video(video)     -> VideoMatcherTask
    VideoMatcherTask.process()                      -> list[Matching]

plus the ``MatchableImage`` duck type (``get_path()``) and the result record.
``slideo_tpu.app.pipeline.MatchingEngine`` (the ORB/TPU engine) is the
default implementation; alternative engines (e.g. a SIFT-family engine)
plug into the same pipeline by satisfying these protocols.
"""

from __future__ import annotations

from dataclasses import dataclass
from pathlib import Path
from typing import Protocol, Sequence, runtime_checkable

from .app.progress import ProgressReporter, null_reporter

__all__ = [
    "MatchableImage",
    "Matching",
    "ImageVideoMatcher",
    "VideoMatcher",
    "VideoMatcherTask",
]


@runtime_checkable
class MatchableImage(Protocol):
    """An image on disk (reference: lib.rs:31-33)."""

    def get_path(self) -> Path: ...


@dataclass
class Matching:
    """Result record (reference: lib.rs:35-40): image=None = no slide visible."""

    video_ms: int
    video_frame_idx: int
    image: object | None


@runtime_checkable
class VideoMatcherTask(Protocol):
    """A bound (images x video) unit of work (reference: lib.rs:26-29)."""

    def process(self) -> list[Matching]: ...


@runtime_checkable
class VideoMatcher(Protocol):
    """Images prepared; bind videos to it (reference: lib.rs:16-24)."""

    def match_images_with_video(
        self, video_path: Path, reporter: ProgressReporter = null_reporter
    ) -> VideoMatcherTask: ...


@runtime_checkable
class ImageVideoMatcher(Protocol):
    """Engine entry point (reference: lib.rs:7-14)."""

    def create_video_matcher(
        self,
        images: Sequence[MatchableImage],
        reporter: ProgressReporter = null_reporter,
    ) -> VideoMatcher: ...
