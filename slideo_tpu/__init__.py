"""slideo-tpu: TPU-native slide/video synchronization framework."""

from .config import DEFAULT_CONFIG, MatchConfig, OrbConfig, SlideoConfig, VideoConfig

__version__ = "0.1.0"
