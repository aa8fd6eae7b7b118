"""Matcher model families."""

from . import orb_matcher, sift_matcher  # noqa: F401
