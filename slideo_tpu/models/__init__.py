"""Matcher model families."""

from . import orb_matcher  # noqa: F401
