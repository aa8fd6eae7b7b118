"""Device-side (JAX/XLA/Pallas) compute kernels."""

from . import fast, features, hamming, image, orb, ransac, select, verify  # noqa: F401
