"""Device-side (JAX/XLA/Pallas) compute kernels."""

from . import (  # noqa: F401
    fast,
    features,
    hamming,
    homography,
    image,
    orb,
    pallas_fast,
    ransac,
    select,
    sift,
    verify,
)
