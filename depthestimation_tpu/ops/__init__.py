"""TPU-native compute ops: cost volumes, SGM aggregation, WTA, filters,
remap, color — the Pallas/XLA replacements for the reference's OpenCV C++
kernels (SURVEY.md section 2b)."""

from . import color, costs, depth, filters, remap, sgm, wta  # noqa: F401
