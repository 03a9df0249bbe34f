"""Hand-tuned Pallas TPU kernels (L2 compute, SURVEY.md §2.1).

Each kernel here is the TPU-native re-expression of one of the reference's
HLSL fragment passes; the pure-jnp twins living next to the physics modules
are the correctness anchors the kernels are tested against.
"""

from tpu_ocean.ops.gerstner_pallas import gerstner_pallas

__all__ = ["gerstner_pallas"]
