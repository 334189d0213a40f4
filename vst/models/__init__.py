"""vst.models — model zoo (flax.linen, NHWC)."""
