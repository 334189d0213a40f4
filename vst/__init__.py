"""vst — TPU-native video style-transfer framework.

A brand-new JAX / XLA / Pallas / pjit framework with the capabilities of the
reference thesis codebase ``tomstrident/GAN-based-Video-Style-Transfer``
(see SURVEY.md for the blueprint and BASELINE.md for the numbers to beat).

Design rules (TPU-first, not a port):

* **Layout**: all image tensors are NHWC (the TPU-native conv layout). Flow
  fields are ``(B, H, W, 2)`` with channel 0 = x-displacement (u), channel 1 =
  y-displacement (v) — matching the reference's channel meaning, transposed to
  channels-last.
* **Functional**: models are ``flax.linen`` modules; training steps are pure
  functions ``(params, opt_state, batch, rng) -> (params, opt_state, metrics)``
  compiled once under ``jax.jit`` / ``pjit`` over a ``jax.sharding.Mesh``.
* **Precision**: parameters live in float32; matmul/conv compute may run in
  bfloat16 via an explicit policy (``vst.core.precision``).
* **Control flow**: recurrent structure (RAFT GRU iterations, video frame
  scans) uses ``lax.scan`` — static shapes, one trace.
* **Parity**: every op that mirrors a reference call-site documents the exact
  file:line it reproduces, including quirks (mixed align_corners conventions,
  zero-padded central differences, ...). See PARITY.md.
"""

__version__ = "0.1.0"
