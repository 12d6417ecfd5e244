"""mucon_tpu — a TPU-native (JAX/XLA/Pallas/pjit) framework for weakly
supervised action segmentation with the capabilities of MuCon
("Fast Weakly Supervised Action Segmentation Using Mutual Consistency",
TPAMI 2021).

Designed TPU-first, not ported: the model is a set of pure-functional Flax
modules driven by `jax.lax.scan`, the hot kernels (dilated temporal conv
stack, mutual-consistency mask loss, Viterbi DP) have fused Pallas
implementations, batching is padded/bucketed with mask-exact losses, and
scale-out goes through `jax.sharding.Mesh` + XLA collectives.

Reference behavior documented against yassersouri/MuCon (see SURVEY.md).
"""

from mucon_tpu.version import __version__

__all__ = ["__version__"]
