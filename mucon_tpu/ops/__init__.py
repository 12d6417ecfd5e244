from mucon_tpu.ops.eval_fused import build_fused_eval
from mucon_tpu.ops.mucon_loss_pallas import mucon_flint_fused, mucon_flint_pallas
from mucon_tpu.ops.viterbi import (
    dense_viterbi_decode,
    dense_viterbi_decode_batch,
    viterbi_precompute,
)
from mucon_tpu.ops.viterbi_pallas import dense_viterbi_pallas
from mucon_tpu.ops.wavenet_pallas_v2 import (
    pack_wavenet_params,
    wavenet_stack_pallas_v2,
)

__all__ = [
    "build_fused_eval",
    "mucon_flint_fused",
    "mucon_flint_pallas",
    "dense_viterbi_decode",
    "dense_viterbi_decode_batch",
    "viterbi_precompute",
    "dense_viterbi_pallas",
    "pack_wavenet_params",
    "wavenet_stack_pallas_v2",
]
