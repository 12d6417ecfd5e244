from mucon_tpu.decode.grammar import (
    Grammar,
    ModifiedPathGrammar,
    NGram,
    PathGrammar,
    SingleTranscriptGrammar,
)
from mucon_tpu.decode.length_model import (
    LengthModel,
    MeanLengthModel,
    MultiPoissonModel,
    PoissonModel,
    poisson_log_table,
)
from mucon_tpu.decode.viterbi_host import Segment, Viterbi, ViterbiDecoder

__all__ = [
    "Grammar",
    "NGram",
    "PathGrammar",
    "ModifiedPathGrammar",
    "SingleTranscriptGrammar",
    "LengthModel",
    "MeanLengthModel",
    "PoissonModel",
    "MultiPoissonModel",
    "poisson_log_table",
    "ViterbiDecoder",
    "Viterbi",
    "Segment",
]
