from chiron_tpu.ops.ctc_greedy import greedy_decode  # noqa: F401
from chiron_tpu.ops.ctc_loss import ctc_focal_loss, ctc_loss  # noqa: F401
from chiron_tpu.ops.ctc_mc import (  # noqa: F401
    best_path_decode,
    mc_decode,
    section_decoding,
)
