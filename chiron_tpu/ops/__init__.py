from chiron_tpu.ops.ctc_greedy import greedy_decode  # noqa: F401
from chiron_tpu.ops.ctc_loss import ctc_focal_loss, ctc_loss  # noqa: F401
