from raindrop_tpu.ops.segment import (  # noqa: F401
    segment_sum,
    segment_max,
    segment_softmax,
)
from raindrop_tpu.ops.pe import time_positional_encoding  # noqa: F401
