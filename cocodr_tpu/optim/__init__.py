from cocodr_tpu.optim.lamb import lamb, scale_by_reference_lamb  # noqa: F401
from cocodr_tpu.optim.schedules import (  # noqa: F401
    warmup_constant,
    warmup_cosine,
    warmup_linear,
)
