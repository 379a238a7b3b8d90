from torchao_tpu.prototype.paretoq.api import (  # noqa: F401
    ParetoQConfig,
    ParetoQFakeQuantArray,
    paretoq_train,
)
from torchao_tpu.prototype.paretoq.quantizers import (  # noqa: F401
    init_clip_val,
    lsq_quantize,
    paretoq_fake_quantize,
    stretched_elastic_quantize,
)
