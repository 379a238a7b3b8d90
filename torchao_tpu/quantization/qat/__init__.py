from torchao_tpu.quantization.qat.api import (  # noqa: F401
    QATConfig,
    QATFakeQuantizedArray,
)
from torchao_tpu.quantization.qat.fake_quantize_config import (  # noqa: F401
    Float8FakeQuantizeConfig,
    IntxFakeQuantizeConfig,
)
