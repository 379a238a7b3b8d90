from torchao_tpu.serving.engine import Request, ServingEngine  # noqa: F401
from torchao_tpu.serving.runner import ServingCluster  # noqa: F401
