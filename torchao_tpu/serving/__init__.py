from torchao_tpu.serving.engine import Request, ServingEngine  # noqa: F401
