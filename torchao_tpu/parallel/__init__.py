from torchao_tpu.parallel.sharding import (  # noqa: F401
    interleave_qkv_params,
    llama_param_specs,
    param_shardings,
    make_mesh,
    shard_params,
    kv_cache_specs,
)
