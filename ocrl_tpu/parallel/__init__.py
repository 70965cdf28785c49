from .mesh import (
    make_mesh,
    batch_sharding,
    replicated_sharding,
    shard_ocr,
    enable_compilation_cache,
)

__all__ = [
    "make_mesh",
    "batch_sharding",
    "replicated_sharding",
    "shard_ocr",
    "enable_compilation_cache",
]
