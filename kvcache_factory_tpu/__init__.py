"""kvcache_factory_tpu — TPU-native long-context inference with KV compression.

A from-scratch JAX/XLA/Pallas framework with the capabilities of
assassin808/KVCache-Factory: ten prefill-time KV-cache compression policies,
quantized KV caches, Llama/Mistral model support, and the LongBench / RULER /
Needle-in-a-Haystack evaluation surface — redesigned for TPU (static shapes,
fixed-budget padded caches, pjit sharding) rather than ported.
"""

from .config import (CompressionConfig, EngineConfig, GenerationConfig,
                     ModelConfig, QuantConfig, ShardingConfig)

__version__ = "0.1.0"

__all__ = [
    "CompressionConfig", "EngineConfig", "GenerationConfig", "ModelConfig",
    "QuantConfig", "ShardingConfig",
]
