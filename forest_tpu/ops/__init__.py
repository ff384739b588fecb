"""TPU kernels and fused ops: vector quantization, segment ops, whitening, kNN."""

from forest_tpu.ops.vq import (  # noqa: F401
    VQStats,
    ema_codebook_update,
    perplexity_from_counts,
    quantize,
    quantize_ema,
    quantize_st,
    reseed_dead_codes,
    vq_assign,
    vq_core,
)
