from kindergarten_vq_vae_tpu.ops.vq import (
    VQOutput,
    vector_quantize,
    ema_codebook_update,
    init_codebook,
    kmeans_codebook_init,
)
from kindergarten_vq_vae_tpu.ops.gumbel import gumbel_softmax, gumbel_quantize
from kindergarten_vq_vae_tpu.ops.vq_pallas import fused_vector_quantize, fused_vector_quantize_sharded
from kindergarten_vq_vae_tpu.ops.attention_pallas import fused_mha
