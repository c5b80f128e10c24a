from kindergarten_vq_vae_tpu.analyses.common import load_run, batched_apply
from kindergarten_vq_vae_tpu.analyses.disentanglement import unsupervised_vq_disentanglement
from kindergarten_vq_vae_tpu.analyses.max_acc import get_max_acc_sentences
from kindergarten_vq_vae_tpu.analyses.traversals import latent_traversals_shelgon
from kindergarten_vq_vae_tpu.analyses.arithmetic import (
    latent_arithmetic_bagon,
    latent_arithmetic_shelgon_conditioning,
    latent_arithmetic_shelgon_sentence,
)
from kindergarten_vq_vae_tpu.analyses.cross_attention import (
    extract_cross_attention,
    plot_cross_attention,
)
from kindergarten_vq_vae_tpu.analyses.latent_space import (
    compute_sentence_latents,
    latent_space_visualization,
)
