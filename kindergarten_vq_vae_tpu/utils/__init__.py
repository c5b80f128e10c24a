from kindergarten_vq_vae_tpu.utils import consts
from kindergarten_vq_vae_tpu.utils.metrics import seq_acc, seq_acc_masked, codebook_perplexity
from kindergarten_vq_vae_tpu.utils.tensor import replace_pct_rand_values, replace_pct_rand_columns
from kindergarten_vq_vae_tpu.utils.params import (
    n_params,
    n_trainable_params,
    n_not_trainable_params,
    params_summary_dict,
    params_summary_print,
)
