from kindergarten_vq_vae_tpu.nn.bert import (
    BertConfig,
    BertModel,
    BertLMHeadModel,
    bert_base_config,
)
from kindergarten_vq_vae_tpu.nn.convert_hf import (
    convert_encoder_state_dict,
    convert_decoder_state_dict,
    init_encoder_decoder,
)
