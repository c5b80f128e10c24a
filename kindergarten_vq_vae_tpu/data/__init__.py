from kindergarten_vq_vae_tpu.data.generate import generate_dsentences
from kindergarten_vq_vae_tpu.data.prepare import (
    clean_dataset,
    labels_to_one_hot,
    export_vocab,
    word_to_token_id_map,
    find_max_encoded_length,
    prepare_all,
)
from kindergarten_vq_vae_tpu.data.tokenizer import WordTokenizer, WordPieceTokenizer
from kindergarten_vq_vae_tpu.data.dataset import DSentences, split_dataset, BatchIterator
