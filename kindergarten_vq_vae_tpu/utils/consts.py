"""Shared constants.

Parity notes (reference: common/consts.py):
- ``DS_GEN_SEED = 69`` is the dataset split seed (common/consts.py:3).
- ``SUPPORTED_VQ_MODES`` (common/consts.py:9).
- Run-dir timestamp format and base dir (common/consts.py:31-33).
"""

DS_GEN_SEED = 69

SUPPORTED_VQ_MODES = ("VectorQuantizer", "GumbelQuantizer")

SUPPORTED_MODEL_MODES = ("full", "dec-head-ft", "enc-head-ft-dec-head-ft", "vq-ft")

RUN_ID_TIMESTAMP_FORMAT = "%Y_%m_%d_%H_%M_%S"

RUNS_BASE_DIR = "./runs"

# dSentences generative factors, raw order (9 factors).
# Derived from datasets/dSentences/dSentences_clean_dataset.py:33 (selection
# [2,5,6,7,8]), dSentences_labels_to_one_hot.py:13 (factor 0 = verb-obj
# interaction, dropped), models/shelgon2/SentenceDiscretizer.py:25-61 (the 8
# kept factors in order) and models/bagon/Trainer.py:202-244 (explicit names
# for the 5 clean factors).
RAW_FACTOR_NAMES = (
    "verb_obj_interaction",   # [0] dropped by one-hot script
    "gram_num_obj",           # [1] singular / plural object
    "sentence_type",          # [2] declarative / interrogative
    "gender",                 # [3] masculine / feminine (3rd person)
    "gram_num_subject",       # [4] singular / plural subject
    "gram_num_person",        # [5] 1st / 2nd / 3rd
    "negation",               # [6] affirmative / negative
    "tense",                  # [7] past / present / future
    "style",                  # [8] not_progressive / progressive
)

# "clean" selection used by the 5-factor (Shelgon) pipeline:
# raw columns [2, 5, 6, 7, 8] (dSentences_clean_dataset.py:33).
CLEAN_FACTOR_COLUMNS = (2, 5, 6, 7, 8)
CLEAN_FACTOR_NAMES = tuple(RAW_FACTOR_NAMES[i] for i in CLEAN_FACTOR_COLUMNS)

# Per-factor support size cap; every factor is one-hotted to 3 values
# (dSentences_labels_to_one_hot.py:19-21).
FACTOR_MAX_SUPPORT = 3

# Human-readable value names for the 5 clean factors
# (models/bagon/Trainer.py:202-244).
EXPLICIT_FACTOR_VALUES = {
    "sentence_type": ("declarative", "interrogative"),
    "grammatical_number_person": ("1st", "2nd", "3rd"),
    "sentence_negation": ("affirmative", "negative"),
    "verb_tense": ("past", "present", "future"),
    "sentence_style": ("not_progressive", "progressive"),
}
