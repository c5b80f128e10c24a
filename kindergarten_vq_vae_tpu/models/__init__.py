from kindergarten_vq_vae_tpu.models.bagon import Bagon
from kindergarten_vq_vae_tpu.models.shelgon import Shelgon
from kindergarten_vq_vae_tpu.models.shelgon2 import (
    GenerativeFactorDiscretizer,
    SentenceDiscretizer,
    Shelgon2,
)
from kindergarten_vq_vae_tpu.models.shelgon3 import (
    GumbelQuantizerModule,
    Shelgon3,
    VectorQuantizerModule,
)
