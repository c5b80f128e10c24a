"""Shelgon (latent-class Gumbel bottleneck) entrypoint
(ref: models/shelgon/main.py).

    python models/shelgon/main.py [--config conf.json] [--set key=value ...]
"""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", ".."))

from models._cli import main

if __name__ == "__main__":
    # the shelgon variant pads to 14 tokens (ref models/shelgon/Shelgon.py:229)
    main("shelgon", defaults={"tokenized_sentence_max_length": 14})
