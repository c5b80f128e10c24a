"""Shelgon3 (VQ / Gumbel codebook bottleneck) entrypoint
(ref: models/shelgon3/main.py; max_length 12 per shelgon3/Trainer.py:82).

    python models/shelgon3/main.py [--config conf.json] [--set key=value ...]
"""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", ".."))

from models._cli import main

if __name__ == "__main__":
    main("shelgon3", defaults={"tokenized_sentence_max_length": 12})
