"""Shelgon2 (per-factor discretizers) entrypoint (ref: models/shelgon2/main.py).

    python models/shelgon2/main.py [--config conf.json] [--set key=value ...]
"""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", ".."))

from models._cli import main

if __name__ == "__main__":
    main("shelgon2", defaults={"tokenized_sentence_max_length": 14})
