"""Bagon training entrypoint (ref: models/bagon/main.py).

    python models/bagon/main.py [--config conf.json] [--set key=value ...]
"""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", ".."))

from models._cli import main

if __name__ == "__main__":
    main("bagon")
