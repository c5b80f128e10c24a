"""Shared CLI for the per-variant entrypoints.

Invocation parity with the reference (README.md:36:
``PYTHONPATH=. python3 models/bagon/main.py``), but the config is a
versioned JSON file (--config) instead of a gitignored star-imported
config.py (SURVEY §0 critical caveat). Every ModelConfig/DataConfig/
OptimConfig/RunConfig field is also overridable as ``--set key=value``.
"""

from __future__ import annotations

import argparse
import ast
import os

from kindergarten_vq_vae_tpu.train.config import RunConfig
from kindergarten_vq_vae_tpu.train.run import run_training


def _apply_overrides(cfg: RunConfig, overrides: list[str]) -> RunConfig:
    flat = cfg.get_config()
    for item in overrides:
        key, _, raw = item.partition("=")
        if key not in flat:
            raise KeyError(f"unknown config key: {key}")
        try:
            flat[key] = ast.literal_eval(raw)
        except (ValueError, SyntaxError):
            flat[key] = raw
    return RunConfig.from_flat_dict(flat)


def main(model_name: str, defaults: dict | None = None):
    parser = argparse.ArgumentParser(description=f"Train {model_name} on dSentences (TPU-native)")
    parser.add_argument("--config", default=None, help="path to a run_conf.json-style config")
    parser.add_argument("--set", action="append", default=[], metavar="KEY=VALUE",
                        help="override any config field (repeatable)")
    parser.add_argument("--resume", default=None, metavar="RUN_DIR",
                        help="continue a killed run from RUN_DIR/resume_state "
                             "(written when resume_save_every_n_epochs > 0); "
                             "the config defaults to RUN_DIR/run_conf.json")
    args = parser.parse_args()

    if args.config:
        cfg = RunConfig.load(args.config)
    elif args.resume:
        cfg = RunConfig.load(os.path.join(args.resume, "run_conf.json"))
    else:
        cfg = RunConfig()
    flat = cfg.get_config()
    flat["model_name"] = model_name
    for k, v in (defaults or {}).items():
        flat[k] = v
    cfg = RunConfig.from_flat_dict(flat)
    cfg = _apply_overrides(cfg, args.set)

    run_training(cfg, resume_from=args.resume)
