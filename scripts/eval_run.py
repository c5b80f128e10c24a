"""Post-hoc test-stage evaluation of a finished run dir.

Rebuilds the model from run_conf.json, reloads the best-val loss_recon
checkpoint (the reference's test contract, models/bagon/main.py:142-158)
and prints ALL test-stage stats as one JSON line — including the variant
metrics the console line abbreviates (shelgon metric_acc_pred, shelgon2
metric_latent_acc).

    python scripts/eval_run.py RUN_DIR [--lim-batches 1.0] [--cpu]
"""

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("run_dir")
    ap.add_argument("--lim-batches", type=float, default=1.0)
    ap.add_argument("--cpu", action="store_true")
    args = ap.parse_args()

    if args.cpu:
        import jax

        jax.config.update("jax_platforms", "cpu")

    from kindergarten_vq_vae_tpu.train.config import RunConfig
    from kindergarten_vq_vae_tpu.train.engine import Engine
    from kindergarten_vq_vae_tpu.train.run import load_data

    cfg = RunConfig.load(os.path.join(args.run_dir, "run_conf.json"))
    flat = cfg.get_config()
    flat["lim_batches_test_pct"] = args.lim_batches
    cfg = RunConfig.from_flat_dict(flat)
    splits, tokenizer = load_data(cfg)
    engine = Engine(cfg, splits, tokenizer=tokenizer, run_path=args.run_dir)
    stats = engine.test(console_print=False)
    print(json.dumps({k: float(v) for k, v in stats.items()}))


if __name__ == "__main__":
    main()
