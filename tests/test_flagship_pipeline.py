"""End-to-end test of the flagship-quality pipeline script.

scripts/flagship_quality.py is the repo's reproduction of the reference's
full success recipe — Bagon training (models/bagon/main.py contract) →
k-means codebook init from the frozen encoder
(models/shelgon3/vq_codebook_init_weights.py) → Shelgon3-VQ warm start with
model_mode="vq-ft". The unit pieces are covered elsewhere (test_analyses
codebook init, test_train engine, test_aux warm start); this test runs the
actual 3-stage script in a fresh interpreter at smoke scale so the judged
pipeline (stage wiring, diagnostics, fail-fast gate, JSON contract) can't
silently rot.
"""

import json
import os
import subprocess
import sys


def test_flagship_pipeline_tiny_cpu(tmp_path):
    repo = os.path.abspath(os.path.join(os.path.dirname(__file__), ".."))
    out = tmp_path / "flagship.json"
    runs = tmp_path / "runs"
    # tiny raw corpus in an isolated data dir: the repo's ./data/dSentences
    # is the full-scale (242k-sentence) corpus since round 4 — far too big
    # for a CPU smoke of the whole 4-stage pipeline
    from kindergarten_vq_vae_tpu.data.generate import generate_dsentences

    data_dir = tmp_path / "data"
    generate_dsentences(str(data_dir), num_verbs=1, num_objects=1)
    res = subprocess.run(
        [
            sys.executable, os.path.join(repo, "scripts", "flagship_quality.py"),
            "--tiny", "--cpu",
            "--bagon-epochs", "1", "--vq-epochs", "1",
            "--lim-batches", "0.5",
            "--dec-perturb", "0.5",
            "--stage4-epochs", "1",
            "--runs-dir", str(runs),
            "--data-dir", str(data_dir),
            "--out", str(out),
        ],
        cwd=repo,
        capture_output=True, text=True, timeout=1200,
    )
    assert res.returncode == 0, (
        f"rc={res.returncode}\nstdout tail:\n{res.stdout[-2000:]}"
        f"\nstderr tail:\n{res.stderr[-2000:]}"
    )

    summary = json.loads(out.read_text())
    assert set(summary) == {"bagon", "codebook_init", "shelgon3_vq_ft",
                            "shelgon3_stage4"}

    # stage 1: finite stats and a reloadable best checkpoint consumed by 2+3.
    # The default pipeline is LEAN (VERDICT r4 #2): intermediate stages skip
    # the test stage, so their quality numbers come from the last val sweep.
    assert summary["bagon"]["eval_stage"] == "val"
    bagon = summary["bagon"]["val_stats"]
    assert 0.0 <= bagon["metric_acc"] <= 100.0
    assert bagon["loss_recon"] > 0.0

    # stage 2: the codebook artifact + collapse diagnostics
    diag = summary["codebook_init"]
    assert os.path.exists(diag["path"])
    # a barely-trained encoder is far from collapsed: the fail-fast gates
    # (separation_ratio < 0.1 → exit 3, amplitude_ratio < 2^-7 → exit 4)
    # must NOT have fired
    assert diag["separation_ratio"] >= 0.1
    assert diag["amplitude_ratio"] >= 2.0 ** -7

    # stage 3: vq-ft ran on the warm start + k-means init
    vq = summary["shelgon3_vq_ft"]["val_stats"]
    assert 0.0 <= vq["metric_acc"] <= 100.0
    assert 1.0 <= vq["metric_perp"] <= 9.0

    # stage 4: decoder adaptation continued the stage-3 checkpoint
    s4 = summary["shelgon3_stage4"]
    assert s4["mode"] == "full"
    assert 0.0 <= s4["test_stats"]["metric_acc"] <= 100.0
    assert 1.0 <= s4["test_stats"]["metric_perp"] <= 9.0
    assert vq["loss_vq"] >= 0.0
