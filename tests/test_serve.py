"""Serving layer: bucketed batched inference + HTTP front-end."""

import json
import threading
import urllib.request

import numpy as np
import pytest

from kindergarten_vq_vae_tpu.train.config import DataConfig, ModelConfig, OptimConfig, RunConfig
from kindergarten_vq_vae_tpu.train.run import run_training


@pytest.fixture(scope="module")
def served_run(tmp_path_factory):
    tmp = tmp_path_factory.mktemp("serve")
    cfg = RunConfig(
        model=ModelConfig(
            model_name="shelgon3", vocab_size=128, hidden_size=32, num_layers=2,
            num_heads=2, intermediate_size=64, compute_dtype="float32",
            vq_e_dim=32, enc_out_size=32, vq_n_e=5,
        ),
        data=DataConfig(
            data_dir=str(tmp / "data"), batch_size=32, tokenized_sentence_max_length=12,
            lim_batches_train_pct=0.03, lim_batches_val_pct=0.05, lim_batches_test_pct=0.05,
        ),
        optim=OptimConfig(lr=1e-3),
        n_epochs=1, n_epochs_to_decode_after=10, runs_dir=str(tmp / "runs"),
    )
    from kindergarten_vq_vae_tpu.data.generate import generate_dsentences

    generate_dsentences(str(tmp / "data"), num_verbs=1, num_objects=1)
    engine = run_training(cfg, console_print=False)
    return engine.run_path


def test_reconstructor(served_run):
    from kindergarten_vq_vae_tpu.serve.reconstructor import Reconstructor

    rec = Reconstructor(served_run, batch_buckets=(4, 16))
    sentences = ["i eat the apple", "he is not buying the mango", "we will fix the fence"]
    results = rec.reconstruct(sentences)
    assert len(results) == 3
    for r in results:
        assert {"input", "reconstruction", "token_acc", "codes"} <= set(r)
        assert 0.0 <= r["token_acc"] <= 1.0
        assert all(0 <= c < 5 for c in r["codes"])

    lat = rec.encode(sentences)
    assert lat.shape == (3, 32)

    codes = rec.codes(sentences)
    assert len(codes) == 3 and all(len(c) > 0 for c in codes)

    # bucket reuse: a 20-sentence request spans buckets without recompiles
    many = sentences * 7
    out = rec.reconstruct(many[:20])
    assert len(out) == 20


def test_http_server(served_run):
    from kindergarten_vq_vae_tpu.serve.http_server import serve_http
    from kindergarten_vq_vae_tpu.serve.reconstructor import Reconstructor

    rec = Reconstructor(served_run, batch_buckets=(4,))
    server = serve_http(rec, port=0)  # ephemeral port
    port = server.server_address[1]
    t = threading.Thread(target=server.serve_forever, daemon=True)
    t.start()
    try:
        with urllib.request.urlopen(f"http://127.0.0.1:{port}/health") as resp:
            health = json.loads(resp.read())
        assert health == {"status": "ok", "model": "shelgon3"}

        req = urllib.request.Request(
            f"http://127.0.0.1:{port}/reconstruct",
            data=json.dumps({"sentences": ["i eat the apple"]}).encode(),
            headers={"Content-Type": "application/json"},
        )
        with urllib.request.urlopen(req) as resp:
            out = json.loads(resp.read())
        assert len(out["results"]) == 1
        assert "reconstruction" in out["results"][0]

        # bad request -> 400 JSON error
        req = urllib.request.Request(
            f"http://127.0.0.1:{port}/reconstruct", data=b"{}",
            headers={"Content-Type": "application/json"},
        )
        try:
            urllib.request.urlopen(req)
            assert False, "expected 400"
        except urllib.error.HTTPError as e:
            assert e.code == 400
    finally:
        server.shutdown()


def test_reconstructor_from_exported_artifact(served_run, tmp_path):
    """--artifact mode: the Reconstructor serves a pre-compiled jax.export
    program (serve/export.py) and matches the live-jit reconstructions."""
    from kindergarten_vq_vae_tpu.serve.export import export_reconstructor
    from kindergarten_vq_vae_tpu.serve.reconstructor import Reconstructor

    out, meta = export_reconstructor(
        served_run, bucket=4, out_path=str(tmp_path / "art")
    )
    assert meta["bucket"] == 4

    rec_art = Reconstructor(served_run, artifact=out)
    rec_live = Reconstructor(served_run, batch_buckets=(4,))
    sentences = ["i eat the apple", "he is not buying the mango"]
    got = rec_art.reconstruct(sentences)
    want = rec_live.reconstruct(sentences)
    assert [r["reconstruction"] for r in got] == [r["reconstruction"] for r in want]
    assert rec_art.buckets == (4,)

    # geometry mismatch is rejected
    import pytest as _pytest

    out2, _ = export_reconstructor(served_run, bucket=4, out_path=str(tmp_path / "art2"))
    import json as _json

    with open(out2 + ".json") as f:
        m = _json.load(f)
    m["seq_len"] = 99
    with open(out2 + ".json", "w") as f:
        _json.dump(m, f)
    with _pytest.raises(ValueError, match="exported for"):
        Reconstructor(served_run, artifact=out2)
