"""End-to-end CLI smoke tests for `python -m raindrop_tpu.run` — the
reference flag surface (code/Raindrop.py:61-70) plus the framework's
extensions (--model, --resplit-per-run, --resume-from, --max-len), run
in-process on tiny synthetic data."""

from __future__ import annotations

import json
import os

import numpy as np
import pytest

from raindrop_tpu.run import main


def _run(tmp_path, *extra, out="out.json"):
    out_path = str(tmp_path / out)
    rc = main([
        "--dataset", "P19", "--synthetic", "48", "--max-len", "8",
        "--batch-size", "8", "--epochs", "1", "--n-splits", "1",
        "--checkpoint-dir", str(tmp_path / "ckpt"),
        "--out-json", out_path, *extra])
    assert rc == 0
    with open(out_path) as f:
        return json.load(f)


def test_cli_raindrop_smoke(tmp_path, capsys):
    res = _run(tmp_path)
    auroc = res["missing_0.0"]["auroc"]["mean"]
    assert np.isfinite(auroc) and 0 <= auroc <= 100
    assert "auroc" in capsys.readouterr().out


def test_cli_grud_bce_resplit(tmp_path):
    res = _run(tmp_path, "--model", "grud_bce", "--n-runs", "2",
               "--resplit-per-run", "true", out="g.json")
    assert np.isfinite(res["missing_0.0"]["auroc"]["mean"])


def test_cli_resume_from(tmp_path):
    """Train 1 epoch (writes <ckpt>_last at epoch 0), then resume to epoch
    2 — the mid-run-resume CLI path."""
    _run(tmp_path)
    last = str(tmp_path / "ckpt" / "raindrop_P19_s1_r0_last")
    assert os.path.exists(last + ".npz")
    rc = main([
        "--dataset", "P19", "--synthetic", "48", "--max-len", "8",
        "--batch-size", "8", "--epochs", "2", "--n-splits", "1",
        "--checkpoint-dir", str(tmp_path / "ckpt2"),
        "--resume-from", last,
        "--out-json", str(tmp_path / "r.json")])
    assert rc == 0


def test_cli_rejects_unknown_model(tmp_path):
    with pytest.raises(SystemExit):
        main(["--model", "nope"])


@pytest.mark.parametrize("method", ["mean", "forward"])
def test_cli_transmean_imputation(tmp_path, method):
    """--imputation wires the Trans-mean family through the split pipeline
    (imputers applied to raw values BEFORE normalization, train means
    reused for val/test — reference Transformer_baseline.py:155-204)."""
    res = _run(tmp_path, "--model", "transformer",
               "--imputation", method, out=f"{method}.json")
    assert np.isfinite(res["missing_0.0"]["auroc"]["mean"])


def test_prepare_split_imputation_changes_values():
    """Imputation actually fills missing entries and shifts normalization
    stats (train means reused for val in 'mean' mode)."""
    from raindrop_tpu.data.datasets import synthetic_split

    plain = synthetic_split("P19", n=40, seed=0, T=8)
    imp = synthetic_split("P19", n=40, seed=0, T=8, imputation="mean")
    F = plain.Ptrain.shape[2] // 2
    # values differ where previously missing, and — like the reference,
    # where the mask is computed AFTER imputation — the imputed entries
    # now count as observed, so the mask coverage strictly grows
    assert not np.allclose(plain.Ptrain[:, :, :F], imp.Ptrain[:, :, :F])
    assert not np.allclose(plain.Pval[:, :, :F], imp.Pval[:, :, :F])
    assert imp.Ptrain[:, :, F:].sum() > plain.Ptrain[:, :, F:].sum()


def test_cli_compare_golden(tmp_path, capsys):
    """--compare-golden prints the side-by-side table and records deltas —
    the runnable metric-level reproduction path against the reference's
    code/results/standard_phy12.npy format (run it with the real figshare
    data root to reproduce BASELINE.md rows 1-3)."""
    golden = np.array([[55.0], [30.0], [50.0]])  # acc/auprc/auroc, 1 split
    gp = str(tmp_path / "golden.npy")
    np.save(gp, golden)
    res = _run(tmp_path, "--model", "transformer",
               "--compare-golden", gp, out="gc.json")
    assert "golden_delta" in res
    assert set(res["golden_delta"]) == {"accuracy", "auprc", "auroc"}
    out = capsys.readouterr().out
    assert "golden comparison" in out


def test_cli_compare_golden_split_mismatch(tmp_path, capsys):
    """A golden file with more splits than the run compares the overlap
    with a warning — and still writes --out-json (no post-training crash)."""
    golden = np.tile(np.array([[55.0], [30.0], [50.0]]), (1, 5))
    gp = str(tmp_path / "g5.npy")
    np.save(gp, golden)
    res = _run(tmp_path, "--compare-golden", gp, out="gm.json")
    assert "golden_delta" in res
    assert "[warn]" in capsys.readouterr().out


# ---- per-baseline hyperparameter surfaces (reference driver flags) --------
def test_baseline_hp_flags_reach_the_models():
    """Every knob the reference drivers expose is reachable from the CLI:
    parse the grouped --<family>-* flags, build the adapter hp dict, and
    verify the values land in the constructed parameters (shapes change)."""
    import jax
    from raindrop_tpu.config import dataset_config
    from raindrop_tpu.run import baseline_hp, build_parser
    from raindrop_tpu.baselines.adapters import make_baseline

    parser = build_parser()
    cfg = dataset_config("P12", max_len=8)

    args = parser.parse_args(
        ["--model", "mtand", "--mtand-rec-hidden", "24",
         "--mtand-embed-time", "48", "--mtand-num-ref-points", "16"])
    hp = baseline_hp(args)
    assert hp == {"rec_hidden": 24, "embed_time": 48, "num_heads": 1,
                  "num_ref_points": 16}
    init, _ = make_baseline("mtand", cfg, hp)
    p = init(jax.random.PRNGKey(0))
    assert p["att_q"]["w"].shape == (48, 48)           # embed_time
    assert p["att_out"]["w"].shape[0] == 24            # rec_hidden

    args = parser.parse_args(["--model", "mtgnn", "--mtgnn-layers", "2",
                              "--mtgnn-conv-channels", "8",
                              "--mtgnn-subgraph-size", "5"])
    init, _ = make_baseline("mtgnn", cfg, baseline_hp(args))
    p = init(jax.random.PRNGKey(0))
    assert len(p["layers"]) == 2                       # layers
    assert p["gc"]["emb1"].shape[1] > 0

    args = parser.parse_args(["--model", "dgm2", "--dgm2-cluster-num", "7",
                              "--dgm2-latent-dim", "4",
                              "--dgm2-ode-units", "6"])
    init, _ = make_baseline("dgm2", cfg, baseline_hp(args))
    p = init(jax.random.PRNGKey(0))
    assert p["ode_l1"]["w"].shape == (6, 4)            # ode_units x latent

    args = parser.parse_args(["--model", "ipnet", "--ipnet-ref-points", "33",
                              "--ipnet-hid", "11"])
    init, _ = make_baseline("ipnet", cfg, baseline_hp(args))
    p = init(jax.random.PRNGKey(0))
    assert p["_meta"]["ref_points"] == 33
    assert p["dense"]["w"].shape[1] == 11              # hid

    # non-tunable families reject stray hp
    with pytest.raises(ValueError, match="unknown hyperparameters"):
        make_baseline("seft", cfg, {"rec_hidden": 1})


@pytest.mark.parametrize("model,flags", [
    ("mtand", ["--mtand-rec-hidden", "8", "--mtand-embed-time", "8",
               "--mtand-num-ref-points", "8"]),
    ("mtgnn", ["--mtgnn-layers", "2", "--mtgnn-conv-channels", "4",
               "--mtgnn-skip-channels", "4", "--mtgnn-end-channels", "8"]),
    ("dgm2", ["--dgm2-cluster-num", "4", "--dgm2-latent-dim", "3"]),
    ("ipnet", ["--ipnet-ref-points", "8", "--ipnet-hid", "8"]),
])
def test_cli_trains_each_family_with_custom_hp(tmp_path, model, flags):
    res = _run(tmp_path, "--model", model, *flags, out=f"{model}.json")
    assert np.isfinite(res["missing_0.0"]["auroc"]["mean"])


def test_cli_track_jsonl_lifecycle_for_baselines(tmp_path):
    """--track-jsonl delimits baseline runs exactly like raindrop runs:
    start -> epoch* -> finish (the baseline branch drives the tracker
    lifecycle itself)."""
    track = tmp_path / "track.jsonl"
    _run(tmp_path, "--model", "grud", "--track-jsonl", str(track),
         out="t.json")
    events = [json.loads(ln)["event"] for ln in track.read_text().splitlines()]
    assert events[0] == "start" and events[-1] == "finish"
    assert events.count("epoch") >= 1
    first = json.loads(track.read_text().splitlines()[0])
    assert first["config"]["model"] == "grud"
