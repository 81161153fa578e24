"""Mid-run resume: a run interrupted at epoch k and resumed must replay the
remaining epochs with identical data order and state."""

import numpy as np

from raindrop_tpu.config import TrainConfig, dataset_config
from raindrop_tpu.data import synthetic_split
from raindrop_tpu.train import Trainer


def test_resume_reproduces_uninterrupted_run(tmp_path):
    cfg = dataset_config("PAM", max_len=12, nlayers=1, nhead=1)
    split = synthetic_split("PAM", n=120, seed=0, T=12)

    def make_tcfg(epochs):
        return TrainConfig(dataset="PAM", num_epochs=epochs,
                           learning_rate=1e-3, batch_size=24,
                           batching_strategy=3, n_batches_strategy3=4, seed=3)

    # full 4-epoch run
    full = Trainer(cfg, make_tcfg(4)).train_split(
        split, checkpoint_path=str(tmp_path / "full"), verbose=False)

    # 2-epoch run, then resume for the remaining 2
    t2 = Trainer(cfg, make_tcfg(2))
    t2.train_split(split, checkpoint_path=str(tmp_path / "part"),
                   verbose=False)
    t4 = Trainer(cfg, make_tcfg(4))
    resumed = t4.train_split(
        split, checkpoint_path=str(tmp_path / "part2"),
        resume_from=str(tmp_path / "part_last"), verbose=False)

    assert [h["epoch"] for h in resumed.history] == [0, 1, 2, 3]
    for a, b in zip(full.history, resumed.history):
        assert a["epoch"] == b["epoch"]
        np.testing.assert_allclose(a["train_loss"], b["train_loss"],
                                   rtol=1e-4, atol=1e-5)
        np.testing.assert_allclose(a["val_auroc"], b["val_auroc"],
                                   rtol=1e-5)
    np.testing.assert_allclose(full.test_metrics["auroc"],
                               resumed.test_metrics["auroc"], rtol=1e-5)


def test_resume_restores_best_params(tmp_path):
    """Resuming restores the best-val params from disk: a resumed run with
    no remaining epochs must still test on the best checkpoint, not the
    final-epoch params (round-3 review finding)."""
    import jax
    import numpy as np
    from raindrop_tpu.config import TrainConfig, dataset_config
    from raindrop_tpu.data.datasets import synthetic_split
    from raindrop_tpu.train.checkpoint import load_checkpoint
    from raindrop_tpu.train.trainer import Trainer

    cfg = dataset_config("P19", max_len=8)
    split = synthetic_split("P19", n=48, seed=0, T=8)
    ckpt = str(tmp_path / "ck")
    tcfg = TrainConfig(dataset="P19", batch_size=8, num_epochs=3,
                       batching_strategy=2, learning_rate=1e-2)
    trainer = Trainer(cfg, tcfg)
    trainer.train_split(split, seed=0, checkpoint_path=ckpt, verbose=False)

    # resume with num_epochs == saved epoch + 1: zero epochs remain, so
    # the ONLY source of best params is the on-disk best checkpoint
    res = Trainer(cfg, tcfg).train_split(
        split, seed=0, checkpoint_path=str(tmp_path / "ck2"),
        resume_from=ckpt + "_last", verbose=False)
    best_params, _, _ = load_checkpoint(ckpt, res.params)
    jax.tree.map(lambda a, b: np.testing.assert_array_equal(
        np.asarray(jax.device_get(a)), np.asarray(b)),
        res.params, best_params)
