"""Typed configuration tree for raindrop_tpu.

The reference scatters its configuration across argparse flags
(reference: code/Raindrop.py:61-70), per-dataset if/elif blocks
(code/Raindrop.py:109-148) and buried boolean literals
(`sensor_wise_mask` code/Raindrop.py:103, `use_beta` code/models_rd.py:317).
Here every knob is an explicit dataclass field, serialized with checkpoints.
"""

from __future__ import annotations

import dataclasses
import json
from dataclasses import dataclass, field
from typing import Optional


@dataclass(frozen=True)
class RaindropConfig:
    """Model hyperparameters for the Raindrop (v2) sensor-graph classifier.

    Dimensioning mirrors reference code/Raindrop.py:109-148:
      d_model = d_inp * d_ob, nhid = 2*d_model, nlayers=2, nhead=2, dropout=0.2.
    """

    d_inp: int = 36              # number of sensors F
    d_static: int = 9            # static feature dim (0 => no static path)
    max_len: int = 215           # padded sequence length T
    n_classes: int = 2
    d_ob: int = 4                # per-sensor observation embedding dim
    d_pe: int = 16               # time positional-encoding dim
    nhead: int = 2               # temporal transformer heads
    nlayers: int = 2             # temporal transformer layers
    nhid: Optional[int] = None   # transformer FFN dim; default 2*d_model
    dropout: float = 0.2
    MAX: int = 100               # PE MAX parameter (kept for API parity)
    aggreg: str = "mean"
    sensor_wise_mask: bool = False
    use_beta: bool = False       # time-conditioned edge attention + top-50% pruning
    static: bool = True          # static-feature pathway on/off
    prop_dropout: float = 0.0    # attention dropout inside graph propagation
                                 # (reference leaves Observation_progation at
                                 # its default dropout=0., code/models_rd.py:243)
    init_range: float = 1e-10    # reference code/models_rd.py:272 encoder/emb init
    dtype: str = "float32"       # param storage dtype
    # Mixed precision: cast params+activations to this dtype inside the
    # forward (master weights / optimizer state stay in `dtype`). On TPU the
    # MXU natively multiplies bfloat16 with float32 accumulation, so
    # 'bfloat16' roughly doubles matmul throughput and halves HBM traffic.
    # None => compute in `dtype` (the parity default).
    compute_dtype: Optional[str] = None
    attention_backend: str = "auto"  # 'auto' | 'dense' | 'flash' (Pallas)
    # Operand dtype INSIDE the Pallas flash-attention kernel (scores/
    # probabilities; softmax statistics and accumulation stay f32):
    # 'bfloat16' (default) rides the MXU's native bf16 pass — the
    # TPU-native choice, ~1e-2 relative error on attention outputs;
    # 'float32' for bit-conservative runs / parity oracles. Only the
    # flash backend reads this; the dense backend follows compute_dtype.
    attention_score_dtype: str = "bfloat16"
    # graph-propagation backend: 'auto' = batched dense/masked-dense
    # formulations for the default complete graph (both use_beta paths);
    # 'coo' forces the vmapped per-sample XLA COO path (the semantics
    # oracle — always used when a custom global_adj is passed and the
    # backend is 'auto'); 'pallas' dispatches the fused one-hot-MXU
    # SpMM+segment-softmax kernel (ops/sparse_pallas.py) for general
    # shared-topology graphs, complete or custom global_adj alike
    # (use_beta=False; falls back to the XLA paths when propagation
    # dropout is active or use_beta=True — see models/raindrop.py)
    prop_backend: str = "auto"   # 'auto' | 'coo' | 'pallas'

    @property
    def d_model(self) -> int:
        return self.d_inp * self.d_ob

    @property
    def ffn_dim(self) -> int:
        return self.nhid if self.nhid is not None else 2 * self.d_model

    @property
    def d_transformer(self) -> int:
        """Width of the temporal transformer (reference code/models_rd.py:232-235)."""
        if self.sensor_wise_mask:
            return self.d_inp * (self.d_ob + self.d_pe)
        return self.d_model + self.d_pe

    @property
    def d_final(self) -> int:
        """Classifier-head width (reference code/models_rd.py:249-252).

        Deviation: with sensor_wise_mask=True the pooled embedding is
        d_inp*(d_ob+d_pe) wide (code/models_rd.py:368-376) but the reference
        still sizes mlp_static at d_model+d_pe(+d_inp) — a latent crash on a
        path its shipped driver never exercises (sensor_wise_mask=False at
        code/Raindrop.py:103). We size the head to the actual pooled width so
        the capability works.
        """
        base = (self.d_inp * (self.d_ob + self.d_pe)
                if self.sensor_wise_mask else self.d_model + self.d_pe)
        return base + (self.d_inp if self.static else 0)

    def to_json(self) -> str:
        return json.dumps(dataclasses.asdict(self), indent=2, sort_keys=True)

    @staticmethod
    def from_json(s: str) -> "RaindropConfig":
        return RaindropConfig(**json.loads(s))


@dataclass(frozen=True)
class TrainConfig:
    """Training/experiment protocol (reference code/Raindrop.py:105-160, 255-307)."""

    dataset: str = "P12"
    num_epochs: int = 20
    learning_rate: float = 1e-4
    batch_size: int = 128
    n_splits: int = 5
    n_runs: int = 1
    # class-balance strategy: 2 = half/half with 3x-expanded positives (binary),
    # 3 = uniform random batches (multiclass). reference code/Raindrop.py:264-307
    batching_strategy: int = 2
    n_batches_strategy3: int = 30
    # ReduceLROnPlateau on val AUPRC (reference code/Raindrop.py:257-259)
    plateau_factor: float = 0.1
    plateau_patience: int = 1
    plateau_threshold: float = 1e-4
    plateau_min_lr: float = 1e-8
    # Settings machinery (reference code/Raindrop.py:62-70, 215-231)
    split_type: str = "random"            # 'random' | 'age' | 'gender'
    reverse: bool = False
    feature_removal_level: str = "no_removal"  # 'no_removal' | 'set' | 'sample'
    missing_ratio: float = 0.0
    predictive_label: str = "mortality"   # 'mortality' | 'LoS' (P12 only)
    seed: int = 1
    # Single-device epochs run as ONE lax.scan dispatch with on-device batch
    # gathering (~2.6x per-step at Raindrop shapes; see Trainer). Off => the
    # per-step dispatch path (always used under a sharded mesh).
    scan_epoch: bool = True
    # Input pipeline regime: 'resident' keeps the whole split on device
    # (the default; with scan_epoch the epoch is one dispatch and batches
    # gather on-device). 'streaming' trains through data/prefetch.py's
    # PrefetchExecutor — batches are assembled on host worker threads
    # (native C++ gathers when built) and device_put on the producer so
    # H2D transfer of batch k+1 overlaps the compute of batch k: the
    # regime for datasets that exceed HBM. Identical results to resident
    # (same sampler stream, same train step — tested). Single-host only.
    input_pipeline: str = "resident"      # 'resident' | 'streaming'
    prefetch_depth: int = 2               # streaming double-buffer depth
    # Opt-in production MFU telemetry: measure the per-step model FLOPs
    # once (XLA compiled cost analysis, utils/diagnostics.compiled_flops)
    # and add achieved train_tflops_per_sec + mfu to every epoch record /
    # tracker event. WALL-CLOCK epoch MFU: the denominator is the whole
    # epoch including validation, checkpointing and (first epoch) compile
    # — the utilization a user actually gets, not the kernel-only number
    # (bench.py reports that one). Off by default (the analysis
    # lowers+compiles the unscanned step once per train_split).
    measure_mfu: bool = False
    checkpoint_dir: str = "checkpoints"
    log_path: Optional[str] = None        # JSONL log file
    # weight on the model's aux output in the train loss (IP-Net uses its
    # reconstruction here; Raindrop's alpha-distance stays excluded at 0.0
    # like the reference, code/Raindrop.py:319-322)
    aux_loss_weight: float = 0.0
    # print parameters left bitwise-unchanged by the first epoch — the
    # reference GRU-D driver's frozen-parameter state-dict diff
    # (code/baselines/GRU-D_baseline.py:286-288,355-363)
    diag_frozen_params: bool = False
    # re-randomize the train/val/test partition for every run within a
    # split — the mTAND per-run resplit protocol
    # (code/baselines/mTAND/mTAND_baseline.py:72-88 + utils.get_data)
    resplit_per_run: bool = False
    # Scale-out routes for the flagship model over the Trainer's mesh
    # 'model' axis (parallel/; requires a mesh with n_model > 1):
    #   context_parallel: 'none' | 'sp' (all-gather K/V) | 'ring'
    #     (ppermute K/V rotation) — the temporal attention's T axis
    #     shards across devices (SURVEY.md §5.7 long-context slot);
    #   pipeline_microbatches > 0: encoder layers run as GPipe stages
    #     (one layer per 'model'-axis device) with that many microbatches;
    #   edge_partition: the propagation layer's edge set shards across
    #     'model' with psum/pmax combines (graph tensor parallelism).
    context_parallel: str = "none"
    pipeline_microbatches: int = 0
    edge_partition: bool = False
    # Gradient accumulation: split each batch into N microbatches inside
    # the train step (lax.scan) and average the gradients before ONE Adam
    # update — numerically the full-batch step (mean of chunk means), but
    # the [T, B, .] activation working set shrinks N-fold. Past B~1024
    # per chip the activations spill XLA's VMEM tiling and throughput
    # falls off (measured: bf16 B=2048 drops 164k -> 137k samples/s);
    # grad_microbatches=2 restores 163k at B=2048 and 164k at B=4096
    # with 4 (docs/PERFORMANCE.md round-5).
    grad_microbatches: int = 1


# Per-dataset presets, reference code/Raindrop.py:109-148.
DATASETS = {
    "P12": dict(d_inp=36, d_static=9, max_len=215, n_classes=2, static=True),
    "P19": dict(d_inp=34, d_static=6, max_len=60, n_classes=2, static=True),
    "eICU": dict(d_inp=14, d_static=399, max_len=300, n_classes=2, static=True),
    "PAM": dict(d_inp=17, d_static=0, max_len=600, n_classes=8, static=False),
}


def dataset_config(name: str, **overrides) -> RaindropConfig:
    """Build the published per-dataset model config (code/Raindrop.py:109-148)."""
    if name not in DATASETS:
        raise ValueError(f"unknown dataset {name!r}; options: {sorted(DATASETS)}")
    kw = dict(DATASETS[name])
    kw.update(overrides)
    return RaindropConfig(**kw)
