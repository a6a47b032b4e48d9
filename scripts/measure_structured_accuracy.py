#!/usr/bin/env python
"""int8 PTQ accuracy on STRUCTURED predictions (not noise), on the chip.

docs/PERF.md's int8 accuracy numbers (argmax agreement 0.968, prob drift
0.005) were measured with random params on N(0,1) noise volumes — the
worst case for argmax stability, since logits are near-uniform and any
rounding flips the winner.  The deployment-relevant question is how int8
behaves on CONFIDENT predictions.  This script:

  1. briefly trains the full-size model on the synthetic task (the same
     generator the test suite's overfit test uses) so logits have real
     structure,
  2. runs bf16 and int8 tiled inference on synthetic full volumes with
     the SAME trained weights (PTQ shares the param tree),
  3. reports argmax agreement, int8-vs-bf16 per-region Dice (bf16 labels
     as the reference standard), and both predictors' Dice vs the
     synthetic ground truth,
  4. times the eval-driver paired path: validate-style loop at
     --paired 1 vs --paired 3 on the same loader (interleaved).

Run on the idle chip (one process batches every TPU measurement; fresh
remote compiles dominate otherwise):

    python scripts/measure_structured_accuracy.py
"""
import argparse
import dataclasses
import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--quantize", default="int8",
                    help="PTQ spec to compare against bf16 (e.g. 'int8', "
                         "'int8+pw', 'int8_all' — dctseg/ops/quant.py)")
    args = ap.parse_args()
    from bench import _wait_for_accelerator
    _wait_for_accelerator()
    import jax
    from dctseg.utils.jax_setup import enable_compile_cache
    enable_compile_cache()
    import jax.numpy as jnp
    import numpy as np
    from dctseg import metrics
    from dctseg.config import Config, DataConfig, ModelConfig, TrainConfig
    from dctseg.data.brats import BraTSDataset
    from dctseg.data.pipeline import PrefetchLoader
    from dctseg.infer.engine import Predictor
    from dctseg.infer.validate import validate_softmax
    from dctseg.models.clswiseformer import build_model
    from dctseg.train.trainer import Trainer
    from dctseg.utils.logging_utils import setup_logging

    setup_logging(os.path.join(tempfile.gettempdir(), "structured_acc.txt"))

    # --- 1. brief full-size training on the synthetic task ---
    ckdir = tempfile.mkdtemp(prefix="structured_acc_ck_")
    cfg = Config(
        model=ModelConfig(compute_dtype="bfloat16"),
        data=DataConfig(synthetic_num_samples=24,
                        transfer_dtype="bfloat16"),
        train=TrainConfig(batch_size=2, end_epoch=10, save_freq=1000,
                          checkpoint_dir=ckdir, log_every=6),
    )
    trainer = Trainer(cfg)
    t0 = time.perf_counter()
    trainer.fit()
    print(f"trained {cfg.train.end_epoch} epochs x "
          f"{trainer.steps_per_epoch} steps in "
          f"{time.perf_counter()-t0:.0f}s", flush=True)
    params = trainer.state.params

    # --- 2. bf16 vs int8 tiled inference on structured full volumes ---
    model_f = build_model(cfg.model)
    model_q = build_model(dataclasses.replace(cfg.model,
                                          quantize=args.quantize))
    pf = Predictor(model_f, params)
    pq = Predictor(model_q, params)

    eval_cfg = dataclasses.replace(cfg.data, synthetic_num_samples=4)
    ds = BraTSDataset(mode="full", cfg=eval_cfg)

    agree, d_q_vs_f, d_f_gt, d_q_gt = [], [], [], []
    for i in range(len(ds)):
        s = ds[i]
        x = jnp.asarray(s.x)[None]
        lf = np.asarray(jnp.argmax(pf.tiled_probs(x), -1)[0], np.int32)
        lq = np.asarray(jnp.argmax(pq.tiled_probs(x), -1)[0], np.int32)
        tgt = np.asarray(s.target)[..., :155]
        agree.append(float((lf == lq).mean()))
        d_q_vs_f.append(metrics.softmax_output_dice(lq, lf))
        d_f_gt.append(metrics.softmax_output_dice(lf, tgt))
        d_q_gt.append(metrics.softmax_output_dice(lq, tgt))
        print(f"vol {i}: agree {agree[-1]:.6f} | int8-vs-bf16 dice "
              f"{['%.4f' % v for v in d_q_vs_f[-1]]} | bf16-vs-gt "
              f"{['%.4f' % v for v in d_f_gt[-1]]} | int8-vs-gt "
              f"{['%.4f' % v for v in d_q_gt[-1]]}", flush=True)
    m = lambda rows: np.mean(np.asarray(rows, np.float64), axis=0)
    print(f"MEAN: argmax agreement {np.mean(agree):.6f}", flush=True)
    print(f"MEAN int8-vs-bf16 Dice (WT,TC,ET): {m(d_q_vs_f)}", flush=True)
    print(f"MEAN bf16-vs-gt Dice: {m(d_f_gt)} | int8-vs-gt: {m(d_q_gt)}",
          flush=True)

    # --- 3. eval-driver paired path: validate loop at paired 1 vs 3 ---
    def run_validate(paired):
        loader = PrefetchLoader(ds, batch_size=1, shuffle=False,
                                num_workers=2)
        t0 = time.perf_counter()
        out = validate_softmax(loader, pf, strategy="tiling",
                               use_hd95=False, paired=paired)
        wall = time.perf_counter() - t0
        return wall / len(ds), out

    for rep in range(2):
        for paired in (1, 3):
            spv, out = run_validate(paired)
            print(f"driver paired={paired} rep {rep}: {spv:.3f} s/volume "
                  f"wall (dice WT {out['wt']:.4f})", flush=True)


if __name__ == "__main__":
    main()
