#!/bin/bash
# Missing-modality robustness demo (the capability the reference's
# checkpoint-sweep driver exercises with drop_modal=True,
# test_all_pth.py:112): train one model WITH modality dropout and one
# control WITHOUT, then evaluate both with each modality zeroed.
#
# Produces docs/missing_modality_results.json (see README "Missing-modality
# robustness" for the measured table; ~2h total on one TPU v5e chip).
set -e
cd "$(dirname "$0")/.."
DATA=${DATA:-/tmp/dm_data}
python - <<PY
from dctseg.data import synthetic
synthetic.write_fake_dataset("$DATA", num_train=10, num_valid=4,
                             hardness="hard", seed=1)
print("dataset written")
PY
for variant in "--drop-modal --checkpoint-dir /tmp/dm_ckpt --experiment dm_drop" \
               "--checkpoint-dir /tmp/dm_ckpt_ctrl --experiment dm_ctrl"; do
  timeout 7200 python scripts/train.py --root "$DATA" --cache-dir /tmp/dm_cache \
    --amp --augment-flip --end-epoch 120 --save-freq 30 --eval-at-save \
    --log-dir /tmp/dm_logs --num-workers 2 $variant
done
python - <<'PY'
import json
import scripts.evaluate as ev

results = {}
for tag, ckpt in (("drop_modal", "/tmp/dm_ckpt"), ("control", "/tmp/dm_ckpt_ctrl")):
    for miss in ("", "flair", "t1", "t1ce", "t2"):
        out = ev.main(["--root", "/tmp/dm_data", "--cache-dir", "/tmp/dm_cache",
                       "--strategy", "tta", "--checkpoint-dir", ckpt,
                       "--missing", miss, "--output-dir", "/tmp/dm_eval_out"])
        results[f"{tag}/{miss or 'none'}"] = {k: round(v, 4)
                                              for k, v in out.items()}
with open("docs/missing_modality_results.json", "w") as f:
    json.dump(results, f, indent=1)
print("wrote docs/missing_modality_results.json")
PY
