#!/usr/bin/env python
"""Numerical forward-parity check against the reference PyTorch model.

Requires a checkout of the reference repo (it is NOT vendored here):

  python scripts/parity_check.py --reference /path/to/reference

Builds the reference ClsWiseFormer on CPU (its eval-time InitConv dropout
quirk neutralized for determinism), exports its randomly initialized
state_dict, converts it with dctseg's converter, runs both models on the
same random 4x128^3 input, and reports output deltas.

Recorded result on this container (2026-08-16):
  seg max |err| 2.33e-6, mean 2.2e-7, argmax agreement 99.9999%
  all supervision heads max |err| < 1e-6
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--reference", required=True,
                   help="path to the reference repo checkout")
    p.add_argument("--workdir", default="/tmp/dctseg_parity")
    a = p.parse_args(argv)

    # the reference model eval()s fix_index.txt from a hard-coded relative
    # path at construction (cls_wise_former.py:275-278); synthesize it
    os.makedirs(os.path.join(
        a.workdir, "2-MICCAI_BraTS_2018", "MICCAI_BraTS_2018_Data_Training"),
        exist_ok=True)
    fix = os.path.join(a.workdir, "2-MICCAI_BraTS_2018",
                       "MICCAI_BraTS_2018_Data_Training", "fix_index.txt")
    if not os.path.exists(fix):
        with open(fix, "w") as f:
            f.write(repr({str(i): [i] * 512 for i in range(2048)}))
    link = os.path.join(a.workdir, "models")
    if not os.path.exists(link):
        os.symlink(os.path.join(a.reference, "models"), link)
    os.chdir(a.workdir)
    sys.path.insert(0, a.workdir)

    import numpy as np
    import torch
    import torch.nn.functional as F
    # neutralize the eval-time dropout quirk (Unet_skipconnection.py:31)
    F.dropout3d = lambda x, p=0.5, training=True, inplace=False: x

    from models.clswiseformer.cls_wise_former import get_cls_wise_former
    torch.manual_seed(0)
    ref = get_cls_wise_former(dataset="brats", _conv_repr=True,
                              _pe_type="fixed", gpu=0)
    ref.eval()
    rng = np.random.default_rng(42)
    x = rng.normal(size=(1, 4, 128, 128, 128)).astype(np.float32)
    with torch.no_grad():
        out_t = ref(torch.from_numpy(x), None)
    sd = {k: v.detach().cpu().numpy() for k, v in ref.state_dict().items()}

    import jax
    jax.config.update("jax_default_matmul_precision", "highest")
    import jax.numpy as jnp
    from dctseg.config import ModelConfig
    from dctseg.models.clswiseformer import build_model
    from dctseg.utils.torch_convert import convert_state_dict

    params = {"params": convert_state_dict(sd)}
    model = build_model(ModelConfig())
    xj = jnp.asarray(np.transpose(x, (0, 2, 3, 4, 1)))
    outs = jax.jit(lambda p, x: model.apply(p, x, train=False))(params, xj)

    seg = np.transpose(np.asarray(outs[0]), (0, 4, 1, 2, 3))
    seg_t = out_t[0].numpy()
    err = np.abs(seg - seg_t)
    agree = (seg.argmax(1) == seg_t.argmax(1)).mean()
    print(f"seg max |err| {err.max():.3e}  mean {err.mean():.3e}  "
          f"argmax agreement {agree:.6%}")
    for j, name in ((1, "sup"), (2, "edge"), (3, "mid_sup"),
                    (4, "mid_edge")):
        for r in ("01", "02", "04"):
            a_j = np.transpose(np.asarray(outs[j][r]), (0, 4, 1, 2, 3))
            e = np.abs(a_j - out_t[j][r].numpy()).max()
            print(f"  {name}[{r}] max |err| {e:.3e}")
    assert err.max() < 1e-4 and agree > 0.999
    print("PARITY OK")


if __name__ == "__main__":
    main()
