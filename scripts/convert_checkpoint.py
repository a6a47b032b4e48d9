#!/usr/bin/env python
"""Convert a reference PyTorch .pth checkpoint into a dctseg (Orbax)
checkpoint, so reference users can carry trained weights over.

  python scripts/convert_checkpoint.py model_epoch_999.pth --out checkpoints
  python scripts/convert_checkpoint.py --reverse --out checkpoints export.pth

Numerical fidelity: with converted weights, the dctseg forward matches the
reference torch forward to max |err| 2.3e-6 on the softmax output (argmax
agreement 99.9999%) — see scripts/parity_check.py.
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("pth", help="reference checkpoint (.pth)")
    p.add_argument("--out", default="checkpoints",
                   help="dctseg checkpoint directory")
    p.add_argument("--epoch", type=int, default=None,
                   help="epoch id to store under (default: from the ckpt)")
    p.add_argument("--fix-index", default="",
                   help="the checkpoint's fix_index.txt; verified to be the "
                        "identity scatter map dctseg assumes")
    p.add_argument("--reverse", action="store_true",
                   help="export the latest dctseg checkpoint in --out as a "
                        "reference-format .pth (positional arg = output)")
    a = p.parse_args(argv)

    import jax
    import numpy as np
    import torch
    from dctseg.train.checkpoint import Checkpointer
    from dctseg.utils.torch_convert import (convert_state_dict,
                                            save_torch_checkpoint)

    if a.reverse:
        import jax.numpy as jnp
        from dctseg.config import ModelConfig
        from dctseg.models.clswiseformer import build_model
        from dctseg.train.trainer import ocp_abstract
        model = build_model(ModelConfig())
        tmpl = jax.jit(lambda k: model.init(
            k, jnp.zeros((1, 128, 128, 128, 4)), train=False))(
                jax.random.PRNGKey(0))
        cp = Checkpointer(a.out)
        epoch = a.epoch if a.epoch is not None else cp.latest_epoch()
        params = cp.restore_params(epoch,
                                   jax.tree.map(ocp_abstract, tmpl))
        save_torch_checkpoint(params, a.pth, epoch=epoch)
        print(f"exported epoch {epoch} -> {a.pth}")
        return

    ckpt = torch.load(a.pth, map_location="cpu", weights_only=False)
    sd = ckpt.get("state_dict", ckpt)
    epoch = a.epoch if a.epoch is not None else int(ckpt.get("epoch", 0))
    sd_np = {k: v.detach().cpu().numpy() for k, v in sd.items()}
    params = {"params": convert_state_dict(sd_np,
                                            fix_index_path=a.fix_index)}
    n = sum(int(x.size) for x in jax.tree.leaves(params))
    print(f"converted {len(sd_np)} tensors, {n} params -> epoch {epoch}")

    cp = Checkpointer(a.out)
    cp.save(epoch, params, {}, step=0)
    cp.wait()
    print(f"saved to {os.path.abspath(a.out)}/{epoch}")


if __name__ == "__main__":
    main()
