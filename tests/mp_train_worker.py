"""Worker process for the multi-process distributed training test.

Spawned (2x) by tests/test_distributed.py: each OS process joins the global
runtime via ``dctseg.parallel.distributed.initialize`` (the jax analogue of
the reference's one-process-per-GPU ``torch.distributed.launch`` + NCCL
init, train.py:1,128), hosts 4 virtual CPU devices, loads only its own rows
of the global batch, and runs the sharded train step over the 8-device
global mesh.  Results go to a JSON file for the parent to compare.

Run directly:  python tests/mp_train_worker.py <pid> <nproc> <port> <out.json>
With a 6th arg ``<ckpt_dir>`` the run ends in a collective orbax save; a 7th
arg ``preempt`` switches to the preemption scenario: SIGTERM is delivered to
RANK 0 ONLY mid-fit, and the per-step any-reduce in Trainer._should_stop
must pull every rank into the same coordinated stop + collective partial
save (signal skew across hosts is the real pod-preemption shape).
"""

import json
import os
import signal
import sys


def main():
    pid, nproc = int(sys.argv[1]), int(sys.argv[2])
    port, out_path = sys.argv[3], sys.argv[4]
    ckpt_dir = sys.argv[5] if len(sys.argv) > 5 else ""
    mode = sys.argv[6] if len(sys.argv) > 6 else ""

    os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=4"
    os.environ.pop("PALLAS_AXON_POOL_IPS", None)  # sitecustomize TPU hook
    os.environ["JAX_PLATFORMS"] = "cpu"

    import jax
    jax.config.update("jax_platforms", "cpu")
    root = os.path.join(os.path.dirname(os.path.abspath(__file__)), "..")
    jax.config.update("jax_compilation_cache_dir",
                      os.path.join(root, ".jax_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
    sys.path.insert(0, root)

    from dctseg.parallel import distributed
    distributed.initialize(f"localhost:{port}", nproc, pid)
    assert jax.process_count() == nproc, jax.process_count()
    assert jax.local_device_count() == 4
    assert jax.device_count() == 4 * nproc

    import numpy as np
    from dctseg.config import Config, DataConfig, TrainConfig, \
        tiny_model_config
    from dctseg.train.trainer import Trainer

    # input_shape == crop_size: the random crop is the identity, so sample
    # content is deterministic per index and the global loss is comparable
    # with a single-process run over the same global batch
    preempt = mode == "preempt"
    cfg = Config(
        model=tiny_model_config(img_dim=16, top_num=2),
        data=DataConfig(synthetic_num_samples=8,
                        input_shape=(16, 16, 16), pad_depth=16,
                        crop_size=(16, 16, 16), num_workers=2),
        train=TrainConfig(end_epoch=1000 if preempt else 2,
                          save_freq=1 if preempt else 1000, lr=1e-3,
                          checkpoint_dir=ckpt_dir or "/tmp/mp_ckpt_unused"),
    )
    tr = Trainer(cfg)
    assert tr.global_batch == 8
    assert tr.loader.batch_size == 8 // nproc      # process-local rows
    assert tr.loader.num_shards == nproc

    if preempt:
        # SIGTERM rank 0 ONLY, from inside fit (the every-epoch eval hook,
        # save_freq=1) once real steps have run: ranks must agree on the
        # stop step via _should_stop's any-reduce even though rank 1 never
        # sees a signal, then all join the collective partial save.
        def evall(trainer, epoch):
            if epoch == 2 and jax.process_index() == 0:
                os.kill(os.getpid(), signal.SIGTERM)
        m = tr.fit(eval_fn=evall)
        leaf = np.asarray(jax.tree.leaves(tr.state.params)[0], np.float64)
        with open(out_path, "w") as f:
            json.dump({"pid": pid,
                       "process_index": jax.process_index(),
                       "preempted": tr.preempted,
                       "step": int(tr.state.step),
                       "loss": float(m["loss"]),
                       "param_sum": float(leaf.sum())}, f)
        print(f"proc {pid}: preempted={tr.preempted} "
              f"step={int(tr.state.step)}", flush=True)
        return

    tr.init_state()
    m0 = tr.train_epoch(0)
    m1 = tr.train_epoch(1)

    if ckpt_dir:  # collective orbax save: every process participates
        tr.ckpt.save(1, tr.state.params, tr.state.opt_state,
                     int(tr.state.step))
        tr.ckpt.wait()

    # checksum of a param leaf: replicas must be identical across processes
    leaf = np.asarray(jax.tree.leaves(tr.state.params)[0], np.float64)
    with open(out_path, "w") as f:
        json.dump({"pid": pid,
                   "process_index": jax.process_index(),
                   "global_devices": jax.device_count(),
                   "loss0": float(m0["loss"]), "loss1": float(m1["loss"]),
                   "dice_wt1": float(m1["dice_wt"]),
                   "param_sum": float(leaf.sum())}, f)
    print(f"proc {pid}: loss0={m0['loss']:.6f} loss1={m1['loss']:.6f}",
          flush=True)


if __name__ == "__main__":
    main()
