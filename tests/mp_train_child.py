"""Child process for the 2-process distributed smoke test
(tests/test_multiprocess.py). Trains one stage-1 epoch on a deterministic
synthetic batch set and prints the epoch-mean loss.

Run as: python mp_train_child.py <process_id> <num_processes> <port>
(num_processes=1 runs the single-process reference with 2 local devices).
"""

import os
import sys

os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=2"
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache_mp")

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_default_matmul_precision", "highest")

import numpy as np  # noqa: E402


class SynthDs:
    """Deterministic stage-1 samples, one (64, 96) bucket."""

    def __init__(self, n=4):
        self.n = n

    def __len__(self):
        return self.n

    def __getitem__(self, i):
        rng = np.random.default_rng(100 + i)
        return {
            "image": rng.normal(size=(64, 96, 3)).astype(np.float32),
            "points": rng.uniform(0.2, 0.8, (3, 2)).astype(np.float32),
            "whs": rng.uniform(0.1, 0.3, (3, 2)).astype(np.float32),
            "orig_size": (96, 64),
            "image_name": f"{i}.jpg",
        }

    def image_size(self, i):
        return (64, 96)


def main():
    pid, nproc, port = int(sys.argv[1]), int(sys.argv[2]), sys.argv[3]
    n_samples = int(sys.argv[4]) if len(sys.argv) > 4 else 4
    if nproc > 1:
        jax.distributed.initialize(
            f"127.0.0.1:{port}", num_processes=nproc, process_id=pid
        )
        # form the Gloo context NOW, while both processes are still in
        # lockstep from initialize(): its 30 s key-exchange deadline cannot
        # absorb the later compile-time skew on a contended host
        from jax.experimental import multihost_utils

        multihost_utils.sync_global_devices("boot")

    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    from countdetr_tpu import config as cfglib
    from countdetr_tpu.core.mesh import make_mesh, replicate, shard_batch
    from countdetr_tpu.data.batching import Batcher
    from countdetr_tpu.models import CountingDetr
    from countdetr_tpu.train.optimizer import build_optimizer
    from countdetr_tpu.train.train_step import create_state, make_train_step

    cfg = cfglib.stage1_config()
    cfg = cfg.replace(
        model=cfg.model.replace(
            enc_layers=1, dec_layers=1, hidden_dim=32, nheads=4,
            dim_feedforward=64,
        ),
        train=cfg.train.replace(lr=1e-3),
    )
    mesh = make_mesh((-1,), ("data",))

    # per-process local batch size x process count == global batch 4
    local_bs = 4 // nproc
    b = Batcher(
        SynthDs(n_samples), local_bs, ((64, 96),), max_points=4,
        process_index=pid, process_count=nproc,
    )
    # SPMD lockstep (what cli/main does): cap every host at the cross-host
    # minimum batch count so uneven datasets cannot deadlock an epoch
    steps = b.num_batches()
    if nproc > 1:
        from jax.experimental import multihost_utils

        counts = multihost_utils.process_allgather(
            np.array([steps], np.int64)
        )
        b.step_cap = max(int(np.min(counts)), 1)

    model = CountingDetr(cfg.model)
    params = model.init(
        jax.random.PRNGKey(0),
        np.zeros((local_bs, 64, 96, 3), np.float32),
        np.zeros((local_bs, 64, 96), bool),
        np.full((local_bs, 4, 2), 0.5, np.float32),
        np.ones((local_bs, 4), bool),
    )
    with mesh:
        params = replicate(params, mesh)
        tx = build_optimizer(cfg.train, params, steps_per_epoch=10)
        state = create_state(params, tx)  # opt_state/step from global params
        state = state._replace(
            step=replicate(state.step, mesh),
            bad_steps=replicate(state.bad_steps, mesh),
        )
        step = make_train_step(model, tx, cfg)
        losses = []
        compiled = False
        for batch in b:
            batch.pop("meta"), batch.pop("bucket")
            db = shard_batch(batch, mesh)
            if nproc > 1 and not compiled:
                # AOT-compile BEFORE the first execution, then rendezvous:
                # the train step's first run forms a fresh Gloo context
                # whose 30 s key exchange cannot absorb per-process compile
                # skew (one process hits the persistent cache, the other
                # compiles cold for minutes on a contended host)
                step.lower(state, db).compile()
                from jax.experimental import multihost_utils

                multihost_utils.sync_global_devices("train-compiled")
                compiled = True
            state, metrics = step(state, db)
            losses.append(float(metrics["loss"]))

        # collective ASYNC checkpoint while training continues (what
        # cli/main's epoch loop does): every process calls save/finalize,
        # exercising orbax's multihost commit barrier under jax.distributed
        out_dir = sys.argv[5] if len(sys.argv) > 5 else ""
        if out_dir:
            from countdetr_tpu.train import checkpoints as ckpt

            saver = ckpt.AsyncSaver()
            saver.save(out_dir, 0, state, {"epoch": 0})
            state, metrics = step(state, db)  # overlap the write
            losses.append(float(metrics["loss"]))
            saver.finalize()
            assert ckpt.latest_step(out_dir) == 0, "async save not committed"
            p, o, _ = ckpt.restore_checkpoint(out_dir, 0, state)
            n_restored = len(jax.tree_util.tree_leaves(p))
            print(f"CKPT pid={pid} restored_leaves={n_restored}", flush=True)
    print(f"RESULT pid={pid} losses={','.join(f'{l:.8f}' for l in losses)}",
          flush=True)


if __name__ == "__main__":
    main()
