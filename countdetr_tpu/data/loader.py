"""Process-parallel sample loading for the Batcher.

The measured gap this closes: the device trains at ~533 img/s (592px, bf16,
PERFORMANCE.md) while ONE Python thread decodes JPEG + resizes at
single-digit img/s — on real data the input pipeline, not the chip, bounds
throughput. The reference's answer was a CUDA-stream prefetcher it never
wired up (reference datasets/data_prefetcher.py:23-79) plus a raw-bytes RAM
cache (torchvision_datasets/coco.py:54-73). The TPU-native answer:

  * a spawn-context worker pool runs dataset[i] across cores. Workers are
    plain numpy/PIL processes — the axon/jax bootstrap env var is stripped
    before spawning so a worker never imports jax (each jax init costs
    40-60 s and a TPU tunnel handle);
  * the Batcher's global schedule (batching.py) knows every index a batch
    needs ahead of time, so a windowed ordered stream decodes samples with
    zero speculation and BOUNDED memory: at most `window` results are ever
    submitted-but-unconsumed (Pool.imap would not give this — its feeder
    thread drains the whole index list and buffers every result the
    consumer hasn't read yet, i.e. up to the full epoch of decoded
    images when the device is the bottleneck);
  * the pool is persistent across epochs (spawn startup is paid once).

`Batcher(..., num_workers=N)` routes loading through this module; N == 0
keeps the in-process serial path (identical outputs — tests assert it).
"""

from __future__ import annotations

import os
from typing import List, Optional, Tuple

# set in each worker by _init_worker
_WORKER_DS = None

# env vars that make a bare python interpreter boot a jax/TPU stack via
# sitecustomize; workers must come up as plain numpy processes
_HEAVY_BOOT_VARS = ("PALLAS_AXON_POOL_IPS",)


def _init_worker(dataset):
    global _WORKER_DS
    _WORKER_DS = dataset


def _load_one(idx: int):
    return _WORKER_DS[idx]


class SampleLoader:
    """Persistent spawn pool evaluating dataset[i] out-of-process.

    The dataset object is pickled ONCE (pool initializer), not per task.
    All shipped readers hold only dicts/lists/paths, so pickling is cheap;
    per-worker byte/decoded caches warm independently.
    """

    def __init__(self, dataset, num_workers: int):
        import multiprocessing as mp
        import sys

        self.num_workers = num_workers
        if type(dataset).__module__ == "__main__":
            # spawn workers unpickle the dataset by importing its defining
            # module; __main__ isn't importable from a worker, and the
            # failure mode is a silent respawn loop — fail loudly instead
            raise ValueError(
                f"num_workers > 0 needs a dataset class defined in an "
                f"importable module, not __main__ "
                f"({type(dataset).__name__}); move the class into a module "
                f"or use num_workers=0"
            )
        ctx = mp.get_context("spawn")
        saved = {}
        for k in _HEAVY_BOOT_VARS:
            if k in os.environ:
                saved[k] = os.environ.pop(k)
        # spawn re-runs the parent's __main__ in each worker; a
        # non-importable main ('<stdin>', '-c', REPL) would make every
        # worker die with FileNotFoundError and respawn forever. Dropping
        # the bogus __file__ makes multiprocessing skip the main fixup
        # (worker code lives in THIS importable module, so nothing needs it).
        main_mod = sys.modules.get("__main__")
        main_file = getattr(main_mod, "__file__", None)
        strip = main_file is not None and not os.path.exists(main_file)
        try:
            if strip:
                del main_mod.__file__
            self._pool = ctx.Pool(
                num_workers, initializer=_init_worker, initargs=(dataset,)
            )
        finally:
            if strip:
                main_mod.__file__ = main_file
            os.environ.update(saved)

    def iter_samples(self, indices: List[int], window: Optional[int] = None):
        """Ordered stream of dataset[i] for i in indices.

        At most `window` tasks are in flight (submitted but not yet yielded)
        at any moment, so host memory holds O(window) decoded samples even
        when the consumer is slower than the workers. Default window keeps
        every worker busy with headroom (4x workers, min 8)."""
        if window is None:
            window = max(8, 4 * self.num_workers)
        from collections import deque

        pending = deque()
        it = iter(indices)
        for i in it:
            pending.append(self._pool.apply_async(_load_one, (i,)))
            if len(pending) >= window:
                break
        for i in it:
            out = pending.popleft().get()
            pending.append(self._pool.apply_async(_load_one, (i,)))
            yield out
        while pending:
            yield pending.popleft().get()

    def close(self):
        if self._pool is not None:
            self._pool.terminate()
            self._pool.join()
            self._pool = None

    def __del__(self):
        try:
            self.close()
        except Exception:
            pass


def iter_batches_parallel(batcher, plan: List[Tuple]):
    """Yield assembled batches for a Batcher epoch plan
    [(key, my_indices, my_real)], loading samples through the Batcher's
    persistent SampleLoader while the main process assembles."""
    flat: List[int] = []
    for _, mine, _ in plan:
        flat.extend(mine)
    it = batcher._loader.iter_samples(flat)
    for (bucket, pt_cap, box_cap), mine, my_real in plan:
        samples = [next(it) for _ in mine]
        yield batcher._assemble(samples, bucket, pt_cap, box_cap, my_real)
