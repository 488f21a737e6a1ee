"""Shared on-disk decoded-image cache.

The in-RAM decoded cache (`--decoded_cache`, data/fscd147.py::load_image)
has two limits on a real multi-worker host:

  * every spawn worker (data/loader.py) holds its OWN copy of the dataset,
    so N workers decode every image once EACH and hold N copies in RAM
    (FSC-147 at 592px: ~3.7 GB of resized uint8 per worker);
  * the cache dies with the process — every run pays a cold first epoch.

This disk cache fixes both: resized uint8 arrays live as .npy blobs in one
directory shared by all workers (and all runs — the resize is deterministic
in (image bytes, scale_factor), so the cache survives restarts). Writers
are crash-safe and race-safe: blobs are written to a unique temp file and
`os.replace`d into place, so concurrent workers at worst both decode once
and one rename wins; readers only ever see complete files. Reads are
OS-page-cache-backed, so a warm epoch costs a memcpy, not a JPEG decode.

The reference's nearest artifact is the rank-sharded raw-bytes RAM cache
(reference datasets/torchvision_datasets/coco.py:54-73), which still pays
decode+resize every epoch.
"""

from __future__ import annotations

import hashlib
import os
import tempfile

import numpy as np


class DiskDecodedCache:
    """dict-like mapping image path -> (resized uint8 HWC array, (w, h)),
    backed by .npz files. Drop-in for the dict `decoded_cache` consumed by
    data/fscd147.py::load_image (needs __contains__/__getitem__/__setitem__).

    The cache key includes the scale-invariant identity of the entry: the
    source path's basename plus a hash of its absolute path, so distinct
    datasets sharing a directory never collide. Callers resizing the same
    image differently must use different cache directories (the shipped
    readers derive one resize per dataset root from --scale_factor, which
    is constant for a run)."""

    def __init__(self, directory: str):
        self.dir = directory
        os.makedirs(directory, exist_ok=True)

    def _file(self, path: str) -> str:
        h = hashlib.sha1(os.path.abspath(path).encode()).hexdigest()[:16]
        base = os.path.splitext(os.path.basename(path))[0]
        return os.path.join(self.dir, f"{base}.{h}.npz")

    def __contains__(self, path: str) -> bool:
        return os.path.exists(self._file(path))

    def __getitem__(self, path: str):
        f = self._file(path)
        try:
            with np.load(f) as z:
                arr8 = z["arr"]
                w, h = (int(x) for x in z["size"])
        except (OSError, KeyError, ValueError) as e:
            # torn/corrupt blob (e.g. disk filled mid-replace on some FS):
            # treat as a miss so the caller re-decodes and rewrites
            raise KeyError(path) from e
        return arr8, (w, h)

    def __setitem__(self, path: str, value):
        arr8, (w, h) = value
        f = self._file(path)
        fd, tmp = tempfile.mkstemp(dir=self.dir, suffix=".tmp")
        try:
            with os.fdopen(fd, "wb") as out:
                np.savez(out, arr=np.asarray(arr8, np.uint8),
                         size=np.array([w, h], np.int64))
            os.replace(tmp, f)  # atomic publish; concurrent writers race OK
        except BaseException:
            try:
                os.unlink(tmp)
            except OSError:
                pass
            raise

    def __len__(self) -> int:
        return sum(1 for n in os.listdir(self.dir) if n.endswith(".npz"))


def decoded_cache_from_mode(cache_mode):
    """Map a dataset cache_mode to its decoded-cache object:
    'decoded' -> per-process RAM dict; 'disk:<dir>' -> shared
    DiskDecodedCache; anything else -> None (byte cache / no cache are the
    caller's concern)."""
    if cache_mode == "decoded":
        return {}
    if isinstance(cache_mode, str) and cache_mode.startswith("disk:"):
        return DiskDecodedCache(cache_mode[len("disk:"):])
    return None
