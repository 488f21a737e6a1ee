"""Process-parallel sample loading (data/loader.py): num_workers > 0 must be
a pure performance knob — batch streams identical to the serial path — and
the decoded-uint8 cache must return bit-identical images."""

import os

import numpy as np
import pytest

from countdetr_tpu.data.batching import Batcher
from countdetr_tpu.data.fscd147 import FSCD147Points, load_image
from tests.synth import make_fscd147


@pytest.fixture(scope="module")
def data_root(tmp_path_factory):
    return make_fscd147(str(tmp_path_factory.mktemp("fscd147_loader")))


def _collect(batcher, epochs=1):
    out = []
    for _ in range(epochs):
        for b in batcher:
            out.append(b)
    return out


def test_parallel_loader_matches_serial(data_root):
    ds = FSCD147Points(data_root, "train")
    serial = _collect(
        Batcher(ds, 2, ((96, 128),), max_points=64, shuffle=True, seed=5)
    )
    parallel = _collect(
        Batcher(
            ds, 2, ((96, 128),), max_points=64, shuffle=True, seed=5,
            num_workers=2,
        )
    )
    assert len(serial) == len(parallel) > 0
    for s, p in zip(serial, parallel):
        assert [m["image_name"] for m in s["meta"]] == [
            m["image_name"] for m in p["meta"]
        ]
        np.testing.assert_array_equal(s["images"], p["images"])
        np.testing.assert_array_equal(s["points"], p["points"])
        np.testing.assert_array_equal(s["batch_valid"], p["batch_valid"])


def test_parallel_loader_persists_across_epochs(data_root):
    ds = FSCD147Points(data_root, "train")
    b = Batcher(
        ds, 2, ((96, 128),), max_points=64, shuffle=True, seed=5,
        num_workers=2,
    )
    e1 = _collect(b)
    pool_after_e1 = b._loader
    e2 = _collect(b)
    assert b._loader is pool_after_e1  # one spawn cost for the whole run
    # epoch shuffles differ (epoch-seeded) but coverage is the whole set
    names = lambda bs: {
        m["image_name"] for x in bs for m, v in zip(x["meta"], x["batch_valid"]) if v
    }
    assert names(e1) == names(e2)
    b._loader.close()


def test_decoded_cache_bit_identical(data_root):
    import os

    path = os.path.join(
        data_root, "images_384_VarV2",
        sorted(os.listdir(os.path.join(data_root, "images_384_VarV2")))[0],
    )
    cold, size_cold = load_image(path, 32)
    cache = {}
    warm1, size1 = load_image(path, 32, decoded_cache=cache)
    assert len(cache) == 1
    warm2, size2 = load_image(path, 32, decoded_cache=cache)  # cache hit
    assert size_cold == size1 == size2
    np.testing.assert_array_equal(cold, warm1)
    np.testing.assert_array_equal(warm1, warm2)


def test_loader_bounded_inflight(tmp_path):
    """The parallel loader must never run the whole epoch ahead of the
    consumer: decoded results held in host memory are capped by the window
    (Pool.imap would buffer every unconsumed result — on real datasets that
    is gigabytes of decoded images whenever the device is the bottleneck)."""
    import time

    from countdetr_tpu.data.loader import SampleLoader
    from tests.synth import TouchCountingDataset

    n = 64
    ds = TouchCountingDataset(str(tmp_path), n=n)
    loader = SampleLoader(ds, 2)  # default window = max(8, 4*2) = 8
    try:
        it = loader.iter_samples(list(range(n)))
        got = [next(it) for _ in range(3)]
        assert got == [0, 1, 2]
        # give the pool ample time to run ahead if submission were unbounded
        deadline = time.time() + 3.0
        while time.time() < deadline and len(os.listdir(tmp_path)) <= 12:
            time.sleep(0.2)
        touched = len(os.listdir(tmp_path))
        # consumed 3 + window 8 = 11 loads may have started, not the full 64
        assert touched <= 12, f"loader ran {touched} loads ahead (window=8)"
        rest = list(it)
        assert got + rest == list(range(n))
        assert len(os.listdir(tmp_path)) == n
    finally:
        loader.close()


def test_disk_decoded_cache_bit_identical(data_root, tmp_path):
    from countdetr_tpu.data.cache import DiskDecodedCache

    path = os.path.join(
        data_root, "images_384_VarV2",
        sorted(os.listdir(os.path.join(data_root, "images_384_VarV2")))[0],
    )
    cold, size_cold = load_image(path, 32)
    cache = DiskDecodedCache(str(tmp_path / "dcache"))
    warm1, size1 = load_image(path, 32, decoded_cache=cache)
    assert len(cache) == 1 and path in cache
    warm2, size2 = load_image(path, 32, decoded_cache=cache)  # disk hit
    assert size_cold == size1 == size2
    np.testing.assert_array_equal(cold, warm1)
    np.testing.assert_array_equal(warm1, warm2)


def test_disk_decoded_cache_torn_blob_recovers(data_root, tmp_path):
    """A truncated .npz (crash mid-write on a non-atomic FS) must behave as
    a miss — re-decode and rewrite — never crash the loader."""
    from countdetr_tpu.data.cache import DiskDecodedCache

    path = os.path.join(
        data_root, "images_384_VarV2",
        sorted(os.listdir(os.path.join(data_root, "images_384_VarV2")))[0],
    )
    cache = DiskDecodedCache(str(tmp_path / "dcache"))
    good, size = load_image(path, 32, decoded_cache=cache)
    blob = cache._file(path)
    with open(blob, "wb") as f:
        f.write(b"\x00" * 16)  # torn
    again, size2 = load_image(path, 32, decoded_cache=cache)
    np.testing.assert_array_equal(good, again)
    assert size == size2
    # and the rewrite healed the blob
    healed, _ = cache[path]
    assert healed.dtype == np.uint8


def test_disk_cache_shared_across_workers(data_root, tmp_path):
    """With cache_mode='disk:<dir>', spawn workers share ONE cache: each
    image is decoded once globally (not once per worker), batches stay
    bit-identical to the serial path, and a second Batcher (a 'new run')
    starts warm."""
    from countdetr_tpu.data.fscd147 import FSCD147Points

    cdir = str(tmp_path / "shared")
    ds = FSCD147Points(data_root, "train", cache_mode=f"disk:{cdir}")
    serial = _collect(
        Batcher(FSCD147Points(data_root, "train"), 2, ((96, 128),),
                max_points=64, shuffle=True, seed=5)
    )
    parallel = _collect(
        Batcher(ds, 2, ((96, 128),), max_points=64, shuffle=True, seed=5,
                num_workers=2)
    )
    assert len(serial) == len(parallel) > 0
    for s, p in zip(serial, parallel):
        np.testing.assert_array_equal(s["images"], p["images"])
    n_blobs = len(os.listdir(cdir))
    assert n_blobs == len(ds)  # one blob per image, no .tmp litter
    # a fresh dataset object (new run) reads the same cache
    ds2 = FSCD147Points(data_root, "train", cache_mode=f"disk:{cdir}")
    warm = _collect(
        Batcher(ds2, 2, ((96, 128),), max_points=64, shuffle=True, seed=5)
    )
    for s, w in zip(serial, warm):
        np.testing.assert_array_equal(s["images"], w["images"])
    assert len(os.listdir(cdir)) == n_blobs


def test_raw_uint8_pipe_matches_host_normalized(data_root):
    """host_normalize=False emits resized RAW uint8; applying the ImageNet
    normalize to it reproduces the host-normalized sample bit-for-bit, and
    all annotations are untouched."""
    from countdetr_tpu.data.fscd147 import (
        FSCD147Points, IMAGENET_MEAN, IMAGENET_STD,
    )

    ds_f = FSCD147Points(data_root, "train")
    ds_u = FSCD147Points(data_root, "train")
    ds_u.host_normalize = False
    s_f, s_u = ds_f[0], ds_u[0]
    assert s_u["image"].dtype == np.uint8
    host = ((s_u["image"].astype(np.float32) / 255.0)
            - IMAGENET_MEAN) / IMAGENET_STD
    np.testing.assert_array_equal(host, s_f["image"])
    np.testing.assert_array_equal(s_f["points"], s_u["points"])
    assert s_f["orig_size"] == s_u["orig_size"]
    # the Batcher keeps the dtype through padding
    b = next(iter(Batcher(ds_u, 2, ((96, 128),), max_points=64)))
    assert b["images"].dtype == np.uint8
