"""Process-parallel sample loading (data/loader.py): num_workers > 0 must be
a pure performance knob — batch streams identical to the serial path — and
the decoded-uint8 cache must return bit-identical images."""

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
