import numpy as np
import pytest

from countdetr_tpu.data.fscd_lvis import (
    FSCDLvisEval, FSCDLvisExemplars, FSCDLvisPoints,
)
from tests.synth_lvis import make_fscd_lvis


@pytest.fixture(scope="module")
def lvis_root(tmp_path_factory):
    return make_fscd_lvis(str(tmp_path_factory.mktemp("fscd_lvis")))


def test_lvis_exemplars(lvis_root):
    ds = FSCDLvisExemplars(lvis_root, "train")
    assert len(ds) == 4
    s = ds[0]
    assert s["image"].shape == (96, 128, 3)
    assert s["points"].shape == (3, 2)
    assert s["whs"].shape == (3, 2)
    assert (s["points"] >= 0).all() and (s["points"] <= 1).all()


def test_lvis_points(lvis_root):
    ds = FSCDLvisPoints(lvis_root, "val")
    s = ds[0]
    assert s["points"].shape[0] >= 3


def test_lvis_eval(lvis_root):
    ds = FSCDLvisEval(lvis_root, "test")
    s = ds[0]
    r = s["exemplar_boxes"]
    assert (r[:, 2] > r[:, 0]).all() and (r[:, 3] > r[:, 1]).all()
    assert s["boxes"].shape[1] == 4
    assert s["points"].shape[0] == s["boxes"].shape[0]
