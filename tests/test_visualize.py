import json
import os

import numpy as np
from PIL import Image

from countdetr_tpu.utils.visualize import draw_detections, plot_training_log


def test_draw_detections(tmp_path):
    img = np.zeros((64, 96, 3), np.uint8)
    boxes = np.array([[30, 30, 20, 10], [60, 40, 10, 10]], np.float32)
    pts = np.array([[30, 30]], np.float32)
    out = draw_detections(img, boxes, pts, scores=np.array([0.9, 0.5]))
    assert out.size == (96, 64)
    assert np.asarray(out).sum() > 0  # something was drawn


def test_plot_training_log(tmp_path):
    log = tmp_path / "log.txt"
    with open(log, "w") as f:
        for i in range(5):
            f.write(json.dumps({"loss": 1.0 / (i + 1), "epoch": i}) + "\n")
    out = tmp_path / "plot.png"
    plot_training_log([str(log)], keys=("loss",), out_path=str(out))
    assert os.path.exists(out)
