"""Profiling, logging, and serve.run utilities."""

import json
import time

import numpy as np

from instructany2pix_tpu.utils.logging import MetricLogger
from instructany2pix_tpu.utils.profiling import collect_stages, nan_check, stage


def test_stage_collection():
    with collect_stages() as st:
        with stage("a"):
            time.sleep(0.01)
        with stage("a"):
            pass
        with stage("b"):
            pass
    assert st.times["a"] >= 0.01
    assert "b" in st.times
    assert "a=" in repr(st)


def test_nan_check():
    import pytest

    nan_check({"x": np.ones(3)}, "ok")
    with pytest.raises(FloatingPointError):
        nan_check({"x": np.array([1.0, np.nan])}, "bad")


def test_metric_logger_jsonl(tmp_path, capsys):
    path = str(tmp_path / "log.jsonl")
    lg = MetricLogger(path)
    lg.log(5, {"loss": 1.5})
    rec = json.loads(open(path).read().strip())
    assert rec["step"] == 5 and rec["loss"] == 1.5


def test_metric_logger_image_grid(tmp_path):
    lg = MetricLogger()
    imgs = np.zeros((3, 8, 8, 3), np.uint8)
    p = lg.dump_images(7, imgs, out_dir=str(tmp_path))
    assert p.endswith("step_7.png")
    from PIL import Image

    grid = np.asarray(Image.open(p))
    assert grid.shape == (16, 16, 3)  # 2x2 grid for 3 tiles


def test_serve_run_with_fake_pipe():
    from instructany2pix_tpu import serve

    calls = {}

    def fake_pipe(inst, mm_data, **kw):
        calls["inst"] = inst
        calls["mm"] = mm_data
        calls["kw"] = kw
        return np.zeros((4, 4, 3), np.uint8), np.ones((4, 4, 3), np.uint8), "cap [x]"

    caption, img = serve.run(
        fake_pipe, "add [audio1] to [image1]",
        {"image1": "i.png", "audio1": "a.wav"}, steps=7, cfg=9.0, seed=1,
    )
    assert calls["inst"] == "add <video> to <video>"
    assert calls["kw"]["num_inference_steps"] == 7
    assert calls["kw"]["cfg"] == 9.0
    assert img.max() == 1  # refined image returned
    # marker error surfaces as the caption string
    msg, img2 = serve.run(fake_pipe, "use [image9]", {})
    assert "unknown markers" in msg and img2 is None
