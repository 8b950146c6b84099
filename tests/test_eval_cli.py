"""tools/eval.main end-to-end on a synthetic dataset over the 8-device mesh.

The eval CLI must take the mesh-sharded evaluation path whenever more than
one device is visible (the reference shards eval images across DDP ranks and
all_gathers confusion matrices, plain_train_net.py:136-146); with the
conftest's 8 virtual CPU devices the harness goes through
evaluation.distributed.evaluate_sharded.
"""

import json
import os

import numpy as np
import pytest
from PIL import Image

from catseg_tpu.configs import CLIPVariant
from catseg_tpu.data import catalogs
from catseg_tpu.data.catalogs import DatasetSpec
from catseg_tpu.tools import common as tools_common
from catseg_tpu.tools import eval as eval_cli

from test_catseg_model import mini_cfg


def _mini_eval_preset():
    # real-vocab mini CLIP so the CLI's text pipeline (BPE tokenize ->
    # encode_text) runs for real at toy dims
    var = CLIPVariant("mini", 16, 64, 4, 4, 48, 32, 48, 4, 2,
                      vocab_size=49408, context=77)
    return mini_cfg(clip=var, sliding_window=True, sw_out_res=256,
                    sw_kernel=128, sw_overlap=0.5,
                    min_size_test=128, max_size_test=512)


@pytest.fixture
def synth_dataset(tmp_path, monkeypatch):
    rng = np.random.RandomState(0)
    img_dir = tmp_path / "imgs"
    gt_dir = tmp_path / "gts"
    img_dir.mkdir()
    gt_dir.mkdir()
    names = ["water", "tree", "road", "building", "sky", "car"]
    for i in range(5):  # non-multiple of the 8-device mesh: pad-slot path
        h, w = 100 + 7 * i, 130 - 5 * i
        Image.fromarray(rng.randint(0, 255, (h, w, 3), dtype=np.uint8)).save(
            img_dir / f"im{i}.jpg")
        gt = rng.randint(0, len(names), (h, w)).astype(np.uint8)
        gt[:10] = 255  # ignore band
        Image.fromarray(gt, mode="L").save(gt_dir / f"im{i}.png")
    with open(tmp_path / "mini_classes.json", "w") as f:
        json.dump(names, f)
    spec = DatasetSpec("mini_synth", "imgs", "gts", "mini_classes.json",
                       len(names), 255)
    monkeypatch.setitem(catalogs.DATASETS, "mini_synth", spec)
    monkeypatch.setattr(catalogs, "_class_json_search", lambda: (str(tmp_path),))
    monkeypatch.setitem(tools_common.PRESETS, "mini", _mini_eval_preset)
    return tmp_path


def test_eval_cli_sharded_end_to_end(synth_dataset, capsys):
    out = synth_dataset / "metrics.json"
    eval_cli.main([
        "--config", "mini", "--benchmarks", "mini_synth",
        "--data-root", str(synth_dataset), "--output", str(out),
    ])
    stdout = capsys.readouterr().out
    assert "8-way sharded" in stdout, stdout
    assert "copypaste: mini_synth" in stdout
    m = json.load(open(out))["mini_synth"]
    for k in ("mIoU", "fwIoU", "mACC", "pACC"):
        assert np.isfinite(m[k]), m
    assert m["num_images"] == 5


def test_eval_cli_batched_single_device(synth_dataset, tmp_path, capsys, monkeypatch):
    """On one device the sliding eval runs the fixed-batch loop; with 5
    images and batch 2 the tail batch exercises the all-ignore pad slot.
    Metrics must match the sequential (batch 1) loop exactly."""
    import jax

    one = jax.devices()[:1]
    monkeypatch.setattr(jax, "devices", lambda *a: one)
    results = {}
    for b in (1, 2):
        out = tmp_path / f"m{b}.json"
        eval_cli.main([
            "--config", "mini", "--benchmarks", "mini_synth",
            "--data-root", str(synth_dataset), "--output", str(out),
            "--eval-batch", str(b),
        ])
        results[b] = json.load(open(out))["mini_synth"]
    stdout = capsys.readouterr().out
    assert "(batch 2)" in stdout and "sharded" not in stdout
    for k in ("mIoU", "fwIoU", "mACC", "pACC", "num_images"):
        assert results[1][k] == pytest.approx(results[2][k], abs=1e-9), k


def test_eval_cli_sequential_when_dumping(synth_dataset, tmp_path, capsys, monkeypatch):
    """Per-image dump paths stay on the sequential predictor."""
    monkeypatch.chdir(tmp_path)  # visuals land in ./eval_visuals
    eval_cli.main([
        "--config", "mini", "--benchmarks", "mini_synth",
        "--data-root", str(synth_dataset),
        "--dump-visuals", "1", "--limit", "2",
        "--output", str(tmp_path / "m.json"),
    ])
    stdout = capsys.readouterr().out
    assert "sharded" not in stdout
    assert "copypaste: mini_synth" in stdout
    assert json.load(open(tmp_path / "m.json"))["mini_synth"]["num_images"] == 2
