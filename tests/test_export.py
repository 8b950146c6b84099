"""StableHLO serving export: serialize -> reload -> bit-identical argmax.

TPU-native counterpart of the reference's ONNX export capability
(segment_anything/utils/onnx.py); the artifact embeds weights + text
features and runs without the model's Python code.
"""

import numpy as np
import pytest

import jax

from catseg_tpu.core import catseg
from catseg_tpu.infer.export import ExportSpec, export_serving, load_exported, make_serve_fn

from test_catseg_model import mini_cfg


def test_export_roundtrip(tmp_path):
    cfg = mini_cfg(sliding_window=True, sw_out_res=256, sw_kernel=128, sw_overlap=0.5)
    params = catseg.init_catseg_params(jax.random.PRNGKey(0), cfg)
    rng = np.random.RandomState(7)
    text = rng.randn(6, 1, 48).astype(np.float32)
    text /= np.linalg.norm(text, axis=-1, keepdims=True)
    spec = ExportSpec(input_canvas=(256, 256), out_canvas=(192, 192), num_classes=6)

    path = str(tmp_path / "serve.hlo")
    exported = export_serving(params, cfg, text, spec, path)
    assert exported.in_avals[0].shape == (256, 256, 3)

    canvas = np.zeros((256, 256, 3), np.uint8)
    canvas[:200, :230] = rng.randint(0, 255, (200, 230, 3), dtype=np.uint8)
    hw = np.asarray([200, 230], np.int32)
    out_hw = np.asarray([150, 180], np.int32)

    got = np.asarray(load_exported(path)(canvas, hw, out_hw))
    want = np.asarray(make_serve_fn(params, cfg, text, spec)(canvas, hw, out_hw))
    assert got.shape == (192, 192)
    np.testing.assert_array_equal(got, want)


def test_export_cli(tmp_path, capsys):
    from catseg_tpu.tools import common as tools_common
    from catseg_tpu.tools import export as export_cli
    from catseg_tpu.configs import CLIPVariant

    var = CLIPVariant("mini", 16, 64, 4, 4, 48, 32, 48, 4, 2,
                      vocab_size=49408, context=77)
    preset = lambda: mini_cfg(clip=var, sliding_window=True, sw_out_res=256,
                              sw_kernel=128, sw_overlap=0.5)
    tools_common.PRESETS["mini_export"] = preset
    try:
        out = str(tmp_path / "m.hlo")
        export_cli.main([
            "--config", "mini_export", "--classes", "water,tree,road",
            "--canvas", "256x256", "--out-canvas", "192x192",
            "--output", out, "--check",
        ])
    finally:
        del tools_common.PRESETS["mini_export"]
    stdout = capsys.readouterr().out
    assert "check OK" in stdout, stdout
