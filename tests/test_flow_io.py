"""Middlebury .flo IO + flow evaluation metrics (utils/flow_io.py)."""

import numpy as np
import pytest

from perceiverio_pytorch_tpu.utils.flow_io import (
    flow_error_stats,
    read_flo,
    write_flo,
)


def test_flo_roundtrip_both_layouts(tmp_path):
    rng = np.random.RandomState(0)
    flow = rng.randn(2, 12, 17).astype(np.float32) * 5
    p = str(tmp_path / "a.flo")
    write_flo(p, flow)
    np.testing.assert_array_equal(read_flo(p), flow)
    # HWC layout writes identically
    write_flo(p, np.transpose(flow, (1, 2, 0)))
    np.testing.assert_array_equal(read_flo(p), flow)


def test_flo_rejects_garbage(tmp_path):
    p = tmp_path / "bad.flo"
    p.write_bytes(b"\x00" * 32)
    with pytest.raises(ValueError, match="not a .flo"):
        read_flo(str(p))
    with pytest.raises(ValueError, match="rank 3"):
        write_flo(str(tmp_path / "x.flo"), np.zeros((4, 4)))


def test_flow_error_stats_exact_values():
    gt = np.zeros((2, 4, 4), np.float32)
    pred = np.zeros((2, 4, 4), np.float32)
    pred[0, 0, :] = 4.0  # 4 pixels at EPE 4 (outliers vs zero-mag gt)
    stats = flow_error_stats(pred, gt)
    assert stats["pixels"] == 16
    np.testing.assert_allclose(stats["aepe"], 4 * 4.0 / 16)
    np.testing.assert_allclose(stats["acc_1px"], 12 / 16)
    np.testing.assert_allclose(stats["acc_3px"], 12 / 16)
    np.testing.assert_allclose(stats["acc_5px"], 1.0)
    np.testing.assert_allclose(stats["fl_outlier"], 4 / 16)
    # valid mask excludes the bad row
    masked = flow_error_stats(pred, gt, valid=(pred[0] == 0))
    assert masked["aepe"] == 0.0 and masked["pixels"] == 12


def test_evaluate_flow_example_end_to_end(tmp_path):
    """The eval harness over a synthetic scene: constant-shift gt .flo,
    tiny random-weight model -- pipeline, tiling and metric plumbing run."""
    import importlib.util
    import os

    from PIL import Image

    (tmp_path / "frames").mkdir()
    (tmp_path / "flow").mkdir()
    rng = np.random.RandomState(0)
    h, w = 80, 120  # larger than the small model's 64x96 -> exercises tiling
    base = (rng.rand(h + 8, w + 8, 3) * 255).astype(np.uint8)
    for i, dx in enumerate([0, 2, 4]):
        frame = base[4 : 4 + h, 4 + dx : 4 + dx + w]
        Image.fromarray(frame).save(tmp_path / "frames" / f"frame_{i:04d}.png")
        if i < 2:
            gt = np.zeros((2, h, w), np.float32)
            gt[0] = 2.0  # constant +2px horizontal shift
            write_flo(str(tmp_path / "flow" / f"frame_{i:04d}.flo"), gt)

    spec = importlib.util.spec_from_file_location(
        "evaluate_flow",
        os.path.join(os.path.dirname(__file__), os.pardir, "examples",
                     "evaluate_flow.py"),
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    result = mod.main(str(tmp_path), small=True)
    assert result["pairs"] == 2
    assert np.isfinite(result["aepe"])
    assert 0.0 <= result["acc_5px"] <= 1.0
