"""MLM evaluation harness (examples/evaluate_mlm.py)."""

import importlib.util
import os

import numpy as np


def _load():
    spec = importlib.util.spec_from_file_location(
        "evaluate_mlm",
        os.path.join(os.path.dirname(__file__), os.pardir, "examples",
                     "evaluate_mlm.py"),
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def test_partial_decode_matches_full_decode_metrics():
    """The predict_positions fast path must produce the same accuracy and
    cross-entropy as scoring the full [B, T, vocab] decode."""
    mod = _load()
    fast = mod.main(batch_size=4, limit=8, partial_decode=True)
    slow = mod.main(batch_size=4, limit=8, partial_decode=False)
    assert fast["sequences"] == slow["sequences"] > 0
    assert fast["masked_tokens"] == slow["masked_tokens"]
    np.testing.assert_allclose(fast["masked_accuracy"],
                               slow["masked_accuracy"], atol=1e-6)
    np.testing.assert_allclose(fast["masked_ce"], slow["masked_ce"],
                               atol=2e-3)
    assert np.isfinite(fast["masked_ce"])
    assert 0.0 <= fast["masked_accuracy"] <= 1.0
