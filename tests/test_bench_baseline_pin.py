"""The driver's vs_baseline resolution: committed pin first, never a
silent re-measure for a known chip type.

bench.py's headline multiple divides by the fp32 parity baseline; round 3
showed a +/-12% spread between a stale cache and a fresh measurement made
every "Nx" claim soft.  The committed ``bench_baselines.json`` pin (median
over >=3 fresh processes per chip type) is what BENCH artifacts divide by
-- these tests keep that contract honest without touching hardware.
"""

import importlib.util
import json
import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _load_bench():
    spec = importlib.util.spec_from_file_location(
        "bench", os.path.join(REPO, "bench.py")
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def test_committed_pin_is_well_formed():
    with open(os.path.join(REPO, "bench_baselines.json")) as f:
        pins = json.load(f)
    entries = {k: v for k, v in pins.items() if not k.startswith("_")}
    assert entries, "no chip-type entries committed"
    for kind, e in entries.items():
        lo, hi = e["band"]
        med = e["fp32_images_per_sec_median"]
        assert lo <= med <= hi, (kind, e)
        assert e["n"] >= 3 and len(e["values"]) >= 3
        assert all(lo <= v <= hi for v in e["values"])
        assert e["batch"] == 16  # the headline batch bench.py measures at


def test_task_all_runs_headline_last_and_budget_skips(monkeypatch):
    """The driver parses the FINAL stdout line: --task all must run the
    secondary tasks first and the imagenet headline last, and the budget
    guard must skip secondaries (never the headline) when the wall-clock
    budget cannot cover them."""
    bench = _load_bench()
    calls = []
    monkeypatch.setattr(bench, "bench_flow", lambda quant=None: calls.append("flow"))
    monkeypatch.setattr(bench, "bench_mlm", lambda quant=None: calls.append("mlm"))
    monkeypatch.setattr(
        bench, "bench_multimodal", lambda quant=None: calls.append("multimodal")
    )
    monkeypatch.setattr(
        bench, "main",
        lambda quant=None, remeasure_baseline=False: calls.append("imagenet"),
    )

    bench.cli(["--task", "all", "--no-compile-cache"])
    assert calls == ["flow", "mlm", "multimodal", "imagenet"]

    calls.clear()
    bench.cli(["--task", "all", "--no-compile-cache", "--budget", "1"])
    assert calls == ["imagenet"]  # all secondaries skipped, headline kept


def test_pinned_baseline_resolution(monkeypatch, tmp_path):
    bench = _load_bench()
    monkeypatch.setattr(bench, "_device_kind", lambda: "TPU v5 lite")
    assert bench._pinned_baseline(16) == 229.4
    # wrong batch or unknown chip -> no pin (falls through to cache/measure)
    assert bench._pinned_baseline(99) is None
    monkeypatch.setattr(bench, "_device_kind", lambda: "TPU v99")
    assert bench._pinned_baseline(16) is None
    # a missing/corrupt pin file degrades to None, never raises
    monkeypatch.setattr(bench, "_PIN_PATH", str(tmp_path / "nope.json"))
    assert bench._pinned_baseline(16) is None
