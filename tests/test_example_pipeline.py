"""End-to-end golden test (SURVEY §5.2): the worked beta-scan example
recovers the synthesized physics within tolerance."""

import os
import sys

import pytest

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def test_beta_scan_example_recovers_jitter(tmp_path, spark):
    from examples.beta_scan_pipeline import TRUE_JITTER, main

    resolution = main(str(tmp_path / "out"))
    # CFD-pair optimum underestimates slightly; generous 25% window
    assert resolution == pytest.approx(TRUE_JITTER, rel=0.25)
    # sinks exist: parquet checkpoints + csv + sidecar
    assert os.path.exists(tmp_path / "out" / "clean" / "_SUCCESS")
    assert os.path.exists(tmp_path / "out" / "time_resolution.txt")
    # memoized rerun is cheap and identical
    resolution2 = main(str(tmp_path / "out"))
    assert resolution2 == resolution
