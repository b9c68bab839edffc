"""Smoke the secondary-bench plumbing (tools/bench_secondary.py) at tiny
sizes on CPU, so the chip invocation documented in BASELINE.md cannot rot.
"""

import sys
from pathlib import Path

import pytest

sys.path.insert(0, str(Path(__file__).resolve().parent.parent / "tools"))


@pytest.mark.parametrize("net", ["posenet", "handsegnet", "lifting"])
@pytest.mark.slow
def test_bench_hand3d_smoke(net):
    import bench_secondary
    rate = bench_secondary.bench_hand3d(net, size=32, batch=2, iters=2)
    assert rate > 0


@pytest.mark.slow
def test_bench_hpe_smoke():
    import bench_secondary
    rate = bench_secondary.bench_hpe(size=32, batch=2, iters=2)
    assert rate > 0


def test_bench_secondary_rejects_unknown_name(capsys):
    import bench_secondary
    assert bench_secondary.main(["nope"]) == 2
    assert "usage" in capsys.readouterr().out
