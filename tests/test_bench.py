"""bench.py contract: runs on the visible mesh (8 CPU devices here) and emits
one JSON line with the required keys."""

import io
import json
import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


@pytest.mark.slow
def test_bench_smoke_mesh(monkeypatch, capsys):
    monkeypatch.setenv("BENCH_SMOKE", "1")
    import bench

    bench.main()
    out = capsys.readouterr().out.strip().splitlines()
    payload = json.loads(out[-1])
    assert payload["metric"] == "train_rays_per_sec"
    assert payload["unit"] == "rays/s"
    assert payload["value"] > 0
    assert 0 < payload["vs_baseline"] < 100
