"""Observability subsystem (utils/profiling.py): timers, metrics, cost model.

The reference has no analogue (SURVEY §5: wall-clock prints only); these
tests pin the structured replacements, in particular that the per-stage
byte/FLOP roofline estimates are self-consistent and land in the runner's
metrics stream.
"""

import json
import os
import time

import numpy as np

from pointcloudprocessor_tpu.utils import profiling as prof


def test_stage_timer_accumulates():
    t = prof.StageTimer()
    with t.stage("a"):
        time.sleep(0.01)
    with t.stage("a"):
        time.sleep(0.01)
    assert t.timings["a"] >= 0.02


def test_metrics_logger_jsonl(tmp_path):
    p = str(tmp_path / "m.jsonl")
    m = prof.MetricsLogger(p)
    m.log("ev", x=1)
    m.log("ev2", y="z")
    lines = [json.loads(l) for l in open(p)]
    assert lines[0]["event"] == "ev" and lines[0]["x"] == 1
    assert lines[1]["y"] == "z"
    prof.MetricsLogger(None).log("noop")  # disabled path


def test_roofline_classification():
    # Pure-bandwidth op: 1 flop/byte << ridge (~60 on v5e f32).
    r = prof.roofline(1e9, 1e9)
    assert r["bound"] == "memory"
    assert r["speed_of_light_s"] == round(1e9 / prof.V5E_HBM_BYTES_PER_S, 6)
    # Dense matmul-like: far above the ridge.
    r2 = prof.roofline(1e15, 1e9)
    assert r2["bound"] == "compute"
    assert r2["intensity_flop_per_byte"] > r2["ridge_flop_per_byte"]


def test_stage_estimates_scale_linearly():
    """Cost estimates are analytic in shapes: doubling points doubles both
    sides of the roofline and preserves the bound classification."""
    for fn, kw in (
        (prof.nid_cost_estimate, dict(k_frames=8)),
        (prof.mls_cost_estimate, {}),
    ):
        a = fn(100_000, **kw)
        b = fn(200_000, **kw)
        assert b["flops"] >= 1.9 * a["flops"]
        assert b["bytes"] >= 1.9 * a["bytes"]
    # Grid HPR = linear point term + constant grid-erosion term.
    ga = prof.hpr_cost_estimate(100_000, impl="grid")
    gb = prof.hpr_cost_estimate(200_000, impl="grid")
    assert gb["flops"] - ga["flops"] == 100_000 * 40
    dense = prof.hpr_cost_estimate(262_144, impl="dense")
    grid = prof.hpr_cost_estimate(262_144, impl="grid")
    assert dense["flops"] / grid["flops"] > 1e3  # the O(N^2) -> O(N) win


def test_runner_logs_cost_estimates(tmp_path):
    import sys

    sys.path.insert(0, os.path.dirname(__file__))
    from test_pipeline_e2e import small_config, write_dataset

    from pointcloudprocessor_tpu.pipeline import runner

    write_dataset(tmp_path)
    cfg = small_config(tmp_path)
    runner.process(cfg)
    events = [
        json.loads(l) for l in open(os.path.join(cfg.output_path, "metrics.jsonl"))
    ]
    names = {e["event"] for e in events}
    assert {"cost_estimate_nid", "cost_estimate_colorize"} <= names
    nid = next(e for e in events if e["event"] == "cost_estimate_nid")
    assert nid["flops"] > 0 and nid["bound"] in ("compute", "memory")
