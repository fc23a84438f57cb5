"""The bench orchestrator's failure isolation — the r3 regression.

BENCH_r03.json was rc=1 with no headline line because one section
(int8-cache at batch 60) crashed the chip and bench.py then ran all
metrics sequentially in one process. The orchestrator now runs each
section in its own subprocess; these tests prove, end to end through
``python bench.py``, that

- a crashing NON-headline section yields an ``{"metric", "error"}`` line
  and the headline still runs (exit 0),
- a crashing HEADLINE makes the process exit nonzero (the driver must
  see the round as failed, not silently adopt an earlier line).

Fault injection: ``BENCH_FAULT_INJECT=<section>`` makes the orchestrator
add a hidden ``--fault-inject`` flag to that section's argv, which
raises on entry (before any jax work). Reference failure mode this
guards the artifact of: /root/reference/src/evaluation/evaluate_rl.py
is the workload every eval line measures.
"""

import json
import os
import subprocess
import sys

BENCH = os.path.join(os.path.dirname(__file__), "..", "bench.py")
# keep only the cheapest non-headline section (spec) + the headline:
# smoke sections are small but the full set would add minutes
SKIP = ("pretrain,pretrain_mixture,production,production_spec_adaptive,"
        "atari,babyai,int8_cache,w8a8,spec_adaptive")


def _run(fault: str, extra=()):
    env = dict(os.environ, BENCH_FAULT_INJECT=fault,
               JAX_PLATFORMS="cpu")
    proc = subprocess.run(
        [sys.executable, BENCH, "--smoke", "--skip", SKIP] + list(extra),
        capture_output=True, text=True, timeout=900, env=env)
    lines = []
    for line in proc.stdout.splitlines():
        try:
            rec = json.loads(line)
        except ValueError:
            continue
        if isinstance(rec, dict) and "metric" in rec:
            lines.append(rec)
    return proc.returncode, lines


def test_section_crash_does_not_blank_headline():
    rc, lines = _run(fault="spec")
    by_metric = {rec["metric"]: rec for rec in lines}
    spec = by_metric["rl_eval_actions_per_sec_1p2b_spec"]
    assert "error" in spec and "fault injected" in spec["error"]
    headline = by_metric["rl_eval_actions_per_sec_smoke"]
    assert "error" not in headline and headline["value"] > 0
    # the headline is the LAST line (drivers parse the final line)
    assert lines[-1]["metric"] == "rl_eval_actions_per_sec_smoke"
    assert rc == 0


def test_headline_crash_fails_the_run():
    rc, lines = _run(fault="headline")
    assert rc != 0
    by_metric = {rec["metric"]: rec for rec in lines}
    # the spec section still emitted its real line first
    assert "error" not in by_metric["rl_eval_actions_per_sec_smoke_spec"]
    assert "error" in lines[-1]


def test_budget_exhaustion_keeps_headline_last():
    """r4 regression (BENCH_r04.json rc=124): the headline now runs FIRST
    — a zero budget skips every other section but the final metric line
    is still the real headline and the run exits 0."""
    rc, lines = _run(fault="", extra=["--total-budget", "0"])
    assert rc == 0
    by_metric = {rec["metric"]: rec for rec in lines}
    spec = by_metric["rl_eval_actions_per_sec_1p2b_spec"]
    assert "error" in spec and "budget" in spec["error"]
    headline = by_metric["rl_eval_actions_per_sec_smoke"]
    assert "error" not in headline and headline["value"] > 0
    assert lines[-1]["metric"] == "rl_eval_actions_per_sec_smoke"
