"""The bench impl-fallback orchestration (bench.py run_with_fallback):
a hung/degraded compile on the preferred impl must be killed with enough
budget left for the robust fallback to record a number (VERDICT r3 #3's
forced-failure proof, exercised with stub subprocesses)."""

import json
import sys
import time

sys.path.insert(0, ".")

from bench import run_with_fallback

PY = sys.executable


def _emit(tag):
    return [PY, "-c", "import json; print('noise'); "
            f"print(json.dumps({{'metric': '{tag}', 'value': 1.0}}))"]


def _hang():
    return [PY, "-c", "import time; time.sleep(600)"]


def _fail():
    return [PY, "-c", "import sys; sys.exit(3)"]


def test_first_success_wins():
    line = run_with_fallback([("a", _emit("a")), ("b", _emit("b"))],
                             budget_s=60, reserve_s=5, log=lambda m: None)
    assert json.loads(line)["metric"] == "a"


def test_hung_attempt_is_killed_and_fallback_records():
    t0 = time.perf_counter()
    line = run_with_fallback([("hang", _hang()), ("ok", _emit("ok"))],
                             budget_s=36, reserve_s=2, log=lambda m: None)
    dt = time.perf_counter() - t0
    assert json.loads(line)["metric"] == "ok"
    # the hung attempt must have been killed at its (budget - reserve)
    # slice — the 30 s floor — not run to completion
    assert dt < 120, dt


def test_failing_attempt_falls_through():
    line = run_with_fallback([("bad", _fail()), ("ok", _emit("ok"))],
                             budget_s=60, reserve_s=5, log=lambda m: None)
    assert json.loads(line)["metric"] == "ok"


def test_all_fail_returns_none():
    assert run_with_fallback([("bad", _fail()), ("bad2", _fail())],
                             budget_s=60, reserve_s=5,
                             log=lambda m: None) is None


def test_json_line_extracted_from_noisy_stdout():
    line = run_with_fallback([("noisy", _emit("noisy"))],
                             budget_s=60, reserve_s=5, log=lambda m: None)
    assert json.loads(line)["metric"] == "noisy"
