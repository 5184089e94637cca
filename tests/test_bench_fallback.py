"""The bench orchestration (bench.py orchestrate / run_with_fallback):

Round-5 design: ONE sequence child banks each completed measurement to a
results file AS IT FINISHES; the parent kills it at the budget boundary and
reports the BEST banked result (a timed-out later attempt can no longer cost
the whole record — the r4 failure mode). run_with_fallback survives as the
last-resort path when the child banked nothing. Exercised with stub
subprocesses, including a forced kill mid-attempt."""

import json
import os
import sys
import time

sys.path.insert(0, ".")

from bench import orchestrate, read_candidates, run_with_fallback

PY = sys.executable


def _emit(tag):
    return [PY, "-c", "import json; print('noise'); "
            f"print(json.dumps({{'metric': '{tag}', 'value': 1.0}}))"]


def _hang():
    return [PY, "-c", "import time; time.sleep(600)"]


def _fail():
    return [PY, "-c", "import sys; sys.exit(3)"]


def _bank_child(path, values, then_hang=False):
    """Stub sequence child: append one result line per value, then
    optionally hang (simulating a slow later attempt)."""
    lines = "".join(
        f"f.write(json.dumps({{'metric': 'm', 'value': {v}, "
        f"'detail': {{'deform_impl': 'i{i}', 'batch': 1}}}}) + chr(10)); "
        for i, v in enumerate(values))
    code = (f"import json; f = open({path!r}, 'a'); {lines} f.flush()"
            + ("; import time; time.sleep(600)" if then_hang else ""))
    return [PY, "-c", code]


# -- orchestrate ------------------------------------------------------------


def test_best_banked_result_wins(tmp_path):
    path = str(tmp_path / "r.jsonl")
    line = orchestrate(_bank_child(path, [5.3, 6.5, 6.1]), [],
                       budget_s=60, margin_s=5, result_path=path,
                       log=lambda m: None)
    res = json.loads(line)
    assert res["value"] == 6.5
    assert [a["value"] for a in res["detail"]["attempts"]] == [5.3, 6.5, 6.1]


def test_killed_child_keeps_banked_results(tmp_path):
    path = str(tmp_path / "r.jsonl")
    t0 = time.perf_counter()
    line = orchestrate(_bank_child(path, [5.7], then_hang=True), [],
                       budget_s=36, margin_s=2, result_path=path,
                       log=lambda m: None)
    dt = time.perf_counter() - t0
    assert json.loads(line)["value"] == 5.7
    # the child must have been killed at (budget - margin) — the 30 s
    # floor — not run to completion
    assert dt < 120, dt


def test_empty_bank_falls_back(tmp_path):
    path = str(tmp_path / "r.jsonl")
    line = orchestrate(_fail(), [("ok", _emit("ok"))],
                       budget_s=60, margin_s=5, result_path=path,
                       log=lambda m: None)
    assert json.loads(line)["metric"] == "ok"


def test_everything_fails_returns_none(tmp_path):
    path = str(tmp_path / "r.jsonl")
    assert orchestrate(_fail(), [("bad", _fail())],
                       budget_s=60, margin_s=5, result_path=path,
                       log=lambda m: None) is None


def test_read_candidates_skips_garbage(tmp_path):
    path = tmp_path / "r.jsonl"
    path.write_text('noise\n{"value": 1.0}\n{broken\n{"value": 2.0}\n')
    assert [c["value"] for c in read_candidates(str(path))] == [1.0, 2.0]


def test_read_candidates_missing_file():
    assert read_candidates("/nonexistent/nope.jsonl") == []


# -- run_with_fallback (last-resort path) -----------------------------------


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
    assert dt < 120, dt


def test_failing_attempt_falls_through():
    line = run_with_fallback([("bad", _fail()), ("ok", _emit("ok"))],
                             budget_s=60, reserve_s=5, log=lambda m: None)
    assert json.loads(line)["metric"] == "ok"


def test_all_fail_returns_none():
    assert run_with_fallback([("bad", _fail()), ("bad2", _fail())],
                             budget_s=60, reserve_s=5,
                             log=lambda m: None) is None


def test_pipelined_time_loop_counts_every_iter():
    """time_loop(pipelined) must average wall over ALL dispatches and fetch
    every in-flight result before stopping the clock."""
    from bench import time_loop

    calls = []

    class FakeScalar:
        def __init__(self, i):
            self.i = i

        def __float__(self):
            return float(self.i)

    def step():
        calls.append(len(calls))
        return (FakeScalar(len(calls)),)

    per, times = time_loop(step, iters=6, warmup=2, rtt=0.5,
                           timing="pipelined", depth=3)
    # warmup (2) + max(iters, 2*depth) timed dispatches
    assert len(calls) == 2 + 6
    assert per >= 0.0
    assert len(times) == 6


def test_sequence_entry_parsing_with_protocols():
    """--impls entries accept impl[:protocol]; bare entries inherit the
    default protocol."""
    spec = "quad,hybrid,hybrid:monolithic"
    default = "split"
    entries = [((s.split(":") + [default])[0], (s.split(":") + [default])[1])
               for s in (t.strip() for t in spec.split(",")) if s]
    assert entries == [("quad", "split"), ("hybrid", "split"),
                       ("hybrid", "monolithic")]
