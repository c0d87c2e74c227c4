"""Config watcher: debounced reload, invalid files skipped, orchestrator
integration keeps the single-poller invariant through file churn."""

import json
import time

from trignis_spark.streaming.lifecycle import Orchestrator, ProbeLog
from trignis_spark.streaming.watcher import ConfigWatcher, load_environment_dir


def _write_env(path, name, interval=60):
    doc = {
        "name": name,
        "polling_interval_seconds": interval,
        "tracking_objects": [{"name": "o1", "table_name": "t1"}],
    }
    (path / f"{name}.json").write_text(json.dumps(doc))


def test_load_environment_dir_skips_invalid(tmp_path):
    _write_env(tmp_path, "good")
    (tmp_path / "broken.json").write_text("{not json")
    (tmp_path / "invalid.json").write_text(json.dumps({"name": "bad"}))  # no objects
    envs, problems = load_environment_dir(str(tmp_path))
    assert [e.name for e in envs] == ["good"]
    assert len(problems) == 2


def test_watcher_debounces_burst_into_one_reload(tmp_path):
    _write_env(tmp_path, "a")
    seen = []
    w = ConfigWatcher(
        str(tmp_path), lambda envs: seen.append([e.name for e in envs]),
        poll_interval=0.05, debounce=0.15,
    )
    w.start()
    try:
        time.sleep(0.2)
        # burst: three rapid writes
        for i in range(3):
            _write_env(tmp_path, "a", interval=60 + i)
            time.sleep(0.03)
        _write_env(tmp_path, "b")
        deadline = time.time() + 3
        while w.reloads == 0 and time.time() < deadline:
            time.sleep(0.05)
        time.sleep(0.3)  # settle: no further reloads should fire
        assert w.reloads == 1  # burst collapsed
        assert seen[-1] == ["a", "b"]
    finally:
        w.stop()


def test_watcher_drives_orchestrator_reload(tmp_path):
    _write_env(tmp_path, "env1")
    probe = ProbeLog()
    orch = Orchestrator(lambda env: time.sleep(0.02), probe, interval_override=0.05)
    envs, _ = load_environment_dir(str(tmp_path))
    orch.start(envs)
    w = ConfigWatcher(
        str(tmp_path), lambda e: orch.reload(e), poll_interval=0.05, debounce=0.1
    )
    w.start()
    try:
        _write_env(tmp_path, "env2")
        deadline = time.time() + 3
        while orch.running() != {"env1", "env2"} and time.time() < deadline:
            time.sleep(0.05)
        assert orch.running() == {"env1", "env2"}
        (tmp_path / "env1.json").unlink()
        deadline = time.time() + 3
        while orch.running() != {"env2"} and time.time() < deadline:
            time.sleep(0.05)
        assert orch.running() == {"env2"}
    finally:
        w.stop()
        orch.shutdown()
    assert probe.overlaps() == []  # invariant held through file churn
