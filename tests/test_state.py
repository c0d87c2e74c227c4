"""State-store semantics ported from the reference's service tests
(DeadLetterServiceTests / PauseServiceTests style: temp-dir isolation)."""

from trignis_spark.state import PauseStore, StateStore, env_scope, obj_scope


def test_watermark_upsert_and_get(tmp_path):
    s = StateStore(str(tmp_path))
    assert s.get_last_version("e1", "o1") is None
    s.set_last_version("e1", "o1", 10)
    assert s.get_last_version("e1", "o1") == 10
    s.set_last_version("e1", "o1", 25)  # upsert, not append
    assert s.get_last_version("e1", "o1") == 25
    s.set_last_version("e1", "o2", 7)
    s.set_last_version("e2", "o1", 3)
    assert s.get_last_version("e1", "o2") == 7
    assert s.get_last_version("e2", "o1") == 3
    assert s.get_last_version("e1", "o1") == 25


def test_watermark_reset(tmp_path):
    s = StateStore(str(tmp_path))
    s.set_last_version("e1", "o1", 10)
    assert s.reset("e1", "o1") is True
    assert s.get_last_version("e1", "o1") is None
    assert s.reset("e1", "o1") is False  # already gone


def test_watermark_survives_reopen(tmp_path):
    StateStore(str(tmp_path)).set_last_version("e1", "o1", 42)
    assert StateStore(str(tmp_path)).get_last_version("e1", "o1") == 42


def test_pause_scopes(tmp_path):
    p = PauseStore(str(tmp_path))
    assert not p.is_paused("e1", "o1")
    p.pause(env_scope("e1"), reason="maint")
    assert p.is_paused("e1")
    assert p.is_paused("e1", "anyobj")  # env pause covers objects
    assert not p.is_paused("e2", "o1")
    p.pause(obj_scope("e2", "o1"))
    assert p.is_paused("e2", "o1")
    assert not p.is_paused("e2", "o2")


def test_resume_honesty(tmp_path):
    p = PauseStore(str(tmp_path))
    assert p.resume(env_scope("e1")) is False  # not paused
    p.pause(env_scope("e1"))
    assert p.resume(env_scope("e1")) is True
    assert not p.is_paused("e1")


def test_state_as_dataframe(tmp_path, spark):
    s = StateStore(str(tmp_path))
    s.set_last_version("e1", "o1", 5)
    s.set_last_version("e1", "o2", 9)
    rows = {
        (r["environment_name"], r["object_name"]): r["last_version"]
        for r in s.as_dataframe(spark).collect()
    }
    assert rows == {("e1", "o1"): 5, ("e1", "o2"): 9}
