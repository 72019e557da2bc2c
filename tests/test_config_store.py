"""ConfigStore: sqlite persistence, env override, masking, LLM handoff."""

from __future__ import annotations

from deva_spark.sources.config import (
    ConfigStore,
    llm_client_from_config,
    missing_llm_config,
)


def test_set_get_roundtrip_types(tmp_path):
    cs = ConfigStore(str(tmp_path / "cfg.db"))
    cs.set("a.num", 42)
    cs.set("a.flag", True)
    cs.set("a.obj", {"x": [1, 2]})
    cs.set("a.s", "text")
    assert cs.get("a.num") == 42
    assert cs.get("a.flag") is True
    assert cs.get("a.obj") == {"x": [1, 2]}
    assert cs.get("a.s") == "text"
    assert cs.get("a.missing", "dflt") == "dflt"


def test_persistence_across_reopen_and_delete(tmp_path):
    p = str(tmp_path / "cfg.db")
    ConfigStore(p).set("mail.host", "smtp.example.com")
    cs2 = ConfigStore(p)
    assert cs2.get("mail.host") == "smtp.example.com"
    cs2.delete("mail.host")
    assert ConfigStore(p).get("mail.host") is None


def test_env_override_wins(tmp_path, monkeypatch):
    cs = ConfigStore(str(tmp_path / "cfg.db"))
    cs.set("llm.model", "stored-model")
    monkeypatch.setenv("DEVA_LLM_MODEL", "env-model")
    assert cs.get("llm.model") == "env-model"
    monkeypatch.delenv("DEVA_LLM_MODEL")
    assert cs.get("llm.model") == "stored-model"


def test_update_namespace_and_get_all_masks(tmp_path):
    cs = ConfigStore(str(tmp_path / "cfg.db"))
    cs.update("llm", {"base_url": "http://h/v1", "api_key": "sk-supersecret1"})
    ns = cs.namespace("llm")
    assert ns == {"base_url": "http://h/v1", "api_key": "sk-supersecret1"}
    masked = cs.get_all()
    assert masked["llm.base_url"] == "http://h/v1"
    assert "supersecret" not in str(masked["llm.api_key"])
    unmasked = cs.get_all(mask_sensitive=False)
    assert unmasked["llm.api_key"] == "sk-supersecret1"


def test_llm_client_handoff(tmp_path):
    cs = ConfigStore(str(tmp_path / "cfg.db"))
    assert llm_client_from_config(cs) is None
    assert set(missing_llm_config(cs)) == {"base_url", "model", "api_key"}
    cs.update(
        "llm",
        {"base_url": "http://127.0.0.1:1/v1", "model": "m1", "api_key": "k"},
    )
    assert missing_llm_config(cs) == []
    client = llm_client_from_config(cs)
    assert client is not None
    assert client.base_url == "http://127.0.0.1:1/v1"
    assert client.model == "m1" and client.api_key == "k"


def test_endpoint_namespace_handoffs(tmp_path, monkeypatch):
    from deva_spark.sources.config import (
        dtalk_config,
        mail_config,
        missing_config,
    )

    cs = ConfigStore(str(tmp_path / "cfg.db"))
    cs.update("dtalk", {"webhook": "https://d.example/hook", "secret": "s1"})
    assert dtalk_config(cs) == {
        "webhook": "https://d.example/hook",
        "secret": "s1",
    }
    cs.update("mail", {"host": "smtp.example.com", "user": "u@example.com",
                       "password": "pw"})
    mc = mail_config(cs)
    assert mc["host"] == "smtp.example.com"
    assert mc["port"] == 465  # default
    assert mc["sender"] == "u@example.com"  # falls back to user
    assert missing_config(cs, "mail", ["host", "user", "password"]) == []
    assert missing_config(cs, "dtalk", ["webhook", "keywords"]) == ["keywords"]
    # env override reaches the namespace reader
    monkeypatch.setenv("DEVA_MAIL_PORT", "587")
    assert mail_config(cs)["port"] == 587
