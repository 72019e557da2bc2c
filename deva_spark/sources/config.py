"""Persistent configuration registry (the reference's config store).

Reference surface: ``ConfigManager`` — a SQLite-backed dotted-path
key-value registry with environment-variable override and sensitive-value
masking (`/root/reference/deva/config.py:1-467`; namespaces for llm /
mail / dtalk / database credentials, ``get``/``set``/``update``/
``delete``/``get_all``).

Spark mapping: configuration is DRIVER-side state (endpoints, creds,
knobs the connector sinks read at plan-build time), so the right
implementation is a tiny stdlib-sqlite registry — no executor involvement,
no Spark dependency. What IS Spark-shaped is the handoff: helpers below
turn a config namespace into the picklable client objects the stages
embed in their closures (``llm_client_from_config`` →
:class:`~deva_spark.functions.llm.OpenAIChatClient`), so credentials load
once on the driver and ride the serialized plan, never a per-row lookup.

Resolution order mirrors the reference: explicit env var
(``DEVA_<PATH_WITH_UNDERSCORES>``) overrides the stored value; values are
JSON-encoded so types round-trip.
"""

from __future__ import annotations

import contextlib
import json
import os
import sqlite3
import threading
from typing import Any

#: key substrings treated as sensitive in get_all(mask_sensitive=True)
SENSITIVE_KEYWORDS = (
    "key",
    "token",
    "secret",
    "password",
    "passwd",
    "credential",
)


def _is_sensitive(path: str) -> bool:
    last = path.rsplit(".", 1)[-1].lower()
    return any(k in last for k in SENSITIVE_KEYWORDS)


def _mask(value: Any) -> str:
    s = str(value)
    if len(s) <= 6:
        return "***"
    return f"{s[:3]}***{s[-2:]}"


class ConfigStore:
    """Dotted-path config registry on stdlib sqlite (one table, WAL):
    ``get('llm.api_key')`` / ``set`` / ``update`` / ``delete`` /
    ``get_all``. Env var ``DEVA_LLM_API_KEY`` (path upper-cased, dots →
    underscores) overrides the stored value at read time — the
    deploy-without-editing-state escape hatch the reference ships."""

    def __init__(self, path: str = ".deva/config.db", env_prefix: str = "DEVA"):
        self.path = path
        self.env_prefix = env_prefix
        self._lock = threading.Lock()
        d = os.path.dirname(path)
        if d:
            os.makedirs(d, exist_ok=True)
        with self._conn() as c:
            c.execute(
                "CREATE TABLE IF NOT EXISTS config "
                "(path TEXT PRIMARY KEY, value TEXT NOT NULL)"
            )

    @contextlib.contextmanager
    def _conn(self):
        # connect-per-op keeps the store fork/thread-safe; the explicit
        # close matters — sqlite's context manager only commits, so a
        # bare `with connect()` leaks the fd (and WAL -wal/-shm handles)
        # until GC on every call
        c = sqlite3.connect(self.path, timeout=30.0)
        try:
            c.execute("PRAGMA journal_mode=WAL")
            with c:  # transaction: commit on success, rollback on error
                yield c
        finally:
            c.close()

    def _env_key(self, path: str) -> str:
        return f"{self.env_prefix}_{path.replace('.', '_').upper()}"

    def get(self, path: str, default: Any = None) -> Any:
        env = os.environ.get(self._env_key(path))
        if env is not None:
            try:
                return json.loads(env)
            except ValueError:
                return env
        with self._lock, self._conn() as c:
            row = c.execute(
                "SELECT value FROM config WHERE path = ?", (path,)
            ).fetchone()
        return json.loads(row[0]) if row else default

    def set(self, path: str, value: Any) -> None:
        with self._lock, self._conn() as c:
            c.execute(
                "INSERT INTO config (path, value) VALUES (?, ?) "
                "ON CONFLICT(path) DO UPDATE SET value = excluded.value",
                (path, json.dumps(value)),
            )

    def update(self, namespace: str, values: dict[str, Any]) -> None:
        """Batch-set ``namespace.key`` for every item (the reference's
        ``config.update('llm.deepseek', {...})`` shape)."""
        for k, v in values.items():
            self.set(f"{namespace}.{k}", v)

    def delete(self, path: str) -> None:
        with self._lock, self._conn() as c:
            c.execute("DELETE FROM config WHERE path = ?", (path,))

    def namespace(self, prefix: str) -> dict[str, Any]:
        """All keys under ``prefix.`` as a flat dict (suffix -> value),
        env overrides applied per key."""
        with self._lock, self._conn() as c:
            rows = c.execute(
                "SELECT path, value FROM config WHERE path LIKE ?",
                (f"{prefix}.%",),
            ).fetchall()
        out = {p[len(prefix) + 1 :]: json.loads(v) for p, v in rows}
        for k in list(out):
            env = os.environ.get(self._env_key(f"{prefix}.{k}"))
            if env is not None:
                try:
                    out[k] = json.loads(env)
                except ValueError:
                    out[k] = env
        return out

    def get_all(self, mask_sensitive: bool = True) -> dict[str, Any]:
        with self._lock, self._conn() as c:
            rows = c.execute("SELECT path, value FROM config").fetchall()
        out: dict[str, Any] = {}
        for p, v in rows:
            val = json.loads(v)
            out[p] = _mask(val) if mask_sensitive and _is_sensitive(p) else val
        return out


def llm_client_from_config(store: ConfigStore, namespace: str = "llm"):
    """Build the picklable chat client from a config namespace
    (``llm.base_url`` / ``llm.model`` / ``llm.api_key`` — the reference's
    ``get_llm_config`` handoff): returns an
    :class:`~deva_spark.functions.llm.OpenAIChatClient`, or None when
    ``base_url`` is unset so callers fall back to the env/stub chain."""
    from deva_spark.functions.llm import OpenAIChatClient

    # per-key store.get, not namespace(): env-only keys (DEVA_LLM_MODEL
    # set, nothing stored) must resolve too — namespace() can only apply
    # overrides to keys that exist in the db
    g = lambda k, d=None: store.get(f"{namespace}.{k}", d)  # noqa: E731
    base = g("base_url")
    if not base:
        return None
    return OpenAIChatClient(
        base,
        g("model", "default"),
        api_key=g("api_key"),
        temperature=float(g("temperature", 0.0)),
    )


def missing_llm_config(store: ConfigStore, namespace: str = "llm") -> list[str]:
    """Which required llm keys are absent (reference
    ``get_missing_llm_config``) — the preflight a pipeline runs before
    scheduling an annotation stage."""
    return [
        k
        for k in ("base_url", "model", "api_key")
        if not store.get(f"{namespace}.{k}")
    ]


def dtalk_config(store: ConfigStore, namespace: str = "dtalk") -> dict[str, Any]:
    """The ``dtalk`` namespace (reference ``config.get('dtalk.*')`` —
    webhook + signing secret) ready to splat into
    :func:`~deva_spark.sources.endpoints.webhook_sink`:
    ``webhook_sink(df, **dtalk_config(store))``."""
    return {
        "webhook": store.get(f"{namespace}.webhook"),
        "secret": store.get(f"{namespace}.secret"),
    }


def mail_config(store: ConfigStore, namespace: str = "mail") -> dict[str, Any]:
    """The ``mail`` namespace (host/port/user/password/sender) — the
    SMTP transport preflight for
    :func:`~deva_spark.sources.endpoints.mail_sink` callers."""
    # per-key store.get (not namespace()) so the DEVA_MAIL_* env
    # override applies even to keys never stored in the db
    g = lambda k, d=None: store.get(f"{namespace}.{k}", d)  # noqa: E731
    return {
        "host": g("host"),
        "port": int(g("port", 465)),
        "user": g("user"),
        "password": g("password"),
        "sender": g("sender") or g("user"),
    }


def missing_config(
    store: ConfigStore, namespace: str, required: list[str]
) -> list[str]:
    """Generic preflight: which required keys are absent from a
    namespace (the ``get_missing_*_config`` family generalized)."""
    return [k for k in required if not store.get(f"{namespace}.{k}")]
