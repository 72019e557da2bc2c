"""Alerting / side-effect endpoints: signed webhook, mail, retrying POST.

Reference surface: ``Dtalk`` signed group-robot webhook
(`/root/reference/deva/endpoints.py:214-399` — HMAC-SHA256 of
"{timestamp_ms}\\n{secret}", base64 + URL-quoted, appended as
``&timestamp=..&sign=..``; "@md@title|body" selects a markdown payload,
plain text otherwise, "@all" mentions everyone) and ``mail``
(`endpoints.py:402-469` — tuple = (subject, body), DataFrame renders as
an HTML table, default subject otherwise).

Spark-native shape: payload building and signing are pure functions
(timestamp injectable — deterministic, unit-testable offline); delivery is
a ``foreachPartition`` sink so sends run on the executors with bounded
retries, never serialized through the driver. The transport callable is
injected (this container has no network egress); the default transport is
a stdlib urllib POST for real deployments.
"""

from __future__ import annotations

import base64
import hashlib
import hmac
import json
import time
import urllib.parse
from collections.abc import Callable

from pyspark.sql import DataFrame


def sign_webhook_url(webhook: str, secret: str | None, timestamp_ms: int | None = None) -> str:
    """Signed webhook URL (`endpoints.py:272-297`): HMAC-SHA256 of
    ``"{timestamp_ms}\\n{secret}"`` keyed by the secret, base64-encoded and
    URL-quoted. ``timestamp_ms`` is injectable for deterministic tests."""
    if not secret:
        return webhook
    ts = int(round(time.time() * 1000)) if timestamp_ms is None else timestamp_ms
    to_sign = f"{ts}\n{secret}".encode()
    code = hmac.new(secret.encode(), to_sign, digestmod=hashlib.sha256).digest()
    sign = urllib.parse.quote_plus(base64.b64encode(code))
    return f"{webhook}&timestamp={ts}&sign={sign}"


def build_webhook_payload(msg: str) -> dict:
    """Message → robot payload (`endpoints.py:300-320`): plain text by
    default ("@all" mentions everyone); ``"@md@title|body"`` selects a
    markdown payload."""
    msg = str(msg)
    payload = {
        "msgtype": "text",
        "text": {"content": msg},
        "at": {"atMobiles": [], "isAtAll": "@all" in msg},
    }
    if not msg.startswith("@md@"):
        return payload
    content = msg[4:]
    if "|" not in content:
        return payload
    title, text = content.split("|", 1)
    return {"msgtype": "markdown", "markdown": {"title": title, "text": text}}


def with_retries(
    fn: Callable,
    max_retries: int = 3,
    base_delay: float = 0.2,
    sleep: Callable[[float], None] = time.sleep,
):
    """Bounded exponential-backoff wrapper for executor-side transports
    (the reference's ``max_retries=3`` contract). Raises the last error
    after ``max_retries`` failed attempts."""

    def _run(*args, **kwargs):
        last: Exception | None = None
        for attempt in range(max_retries):
            try:
                return fn(*args, **kwargs)
            except Exception as e:  # noqa: BLE001 — transport errors retry
                last = e
                if attempt < max_retries - 1:
                    sleep(base_delay * (2**attempt))
        raise last

    return _run


def default_http_post(url: str, body: str, timeout: float = 10.0) -> int:
    """Stdlib POST transport (executor-side default for real deployments —
    no egress in this container, so tests inject a recorder)."""
    import urllib.request

    req = urllib.request.Request(
        url,
        data=body.encode(),
        headers={"Content-Type": "application/json"},
        method="POST",
    )
    with urllib.request.urlopen(req, timeout=timeout) as resp:  # noqa: S310
        return resp.status


#: volatile per-send signing params (sign_webhook_url stamps a fresh
#: timestamp each call) — excluded from the spool's content address so a
#: replayed row overwrites instead of duplicating
_VOLATILE_QUERY_PARAMS = frozenset({"timestamp", "sign"})


def _stable_address(url: str, body: str) -> str:
    parts = urllib.parse.urlsplit(url)
    kept = [
        (k, v)
        for k, v in urllib.parse.parse_qsl(parts.query, keep_blank_values=True)
        if k not in _VOLATILE_QUERY_PARAMS
    ]
    stable = urllib.parse.urlunsplit(
        parts._replace(query=urllib.parse.urlencode(sorted(kept)))
    )
    return hashlib.md5((stable + "\n" + body).encode()).hexdigest()


def _spool_send(root: str, url: str, body: str) -> int:
    import os

    os.makedirs(root, exist_ok=True)
    name = _stable_address(url, body)
    tmp = os.path.join(root, f".{name}.tmp")
    with open(tmp, "w", encoding="utf-8") as f:
        json.dump({"url": url, "body": body}, f)
    os.replace(tmp, os.path.join(root, name))
    return 200


def spool_transport(root: str):
    """Offline transport: each send lands as one JSON file under ``root``
    (content-addressed — an at-least-once replay overwrites, not
    duplicates; the address excludes the volatile ``timestamp``/``sign``
    query params a signed webhook re-stamps per send, so a replayed signed
    row still dedups). A ``functools.partial`` of a module-level function,
    so it pickles to executors; the dev/test stand-in for
    :func:`default_http_post`."""
    import functools

    return functools.partial(_spool_send, root)


def webhook_sink(
    stream_df: DataFrame,
    webhook: str,
    secret: str | None = None,
    msg_col: str = "msg",
    transport: Callable[[str, str], object] | None = None,
    max_retries: int = 3,
    available_now: bool = False,
):
    """Dtalk-analog streaming sink: every row of each micro-batch becomes a
    signed webhook POST, sent FROM THE EXECUTORS (``foreachPartition``)
    with bounded retries — at-least-once, scaling with the cluster rather
    than the driver. ``transport(url, body)`` must be picklable."""
    send = transport or default_http_post

    def _sink(bdf: DataFrame, epoch_id: int) -> None:
        def _part(rows) -> None:
            deliver = with_retries(send, max_retries=max_retries)
            for row in rows:
                url = sign_webhook_url(webhook, secret)
                body = json.dumps(build_webhook_payload(row[msg_col]))
                deliver(url, body)

        bdf.select(msg_col).foreachPartition(_part)

    w = stream_df.writeStream.foreachBatch(_sink)
    if available_now:
        w = w.trigger(availableNow=True)
    return w.start()


def render_mail_message(content, to: str, sender: str, subject: str | None = None):
    """Content → MIME message (`endpoints.py:422-448`): a tuple is
    (subject, body); a pandas DataFrame renders as an HTML table; anything
    else is text with the reference's ``subject:body[:10]`` title."""
    import pandas as pd
    from email.message import EmailMessage
    from email.mime.multipart import MIMEMultipart
    from email.mime.text import MIMEText

    if isinstance(content, tuple):
        subject, content = content[0], content[1]
    if isinstance(content, pd.DataFrame):
        message = MIMEMultipart("alternative")
        message["Subject"] = subject or "deva message"
        message.attach(MIMEText(content.to_html(), "html", "utf-8"))
    else:
        text = str(content)
        message = EmailMessage()
        base = subject or "deva message"
        message["Subject"] = f"{base}:{text[:10]}"
        message.set_content(text)
    message["To"] = to
    message["From"] = sender
    return message


def mail_sink(
    stream_df: DataFrame,
    to: str,
    sender: str,
    transport: Callable[[object], object],
    body_col: str = "body",
    subject_col: str | None = None,
    max_retries: int = 3,
    available_now: bool = False,
):
    """Mail streaming sink: one message per row, rendered executor-side and
    handed to the injected SMTP transport (``transport(mime_message)``)
    with bounded retries. For DataFrame-as-table mails, render with
    :func:`render_mail_message` on a bounded ``toPandas()`` summary and
    send once — don't mail a billion rows."""

    cols = [body_col] + ([subject_col] if subject_col else [])

    def _sink(bdf: DataFrame, epoch_id: int) -> None:
        def _part(rows) -> None:
            deliver = with_retries(transport, max_retries=max_retries)
            for row in rows:
                subject = row[subject_col] if subject_col else None
                deliver(render_mail_message(row[body_col], to, sender, subject))

        bdf.select(*cols).foreachPartition(_part)

    w = stream_df.writeStream.foreachBatch(_sink)
    if available_now:
        w = w.trigger(availableNow=True)
    return w.start()
