"""Mail source: IMAP unread-poll → spool → Structured Streaming.

Reference surface: ``from_mail`` (`/root/reference/deva/core/sources.py:
1318-1416`) — poll unread messages on an interval, emit each as an event,
mark seen.

Spark mapping: the same spool-bridge pattern as the HTTP source
(`bridge.py`): a poller (driver-side daemon or cron job —
``streaming/scheduler.py``) drains unread messages into one JSON file per
message, and a Structured Streaming file source consumes the spool with
normal checkpointing/backpressure. The IMAP client is pure stdlib
(``imaplib`` + ``email``), so the implementation is REAL — only the
network round-trip needs a live server; tests inject a fake client
yielding raw RFC822 bytes.
"""

from __future__ import annotations

import json
import os
import uuid
from email import message_from_bytes
from email.header import decode_header, make_header

from pyspark.sql import DataFrame, SparkSession

MAIL_SCHEMA = (
    "uid string, subject string, sender string, recipient string, "
    "date string, body string"
)


def _decode(value: str | None) -> str | None:
    if value is None:
        return None
    try:
        return str(make_header(decode_header(value)))
    except Exception:  # noqa: BLE001 — malformed headers pass through raw
        return value


def parse_message(uid: str, raw: bytes) -> dict:
    """RFC822 bytes → flat record: decoded headers + first text/plain body
    (the reference emits the whole message object; a columnar engine wants
    typed fields)."""
    msg = message_from_bytes(raw)
    body = None
    for part in msg.walk():
        if part.get_content_type() == "text/plain" and not part.is_multipart():
            payload = part.get_payload(decode=True)
            if payload is not None:
                body = payload.decode(
                    part.get_content_charset() or "utf-8", errors="replace"
                )
                break
    return {
        "uid": uid,
        "subject": _decode(msg.get("Subject")),
        "sender": _decode(msg.get("From")),
        "recipient": _decode(msg.get("To")),
        "date": msg.get("Date"),
        "body": body,
    }


class ImapClient:
    """Stdlib IMAP client with the three calls the poller needs. Connects
    lazily; needs a reachable server (none in this container — tests use a
    fake with the same three methods)."""

    def __init__(
        self,
        host: str,
        username: str,
        password: str,
        ssl: bool = True,
        port: int | None = None,
        folder: str = "INBOX",
    ):
        self.host, self.username, self.password = host, username, password
        self.ssl, self.port, self.folder = ssl, port, folder
        self._conn = None

    def _imap(self):
        if self._conn is None:
            import imaplib

            cls = imaplib.IMAP4_SSL if self.ssl else imaplib.IMAP4
            self._conn = cls(self.host, self.port or (993 if self.ssl else 143))
            self._conn.login(self.username, self.password)
            self._conn.select(self.folder)
        return self._conn

    def unread(self) -> list[tuple[str, bytes]]:
        # UID commands + BODY.PEEK[] (r11 review, twice over): plain
        # SEARCH returns SESSION-RELATIVE sequence numbers that shift
        # when another client expunges — STORE would then flag the WRONG
        # message and the spool's uid column would be useless across
        # polls; and a "(RFC822)" fetch implicitly sets \\Seen at fetch
        # time, so a crash before the spool write landed would lose the
        # message forever (at-most-once). PEEK leaves the flag for
        # mark_seen, which runs only after the spool write succeeds.
        conn = self._imap()
        _typ, data = conn.uid("search", None, "UNSEEN")
        out = []
        for uid in data[0].split():
            _typ, msg_data = conn.uid("fetch", uid, "(BODY.PEEK[])")
            if msg_data and msg_data[0]:
                out.append((uid.decode(), msg_data[0][1]))
        return out

    def mark_seen(self, uid: str) -> None:
        self._imap().uid("store", uid, "+FLAGS", "\\Seen")

    def logout(self) -> None:
        if self._conn is not None:
            self._conn.logout()
            self._conn = None


class MailSpoolSource:
    """Poll unread mail into a spool dir; consume as a file stream.

    ``poll_once`` is the cron-able tick (pair with
    ``streaming/scheduler.py`` for the reference's ``interval=900``
    behavior); each message lands atomically as one JSON file and is
    marked seen only after the spool write succeeds (at-least-once)."""

    def __init__(self, client, spool_dir: str):
        self.client = client
        self.spool_dir = spool_dir
        os.makedirs(spool_dir, exist_ok=True)

    def poll_once(self) -> int:
        n = 0
        for uid, raw in self.client.unread():
            rec = parse_message(uid, raw)
            name = f"{uuid.uuid4().hex}.json"
            tmp = os.path.join(self.spool_dir, f".{name}.tmp")
            with open(tmp, "w", encoding="utf-8") as f:
                json.dump(rec, f)
            os.replace(tmp, os.path.join(self.spool_dir, name))
            self.client.mark_seen(uid)
            n += 1
        return n

    def stream(self, spark: SparkSession) -> DataFrame:
        return spark.readStream.schema(MAIL_SCHEMA).json(self.spool_dir)
