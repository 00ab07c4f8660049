"""Job logging + Slack alert hook (engine/logger.go, engine/slack.go).

The reference routes every engine event through a ``Logger`` (Trace/
Info/Warning/Error levels, latest-error tracking) and, when the job's
options carry ``SLACK_WEBHOOK_URL``, wraps it so events at or above
``SLACK_LOG_LEVEL`` are forwarded to a Slack incoming webhook
(compiler.go:73-95 checkWrapLogger, slack.go:104-160 SlackWrapper).

Spark-side the channel/goroutine plumbing disappears — events are
synchronous ``log()`` calls from the driver (executors never log
through this; their diagnostics ride Spark's own logging) — but the
levels, payload format, min-level filter, and latest-error contract
are the reference's.
"""

from __future__ import annotations

import json
from dataclasses import dataclass, field
from datetime import datetime
from typing import Callable

TRACE, INFO, WARNING, ERROR = 0, 1, 2, 3

_LEVEL_TAGS = {TRACE: "[TRACE]", INFO: "[INFO]", WARNING: "[WARNING]", ERROR: "[ERROR]"}
_STR_TO_LEVEL = {"trace": TRACE, "info": INFO, "warning": WARNING, "error": ERROR}


def str_to_level(s: str) -> int:
    """slack.go:86-99 StrToLevel; raises on unknown names (the
    reference fails compile on an invalid SLACK_LOG_LEVEL)."""
    lv = _STR_TO_LEVEL.get(str(s).strip().lower())
    if lv is None:
        raise ValueError(f"invalid log level {s!r}")
    return lv


@dataclass
class Event:
    source: str
    level: int
    message: str
    time: datetime = field(default_factory=datetime.now)


class ConsoleLogger:
    """logger.go ConsoleLogger: prints events >= min_level, keeps the
    latest Error (the ``Error()`` accessor drives job exit codes)."""

    def __init__(self, min_level: int = INFO, writer=None):
        self.min_level = min_level
        self.writer = writer
        self.latest_error: str | None = None

    def log(self, event: Event) -> None:
        if event.level == ERROR:
            self.latest_error = event.message
        if event.level >= self.min_level:
            line = (
                f"{event.time.strftime('%H:%M:%S')} {_LEVEL_TAGS[event.level]} "
                f"{event.source}: {event.message}"
            )
            if self.writer is not None:
                self.writer.write(line + "\n")
            else:
                print(line)

    def error(self) -> str | None:
        return self.latest_error


class SlackLogger:
    """slack.go SlackWrapper: forwards events >= min_level to a Slack
    incoming webhook AND to the wrapped logger. ``post_fn(url,
    payload_dict)`` is injected (production: ``webhook_post``); a
    delivery failure degrades to a Warning on the inner logger, never
    an exception (slack.go:42-84 logs and continues)."""

    def __init__(
        self,
        inner,
        webhook_url: str,
        min_level: str = "error",
        channel: str = "",
        username: str = "",
        emoji: str = "",
        script: str = "",
        post_fn: Callable[[str, dict], None] | None = None,
    ):
        if not webhook_url:
            raise ValueError("blank webhook URL")
        self.inner = inner
        self.url = webhook_url
        self.min_level = str_to_level(min_level)
        self.channel = channel
        self.username = username
        self.emoji = emoji
        self.script = script or "Unnamed script"
        self.post = post_fn or webhook_post

    def log(self, event: Event) -> None:
        self.inner.log(event)
        if event.level < self.min_level:
            return
        # payload text format per slack.go:44-49
        payload = {
            "text": (
                f"<{self.script}>: {event.source} - "
                f"{_LEVEL_TAGS[event.level]} - {event.message}"
            ),
            "channel": self.channel,
            "username": self.username,
            "icon_emoji": self.emoji,
        }
        try:
            self.post(self.url, payload)
        except Exception as e:
            self.inner.log(
                Event("Slack", WARNING, f"Error sending message to Slack: {e}")
            )

    def error(self) -> str | None:
        return self.inner.error()


def webhook_post(url: str, payload: dict) -> None:
    """Real webhook delivery over stdlib urllib (slack.go:60-84's
    http.Client.Do)."""
    import urllib.request

    req = urllib.request.Request(
        url,
        data=json.dumps(payload).encode(),
        headers={"Content-Type": "application/json; charset=utf-8"},
        method="POST",
    )
    urllib.request.urlopen(req, timeout=10).close()


def maybe_wrap_slack(
    logger, options: dict, post_fn: Callable[[str, dict], None] | None = None
):
    """compiler.go:73-95 checkWrapLogger: if the merged job options
    carry SLACK_WEBHOOK_URL, wrap the logger; an invalid
    SLACK_LOG_LEVEL is a compile error. Returns the (possibly
    wrapped) logger."""
    opts = {str(k).upper(): v for k, v in (options or {}).items()}
    url = opts.get("SLACK_WEBHOOK_URL")
    if not url:
        return logger
    return SlackLogger(
        logger,
        webhook_url=str(url),
        min_level=str(opts.get("SLACK_LOG_LEVEL", "error")),
        channel=str(opts.get("SLACK_CHANNEL", "")),
        username=str(opts.get("SLACK_USER", "")),
        emoji=str(opts.get("SLACK_EMOJI", "")),
        script=str(opts.get("SLACK_NAME", "")),
        post_fn=post_fn,
    )


class CollectingLogger:
    """Thread-safe event collector backing the server's log-streaming
    endpoints. The reference streams MsgLog frames over the RUN
    websocket while the job executes (http/main.go:47-84); here block
    events accumulate with sequence numbers and stream out via the
    SSE adapter or incremental polls (``after``). Wraps an inner
    logger when given so console/Slack behavior is unchanged."""

    def __init__(self, inner=None):
        import threading

        self._lock = threading.Lock()
        self.inner = inner
        self.events: list[dict] = []

    def log(self, event: Event) -> None:
        if self.inner is not None:
            self.inner.log(event)
        with self._lock:
            self.events.append({
                "seq": len(self.events),
                "time": event.time.isoformat(),
                "level": _LEVEL_TAGS[event.level].strip("[]").lower(),
                "source": event.source,
                "message": event.message,
            })

    def error(self) -> str | None:
        return self.inner.error() if self.inner is not None else None

    def after(self, seq: int) -> list[dict]:
        """Events with sequence >= seq (the incremental poll/stream
        cursor)."""
        with self._lock:
            return list(self.events[seq:])
