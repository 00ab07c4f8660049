"""Email destination (engine/mandrill_destination.go:19-97).

The reference renders rows into a Mandrill template and sends one
email for the whole resultset, or one per row with ``SPLIT``
(mandrill_destination.go:52-97); recipients are parsed as
``Name <email>`` (regex at :38-50).

Spark-side the semantics are: collect the (small, terminal) result to
the driver, render messages, hand them to a transport. The transport
is injected (``send_fn``) — no mail library or network dependency is
assumed in this environment; without one the sink raises
NotImplementedError AFTER validating options and rendering, so the
whole pipeline short of the network call is testable.
"""

from __future__ import annotations

import re
from collections.abc import Callable

from pyspark.sql import DataFrame

_RECIPIENT_RE = re.compile(r"^\s*(?:(?P<name>[^<>]*?)\s*)?<(?P<email>[^<>@\s]+@[^<>@\s]+)>\s*$")


def parse_recipients(s: str) -> list[tuple[str, str]]:
    """Comma-separated ``Name <email>`` list → [(name, email)].
    Mirrors the reference's regex contract: a bare address without
    angle brackets is a syntax error (mandrill_destination.go:38-50).
    """
    out = []
    for part in s.split(","):
        m = _RECIPIENT_RE.match(part)
        if not m:
            raise ValueError(
                f"invalid syntax or email for recipient {part.strip()!r}. "
                "Expecting NAME <EMAIL>"
            )
        out.append(((m.group("name") or "").strip(), m.group("email")))
    return out


def render_messages(
    df: DataFrame, subject: str, split: bool = False
) -> list[dict]:
    """Render the resultset into message payloads: one message with
    all rows as a list (default), or one message per row (SPLIT),
    matching mandrill_destination.go:52-97. Collect is safe here —
    email bodies are terminal, human-sized outputs."""
    cols = df.columns
    rows = [dict(zip(cols, r)) for r in df.collect()]
    if split:
        return [{"subject": subject, "content": row} for row in rows]
    return [{"subject": subject, "content": rows}]


def email_sink(
    df: DataFrame,
    recipients: str,
    sender: str,
    subject: str = "",
    split: bool = False,
    send_fn: Callable[[dict], None] | None = None,
) -> int:
    """Validate, render, send. Returns the number of messages sent."""
    to = parse_recipients(recipients)
    frm = parse_recipients(sender)[0]
    messages = render_messages(df, subject, split=split)
    if send_fn is None:
        raise NotImplementedError(
            "no email transport configured in this environment; pass "
            "send_fn (e.g. an SMTP or HTTP-API callable) to deliver "
            f"{len(messages)} rendered message(s)"
        )
    for msg in messages:
        msg["to"] = to
        msg["from"] = frm
        send_fn(msg)
    return len(messages)
