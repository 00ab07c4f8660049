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


def render_template(template: str, content) -> str:
    """Local stand-in for Mandrill's template rendering
    (MessagesSendTemplate, mandrill_destination.go:73, :87): merge
    vars appear as ``{{ name }}``. A list of rows renders the
    template once per row, newline-joined."""
    rows = content if isinstance(content, list) else [content]
    out = []
    for row in rows:
        body = template
        for k, v in row.items():
            body = re.sub(
                r"\{\{\s*" + re.escape(str(k)) + r"\s*\}\}", str(v), body
            )
        out.append(body)
    return "\n".join(out)


def email_sink(
    df: DataFrame,
    recipients: str,
    sender: str,
    subject: str = "",
    split: bool = False,
    template: str = "",
    send_fn: Callable[[dict], None] | None = None,
) -> int:
    """Validate, render, send. Returns the number of messages sent."""
    to = parse_recipients(recipients)
    # Sender is optional in the reference (mandrill_destination.go:22,
    # the template default applies) — None signals transport default
    frm = parse_recipients(sender)[0] if sender.strip() else None
    messages = render_messages(df, subject, split=split)
    if send_fn is None:
        raise NotImplementedError(
            "no email transport configured; pass send_fn (e.g. "
            "smtp_transport(...)) to deliver "
            f"{len(messages)} rendered message(s)"
        )
    for msg in messages:
        msg["to"] = to
        msg["from"] = frm
        if template:
            msg["body"] = render_template(template, msg["content"])
        send_fn(msg)
    return len(messages)


def smtp_transport(
    host: str,
    port: int = 25,
    username: str | None = None,
    password: str | None = None,
    use_tls: bool = False,
    smtp_factory=None,
) -> Callable[[dict], None]:
    """A real send_fn over stdlib smtplib (lazily imported; no mail
    service is assumed in CI — inject ``smtp_factory`` to test).

    The message body is the template rendering when TEMPLATE was
    given, else the JSON of the rendered content."""

    def send(msg: dict) -> None:
        import json

        if smtp_factory is not None:
            client = smtp_factory(host, port)
        else:  # pragma: no cover - needs a live SMTP server
            import smtplib

            client = smtplib.SMTP(host, port)
        try:
            if use_tls:
                client.starttls()
            if username:
                client.login(username, password or "")
            body = msg.get("body") or json.dumps(msg["content"], default=str)
            frm_name, frm_addr = msg["from"]
            payload = (
                f"From: {frm_name} <{frm_addr}>\r\n"
                + "To: "
                + ", ".join(f"{n} <{e}>" for n, e in msg["to"])
                + "\r\n"
                + f"Subject: {msg.get('subject', '')}\r\n\r\n"
                + body
            )
            client.sendmail(
                frm_addr, [e for _n, e in msg["to"]], payload.encode()
            )
        finally:
            client.quit()

    return send


def email_write_handler(
    send_fn: Callable[[dict], None] | None = None,
) -> Callable:
    """AQL connection write handler: INTO CONNECTION Mail with
    WITH (RECIPIENTS=..., SENDER=..., SUBJECT=..., SPLIT=...,
    TEMPLATE=...) — option names per the reference's aql tags
    (mandrill_destination.go:19-29)."""
    from analyst_spark.aql.parser import truthy

    def write(df: DataFrame, options) -> None:
        email_sink(
            df,
            recipients=str(options.get("RECIPIENTS", "")),
            sender=str(options.get("SENDER", "")),
            subject=str(options.get("SUBJECT", "")),
            split=truthy(options.get("SPLIT")),
            template=str(options.get("TEMPLATE", "")),
            send_fn=send_fn,
        )

    return write
