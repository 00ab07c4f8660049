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
            # template NAME travels with the message so API transports
            # (Mandrill) can delegate rendering to the service, exactly
            # as the reference does (MessagesSendTemplate,
            # mandrill_destination.go:73,:87); the local rendering stays
            # for SMTP/file transports.
            msg["template"] = template
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


def mandrill_ping(api_key: str, base_url: str) -> str:
    """POST /users/ping.json — the reference's Ping()
    (mandrill_destination.go:32-36, keighl/mandrill ClientWithKey +
    Ping). Returns the service's reply string ("PONG!" on success)."""
    import json
    import urllib.request

    req = urllib.request.Request(
        base_url.rstrip("/") + "/users/ping.json",
        data=json.dumps({"key": api_key}).encode(),
        headers={"Content-Type": "application/json"},
    )
    with urllib.request.urlopen(req) as resp:
        return json.loads(resp.read().decode())


def mandrill_transport(
    api_key: str,
    base_url: str = "https://mandrillapp.com/api/1.0",
) -> Callable[[dict], None]:
    """A send_fn speaking the Mandrill HTTP API over stdlib urllib —
    the transport the reference uses through keighl/mandrill
    (mandrill_destination.go:73,:87 MessagesSendTemplate). Payload
    shape mirrors that client exactly:

      POST {base}/messages/send-template.json
      {"key": ..., "template_name": ..., "template_content": [],
       "message": {subject, from_email, from_name,
                   to: [{email, name, type: "to"}],
                   global_merge_vars: [{name, content}, ...]}}

    Rendered row content becomes ``global_merge_vars`` (one var per
    column; the all-rows form sends the row list under the single var
    ``rows``, which is how a list renders in a Mandrill template
    loop). ``base_url`` exists so tests (and on-prem proxies) can
    point the transport at a local endpoint; the default is the
    public API. Raises on HTTP error or a non-"sent" per-recipient
    status, matching the reference's fatalerr path."""
    import json
    import urllib.request

    def send(msg: dict) -> None:
        if not msg.get("template"):
            # fail fast client-side: the API endpoint is
            # send-template.json, and an empty template_name comes
            # back as an opaque Unknown_Template validation error
            raise ValueError(
                "mandrill transport requires WITH (TEMPLATE = ...) — "
                "the service renders the named template server-side"
            )
        content = msg["content"]
        if isinstance(content, list):
            merge_vars = [{"name": "rows", "content": content}]
        else:
            merge_vars = [
                {"name": str(k), "content": v} for k, v in content.items()
            ]
        message = {
            "subject": msg.get("subject") or None,
            "to": [
                {"email": e, "name": n, "type": "to"} for n, e in msg["to"]
            ],
            "global_merge_vars": merge_vars,
        }
        if msg.get("from"):
            frm_name, frm_addr = msg["from"]
            message["from_email"] = frm_addr
            message["from_name"] = frm_name
        payload = {
            "key": api_key,
            "template_name": msg["template"],
            "template_content": [],
            "message": message,
        }
        req = urllib.request.Request(
            base_url.rstrip("/") + "/messages/send-template.json",
            data=json.dumps(payload, default=str).encode(),
            headers={"Content-Type": "application/json"},
        )
        with urllib.request.urlopen(req) as resp:
            statuses = json.loads(resp.read().decode())
        bad = [
            s for s in statuses
            if s.get("status") not in ("sent", "queued", "scheduled")
        ]
        if bad:
            raise RuntimeError(f"mandrill rejected {len(bad)} recipient(s): {bad}")

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
