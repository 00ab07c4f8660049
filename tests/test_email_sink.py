"""Email destination: recipient grammar, whole-set vs per-row (SPLIT)
rendering, injected transport, gated NotImplementedError."""

import pytest

from analyst_spark.sinks.email import email_sink, parse_recipients


def test_parse_recipients():
    got = parse_recipients("Alice <a@x.com>, <b@y.org>")
    assert got == [("Alice", "a@x.com"), ("", "b@y.org")]
    with pytest.raises(ValueError):
        parse_recipients("not-an-address")


def test_email_sink_split_modes(spark):
    df = spark.createDataFrame([(1, "a"), (2, "b")], "n long, s string")
    sent = []
    n = email_sink(
        df, "Ops <ops@x.com>", "Bot <bot@x.com>", subject="report",
        send_fn=sent.append,
    )
    assert n == 1
    assert sent[0]["content"] == [{"n": 1, "s": "a"}, {"n": 2, "s": "b"}]
    assert sent[0]["to"] == [("Ops", "ops@x.com")]

    sent.clear()
    n = email_sink(
        df, "Ops <ops@x.com>", "Bot <bot@x.com>", subject="report",
        split=True, send_fn=sent.append,
    )
    assert n == 2
    assert {tuple(m["content"].items()) for m in sent} == {
        (("n", 1), ("s", "a")), (("n", 2), ("s", "b")),
    }


def test_email_sink_requires_transport(spark):
    df = spark.createDataFrame([(1,)], "n long")
    with pytest.raises(NotImplementedError):
        email_sink(df, "<a@x.com>", "<b@x.com>")


def test_smtp_transport_end_to_end_both_modes(spark):
    # fake SMTP client captures protocol-level sends; exercises the
    # complete path: render -> template -> transport
    from analyst_spark.sinks.email import email_sink, smtp_transport

    sent = []

    class FakeSMTP:
        def __init__(self, host, port):
            self.host, self.port = host, port

        def starttls(self):
            sent.append(("tls",))

        def login(self, u, p):
            sent.append(("login", u))

        def sendmail(self, frm, to, payload):
            sent.append(("mail", frm, tuple(to), payload.decode()))

        def quit(self):
            pass

    df = spark.createDataFrame([(1, "a"), (2, "b")], ["k", "v"])
    fn = smtp_transport(
        "mail.example", 587, username="u", password="p", use_tls=True,
        smtp_factory=FakeSMTP,
    )
    # whole-resultset: ONE message containing every row
    n = email_sink(
        df, "Ops <ops@example.com>", "Bot <bot@example.com>",
        subject="daily", split=False, send_fn=fn,
    )
    mails = [s for s in sent if s[0] == "mail"]
    assert n == 1 and len(mails) == 1
    assert mails[0][1] == "bot@example.com"
    assert mails[0][2] == ("ops@example.com",)
    assert '"k": 1' in mails[0][3] and '"k": 2' in mails[0][3]
    # SPLIT: one message per row, template-rendered
    sent.clear()
    n = email_sink(
        df, "Ops <ops@example.com>", "Bot <bot@example.com>",
        subject="row", split=True, template="row {{ k }} = {{ v }}",
        send_fn=fn,
    )
    mails = [s for s in sent if s[0] == "mail"]
    assert n == 2 and len(mails) == 2
    bodies = sorted(m[3].rsplit("\r\n\r\n", 1)[1] for m in mails)
    assert bodies == ["row 1 = a", "row 2 = b"]


def test_aql_email_destination_with_fake_transport(spark):
    from analyst_spark.aql.engine import execute_script
    from analyst_spark.sinks.email import email_write_handler

    outbox = []
    script = """
    DATA 'Alerts' (
        [[1, "disk full"], [2, "cpu hot"]]
    ) WITH (FORMAT = 'JSON_ARRAY', COLUMNS = 'id,msg',
            RECIPIENTS = 'Ops <ops@example.com>',
            SENDER = 'Bot <bot@example.com>',
            SUBJECT = 'alert', SPLIT = 'true',
            TEMPLATE = '#{{ id }}: {{ msg }}')
    INTO CONNECTION Mail
    """
    execute_script(
        spark, script,
        connections={"mail.write": email_write_handler(outbox.append)},
    )
    assert [m["body"] for m in outbox] == ["#1: disk full", "#2: cpu hot"]
    assert all(m["to"] == [("Ops", "ops@example.com")] for m in outbox)


def test_unconfigured_transport_still_raises(spark):
    from analyst_spark.sinks.email import email_sink

    df = spark.createDataFrame([(1,)], ["k"])
    with pytest.raises(NotImplementedError):
        email_sink(df, "A <a@b.c>", "B <b@b.c>", send_fn=None)
