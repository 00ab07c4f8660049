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
