"""Logger + Slack alert hook (engine/logger.go, engine/slack.go,
compiler.go checkWrapLogger)."""

import io

import pytest

from analyst_spark.logging import (
    ERROR,
    INFO,
    TRACE,
    WARNING,
    ConsoleLogger,
    Event,
    SlackLogger,
    maybe_wrap_slack,
    str_to_level,
)


def test_levels_and_min_filter():
    buf = io.StringIO()
    log = ConsoleLogger(min_level=WARNING, writer=buf)
    log.log(Event("Src", INFO, "quiet"))
    log.log(Event("Src", WARNING, "loud"))
    out = buf.getvalue()
    assert "quiet" not in out and "[WARNING] Src: loud" in out


def test_latest_error_tracked_even_below_min():
    # the Error() contract holds regardless of display filtering
    log = ConsoleLogger(min_level=ERROR, writer=io.StringIO())
    assert log.error() is None
    log.log(Event("X", ERROR, "boom"))
    assert log.error() == "boom"


def test_str_to_level_rejects_unknown():
    assert str_to_level("Warning") == WARNING
    assert str_to_level("trace") == TRACE
    with pytest.raises(ValueError):
        str_to_level("debug")


def test_slack_forwards_at_or_above_min_with_payload_format():
    posts = []
    inner = ConsoleLogger(min_level=ERROR, writer=io.StringIO())
    log = SlackLogger(
        inner, "https://hooks.example/x", min_level="warning",
        channel="#ops", username="analyst", script="nightly.aql",
        post_fn=lambda url, payload: posts.append((url, payload)),
    )
    log.log(Event("Compiler", INFO, "started"))       # below min
    log.log(Event("SQLDest", WARNING, "slow batch"))  # forwarded
    assert len(posts) == 1
    url, payload = posts[0]
    assert url == "https://hooks.example/x"
    # text format per slack.go:44-49
    assert payload["text"] == "<nightly.aql>: SQLDest - [WARNING] - slow batch"
    assert payload["channel"] == "#ops"


def test_slack_delivery_failure_degrades_to_warning():
    buf = io.StringIO()
    inner = ConsoleLogger(min_level=TRACE, writer=buf)

    def bad_post(url, payload):
        raise OSError("connection refused")

    log = SlackLogger(inner, "https://hooks.example/x", min_level="error",
                      post_fn=bad_post)
    log.log(Event("Job", ERROR, "it broke"))  # must not raise
    assert "Error sending message to Slack" in buf.getvalue()
    assert log.error() == "it broke"  # inner still tracked the error


def test_maybe_wrap_slack_from_options():
    inner = ConsoleLogger(writer=io.StringIO())
    assert maybe_wrap_slack(inner, {}) is inner
    wrapped = maybe_wrap_slack(
        inner,
        {"SLACK_WEBHOOK_URL": "https://h/x", "SLACK_LOG_LEVEL": "info",
         "SLACK_NAME": "job1"},
        post_fn=lambda u, p: None,
    )
    assert isinstance(wrapped, SlackLogger)
    with pytest.raises(ValueError):  # invalid level is a compile error
        maybe_wrap_slack(
            inner,
            {"SLACK_WEBHOOK_URL": "https://h/x", "SLACK_LOG_LEVEL": "loudest"},
        )


def test_engine_emits_block_events_and_slack_set_option(spark):
    # SET SLACK_* options activate the hook inside execute_script,
    # exactly like the reference's merged-option check
    from analyst_spark.aql.engine import execute_script

    posts = []
    script = """
    SET SLACK_WEBHOOK_URL = 'https://hooks.example/y';
    SET SLACK_LOG_LEVEL = 'info';
    SET SLACK_NAME = 'demo';

    DATA 'Msg' (
    [
        ["hi"]
    ]
    ) INTO CONSOLE WITH (COLUMNS = 'M', OUTPUT_FORMAT='JSON')
    """
    execute_script(
        spark, script, slack_post_fn=lambda u, p: posts.append(p)
    )
    texts = [p["text"] for p in posts]
    assert any("data block started" in t for t in texts)
    assert any("data block finished" in t for t in texts)
    assert all(t.startswith("<demo>:") for t in texts)
