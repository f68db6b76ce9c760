"""Alarm escalation (AlarmUtils.java:36-56 latch rule + dump-failure
phone alarm, BinlogWorker.java:568-578)."""

import json

import pandas as pd

from binlake_spark.lake.merge import MergeResult
from binlake_spark.streaming.alarms import AlarmManager


def test_retry_latch_escalation():
    """Reference rule: suppress while retry < latch - 2, mail (warn)
    from latch - 2, phone (critical) at the latch."""
    am = AlarmManager(retry_latch=5)
    assert am.observe_resume_retry(1, "s") is None
    assert am.observe_resume_retry(2, "s") is None
    w = am.observe_resume_retry(3, "s", error="boom")
    assert w.severity == "warn" and w.rule == "resume-retry-escalating"
    assert am.observe_resume_retry(4, "s").severity == "warn"
    c = am.observe_resume_retry(5, "s")
    assert c.severity == "critical" and c.rule == "resume-retries-exhausted"
    assert [e.severity for e in am.events] == [
        "warn", "warn", "critical"
    ]


def test_epoch_rules_and_jsonl_sink(tmp_path):
    path = str(tmp_path / "alarms.jsonl")
    seen = []
    am = AlarmManager(epoch_wall_warn_ms=100, jsonl_path=path,
                      sink=seen.append)
    # slow epoch -> warn
    am.observe_epoch(
        MergeResult(applied=True, epoch_id=3, wall_ms=250), stream_id="s"
    )
    # normal at-least-once replay skip -> silent
    am.observe_epoch(
        MergeResult(applied=False, epoch_id=3,
                    skipped_reason="epoch-already-applied"),
        stream_id="s",
    )
    am.observe_epoch(
        MergeResult(applied=False, epoch_id=4, skipped_reason="empty-batch"),
        stream_id="s",
    )
    # anything else unapplied -> critical
    am.observe_epoch(
        MergeResult(applied=False, epoch_id=5, skipped_reason="fence-refused"),
        stream_id="s",
    )
    assert [e.rule for e in am.events] == ["epoch-slow", "epoch-not-applied"]
    assert [e.severity for e in seen] == ["warn", "critical"]
    recs = [json.loads(l) for l in open(path)]
    assert len(recs) == 2 and recs[1]["data"]["reason"] == "fence-refused"


def test_engine_emits_epoch_alarms(spark, tmp_path):
    from binlake_spark.changelog.generator import (
        CHANGE_LOG_SCHEMA,
        GenSpec,
        generate_change_log,
        write_change_log,
    )
    from binlake_spark.streaming import CdcEngine

    pdf = generate_change_log(GenSpec(n_docs=20, n_events=150))
    src = str(tmp_path / "log")
    write_change_log(pdf, src)
    log = spark.read.schema(CHANGE_LOG_SCHEMA).parquet(src)

    am = AlarmManager(epoch_wall_warn_ms=0)  # every applied epoch is "slow"
    engine = CdcEngine(
        CdcEngine.create_table(str(tmp_path / "docs"), num_buckets=4),
        alarms=am,
    )
    engine.apply_batch(log, epoch_id=0)
    assert [e.rule for e in am.events] == ["epoch-slow"]
    # idempotent replay: no new alarm
    engine.apply_batch(log, epoch_id=0)
    assert len(am.events) == 1


def test_webhook_sink_posts_json_with_token_and_routes_recipients():
    """The gateway transport (Alarmer.java:25-38): JSON body, token
    header, mail recipients on warn / phone recipients on critical."""
    import http.server
    import threading

    from binlake_spark.streaming.alarms import WebhookAlarmSink

    got = []

    class H(http.server.BaseHTTPRequestHandler):
        def do_POST(self):
            n = int(self.headers["Content-Length"])
            got.append(
                {
                    "path": self.path,
                    "token": self.headers.get("token"),
                    "ctype": self.headers.get("content-type"),
                    "body": json.loads(self.rfile.read(n)),
                }
            )
            self.send_response(200)
            self.end_headers()

        def log_message(self, *a):  # quiet
            pass

    srv = http.server.ThreadingHTTPServer(("127.0.0.1", 0), H)
    threading.Thread(target=srv.serve_forever, daemon=True).start()
    try:
        sink = WebhookAlarmSink(
            f"http://127.0.0.1:{srv.server_address[1]}/sendText/",
            token="tok-123",
            mail_to=["dba@example.com"],
            phone_to=["13800000000"],
        )
        am = AlarmManager(retry_latch=3, sink=sink)
        am.observe_resume_retry(1, "s1", error="boom")   # warn → mail
        am.observe_resume_retry(3, "s1", error="boom")   # critical → phone
        assert sink.delivered == 2 and sink.failed == 0
    finally:
        srv.shutdown()
        srv.server_close()

    assert [g["token"] for g in got] == ["tok-123", "tok-123"]
    assert all(g["ctype"] == "application/json" for g in got)
    warn, crit = got[0]["body"], got[1]["body"]
    assert warn["channel"] == "mail"
    assert warn["recipients"] == ["dba@example.com"]
    assert warn["rule"] == "resume-retry-escalating"
    assert crit["channel"] == "phone"
    assert crit["recipients"] == ["13800000000"]
    assert crit["data"]["latch"] == 3


def test_webhook_sink_failure_never_raises():
    from binlake_spark.streaming.alarms import WebhookAlarmSink

    errs = []
    # closed port: connection refused must be swallowed, counted, reported
    sink = WebhookAlarmSink(
        "http://127.0.0.1:9/never", timeout=0.5, on_error=errs.append
    )
    am = AlarmManager(retry_latch=1, sink=sink)
    ev = am.observe_resume_retry(1, "s1")
    assert ev is not None  # the alarm itself still recorded in-memory
    assert sink.failed == 1 and sink.delivered == 0
    assert sink.last_error and len(errs) == 1
