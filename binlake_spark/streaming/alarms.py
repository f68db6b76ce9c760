"""Alarm escalation for the CDC engine — the rebuild of the reference's
alarm tower (AlarmUtils.java:36-56, MailAlarm/PhoneAlarm, wired from the
dump-failure path BinlogWorker.java:568-578).

Reference semantics kept:

* **escalation latch** — mail alarms start firing when the retry count
  is within 2 of the configured latch (``retry < latch - 2`` → suppress,
  AlarmUtils.mail:36-39), phone (critical) fires on hard failure.
* alarms carry a structured data map, not just a message.

Spark-native shape: the delivery channels (JD mail/phone HTTP gateways)
are deployment integration points; here the sink is a pluggable callable
with a JSONL file + in-memory default, so the escalation *logic* — which
is what the reference encodes — is fully testable.  Epoch-health rules
(slow epoch, empty-result epochs, skipped commits) run over
:class:`~binlake_spark.lake.merge.MergeResult` records the engine
already produces; nothing touches the data path.
"""

from __future__ import annotations

import json
import os
import time
from dataclasses import dataclass, field


@dataclass(frozen=True)
class AlarmEvent:
    severity: str          # "warn" (mail analog) | "critical" (phone analog)
    rule: str
    stream_id: str
    message: str
    data: dict = field(default_factory=dict)


class AlarmManager:
    """Evaluates alarm rules and fans events out to sinks.

    ``retry_latch`` mirrors ``MetaInfo.getAlarm().getRetry()``: resume
    attempts within 2 of the latch raise ``warn``; reaching it raises
    ``critical``.  ``epoch_wall_warn_ms`` flags slow epochs (the
    stage-delay alarm the reference's delay monitor feeds).
    ``jsonl_path``: append-only structured log, one JSON object per
    alarm (the transport integration point).
    """

    def __init__(
        self,
        retry_latch: int = 3,
        epoch_wall_warn_ms: int | None = None,
        jsonl_path: str | None = None,
        sink=None,
    ):
        self.retry_latch = int(retry_latch)
        self.epoch_wall_warn_ms = epoch_wall_warn_ms
        self.jsonl_path = jsonl_path
        self._sink = sink
        self.events: list[AlarmEvent] = []

    # -------------------------------------------------------------- #
    def _emit(self, ev: AlarmEvent) -> AlarmEvent:
        self.events.append(ev)
        if self.jsonl_path:
            os.makedirs(os.path.dirname(self.jsonl_path) or ".", exist_ok=True)
            with open(self.jsonl_path, "a") as f:
                f.write(
                    json.dumps(
                        {
                            "at": time.time(),
                            "severity": ev.severity,
                            "rule": ev.rule,
                            "stream_id": ev.stream_id,
                            "message": ev.message,
                            "data": ev.data,
                        },
                        sort_keys=True,
                    )
                    + "\n"
                )
        if self._sink is not None:
            self._sink(ev)
        return ev

    # -------------------------------------------------------------- #
    def observe_resume_retry(
        self, attempt: int, stream_id: str, error: str = ""
    ) -> AlarmEvent | None:
        """One failed resume attempt.  The reference's latch rule
        (AlarmUtils.mail:36-39): suppress while ``attempt < latch - 2``,
        ``warn`` from ``latch - 2``, ``critical`` at the latch (the
        phone alarm on hard dump failure, BinlogWorker.java:578)."""
        if attempt >= self.retry_latch:
            return self._emit(
                AlarmEvent(
                    "critical",
                    "resume-retries-exhausted",
                    stream_id,
                    f"resume failed {attempt}x (latch {self.retry_latch})",
                    {"attempt": attempt, "latch": self.retry_latch,
                     "error": error[:500]},
                )
            )
        if attempt >= self.retry_latch - 2:
            return self._emit(
                AlarmEvent(
                    "warn",
                    "resume-retry-escalating",
                    stream_id,
                    f"retry times > retry latch soon: {attempt} of "
                    f"{self.retry_latch}",
                    {"attempt": attempt, "latch": self.retry_latch,
                     "error": error[:500]},
                )
            )
        return None

    # -------------------------------------------------------------- #
    def observe_epoch(self, result, stream_id: str) -> list[AlarmEvent]:
        """Epoch-health rules over a :class:`MergeResult`."""
        out: list[AlarmEvent] = []
        if (
            self.epoch_wall_warn_ms is not None
            and result.applied
            and result.wall_ms > self.epoch_wall_warn_ms
        ):
            out.append(
                self._emit(
                    AlarmEvent(
                        "warn",
                        "epoch-slow",
                        stream_id,
                        f"epoch {result.epoch_id} took {result.wall_ms} ms "
                        f"(> {self.epoch_wall_warn_ms})",
                        {"epoch_id": result.epoch_id,
                         "wall_ms": result.wall_ms},
                    )
                )
            )
        if not result.applied and result.skipped_reason not in (
            None,
            "epoch-already-applied",  # normal at-least-once replay
            "empty-batch",
        ):
            out.append(
                self._emit(
                    AlarmEvent(
                        "critical",
                        "epoch-not-applied",
                        stream_id,
                        f"epoch {result.epoch_id} skipped: "
                        f"{result.skipped_reason}",
                        {"epoch_id": result.epoch_id,
                         "reason": result.skipped_reason},
                    )
                )
            )
        return out


class WebhookAlarmSink:
    """The reference's alarm transport, rebuilt: one JSON POST per alarm
    to an HTTP gateway with a ``token`` header (Alarmer.alarm,
    binlake-wave.alarm/.../Alarmer.java:25-38).  Mail and phone are the
    SAME gateway differing only in recipients (MailAlarm.java:16-20 /
    PhoneAlarm.java:18-22 share the default url+token), so one sink
    routes by severity: ``warn`` → ``mail_to`` (the AlarmUtils.mail
    path), ``critical`` → ``phone_to`` (AlarmUtils.phone).

    Delivery failures are counted and reported to ``on_error`` but NEVER
    raised — the reference swallows transport errors after logging
    (Alarmer.java:33-36) because a broken alarm gateway must not take
    down the dump worker.  Pure stdlib (urllib), no dependency.
    """

    def __init__(
        self,
        url: str,
        token: str = "",
        mail_to: tuple[str, ...] | list[str] = (),
        phone_to: tuple[str, ...] | list[str] = (),
        timeout: float = 5.0,
        on_error=None,
    ):
        self.url = url
        self.token = token
        self.mail_to = list(mail_to)
        self.phone_to = list(phone_to)
        self.timeout = float(timeout)
        self.on_error = on_error
        self.delivered = 0
        self.failed = 0
        self.last_error: str | None = None

    def __call__(self, ev: AlarmEvent) -> bool:
        import urllib.request

        channel = "phone" if ev.severity == "critical" else "mail"
        body = {
            "severity": ev.severity,
            "rule": ev.rule,
            "stream_id": ev.stream_id,
            "message": ev.message,
            "data": ev.data,
            "channel": channel,
            "recipients": self.phone_to if channel == "phone" else self.mail_to,
        }
        req = urllib.request.Request(
            self.url,
            data=json.dumps(body, sort_keys=True).encode("utf-8"),
            headers={"content-type": "application/json", "token": self.token},
            method="POST",
        )
        try:
            with urllib.request.urlopen(req, timeout=self.timeout) as resp:
                if not 200 <= resp.status < 300:
                    raise OSError(f"gateway answered HTTP {resp.status}")
            self.delivered += 1
            return True
        except Exception as e:  # transport failure must not kill the worker
            self.failed += 1
            self.last_error = f"{type(e).__name__}: {e}"
            if self.on_error is not None:
                self.on_error(e)
            return False
