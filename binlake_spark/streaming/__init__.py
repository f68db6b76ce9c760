from binlake_spark.streaming.alarms import AlarmEvent, AlarmManager, WebhookAlarmSink
from binlake_spark.streaming.engine import CdcEngine, DOCS_SCHEMA
from binlake_spark.streaming.fanout import FanoutCdc, Rule
from binlake_spark.streaming.metrics import ProgressLogger, attach_progress_logger
from binlake_spark.streaming.stateful import dedup_by_seq_stateful
from binlake_spark.streaming.windows import windowed_change_counts

__all__ = [
    "AlarmEvent",
    "AlarmManager",
    "CdcEngine",
    "WebhookAlarmSink",
    "DOCS_SCHEMA",
    "FanoutCdc",
    "ProgressLogger",
    "Rule",
    "attach_progress_logger",
    "dedup_by_seq_stateful",
    "windowed_change_counts",
]
